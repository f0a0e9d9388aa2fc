"""CLI smoke test: main.py end-to-end on a generated RGB folder."""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_main_cli_rgb_folder(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    seq = tmp_path / "seq"
    seq.mkdir()
    base = (rng.random((128, 160, 3)) * 255).astype(np.uint8)
    for i in range(4):
        crop = base[i : i + 64, 2 * i : 2 * i + 80]
        cv2.imwrite(str(seq / f"{i:04d}.png"), crop)

    env = dict(__import__("os").environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["HF_HUB_OFFLINE"] = "1"  # skip checkpoint-resolve DNS retries
    out = subprocess.run(
        [sys.executable, str(ROOT / "main.py"),
         "--dataset", str(seq),
         "--config", str(ROOT / "config" / "base.yaml"),
         "--tiny-model", "--no-viz", "--img-size", "64",
         "--gaussian-stride", "8", "--max-frames", "4"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "done:" in out.stdout
    # exporters wrote results
    logs = tmp_path / "logs"
    assert (logs / "seq.txt").exists()
    assert (logs / "seq.ply").exists()
    traj = (logs / "seq.txt").read_text().strip().splitlines()
    assert len(traj) >= 1 and len(traj[0].split()) == 8
    # per-frame GS render export is ON by default (reference parity:
    # --render-gaussians defaults True, reference main.py:336,490-506)
    assert any((logs / "seq_renders").glob("*.png")), \
        "default run exported no GS renders"


@pytest.mark.slow
def test_main_cli_render_export(tmp_path):
    """--render-stride N writes a PNG for every Nth frame (1-render-lag
    pipelined export must still flush the final pending render)."""
    import cv2

    rng = np.random.default_rng(1)
    seq = tmp_path / "seq"
    seq.mkdir()
    base = (rng.random((128, 160, 3)) * 255).astype(np.uint8)
    for i in range(4):
        crop = base[i : i + 64, 2 * i : 2 * i + 80]
        cv2.imwrite(str(seq / f"{i:04d}.png"), crop)

    env = dict(__import__("os").environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["HF_HUB_OFFLINE"] = "1"  # skip checkpoint-resolve DNS retries
    out = subprocess.run(
        [sys.executable, str(ROOT / "main.py"),
         "--dataset", str(seq),
         "--config", str(ROOT / "config" / "base.yaml"),
         "--tiny-model", "--no-viz", "--img-size", "64",
         "--gaussian-stride", "8", "--max-frames", "4",
         "--render-stride", "2"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    renders = sorted((tmp_path / "logs" / "seq_renders").glob("*.png"))
    # frames 0 and 2 render; both must be flushed (incl. the pending last)
    assert [p.name for p in renders] == ["000000.png", "000002.png"]
    img = cv2.imread(str(renders[-1]))
    assert img is not None and img.shape[2] == 3
