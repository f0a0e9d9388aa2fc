"""CLI smoke tests for demo.py (two-image orbit demo) and ablations.py.

Parity surfaces: reference `splatt3r_core/demo.py` (Gradio two-image
app; here a headless CLI) and `splatt3r_core/ablations.py` (training
ablation sweeps). Both previously had no test coverage.
"""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _env_cpu():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.slow
def test_demo_cli_two_images(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    base = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    p1, p2 = tmp_path / "a.png", tmp_path / "b.png"
    cv2.imwrite(str(p1), base[:64, :80])
    cv2.imwrite(str(p2), base[8:72, 12:92])

    out_dir = tmp_path / "demo_out"
    res = subprocess.run(
        [sys.executable, str(ROOT / "demo.py"), str(p1), str(p2),
         "--tiny-model", "--img-size", "64", "--n-views", "3",
         "--out", str(out_dir)],
        cwd=tmp_path, env=_env_cpu(), capture_output=True, text=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    plys = list(out_dir.glob("*.ply"))
    assert plys, f"no PLY exported in {out_dir}"
    pngs = sorted(out_dir.glob("*.png"))
    assert len(pngs) >= 3, f"expected >=3 orbit frames, got {pngs}"
    img = cv2.imread(str(pngs[0]))
    assert img is not None and img.shape[2] == 3


@pytest.mark.slow
def test_ablations_cli_single_run(tmp_path):
    res = subprocess.run(
        [sys.executable, str(ROOT / "ablations.py"),
         "--ablations", "baseline",
         "--steps", "2", "--tiny", "--res", "16", "32",
         "--out", str(tmp_path / "abl")],
        cwd=tmp_path, env=_env_cpu(), capture_output=True, text=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    runs = list((tmp_path / "abl").rglob("*.json"))
    assert runs, "ablation run produced no metrics/summary JSON"
