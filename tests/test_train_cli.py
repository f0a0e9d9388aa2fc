"""CLI smoke tests for train.py (run_experiment parity surface).

Reference: `splatt3r_core/main.py:270-453` — config-driven training with
loggers + checkpointing. Subprocess-driven like test_cli.py: the CLI is
the product surface, so drive it whole.
"""

import pathlib
import subprocess
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _run(args, tmp_path, timeout=900):
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, str(ROOT / "train.py"), *args],
        cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=timeout,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    return out


def _latest_ws(tmp_path, name):
    runs = sorted((tmp_path / "logs" / "train").glob(f"{name}_*"))
    assert runs, list((tmp_path / "logs").rglob("*"))
    return runs[-1]


def test_train_synthetic_with_eval_and_resume(tmp_path):
    _run(["--tiny-model", "--steps", "2", "--eval-every", "2",
          "--name", "syn", "--set", "train.lr=1e-4"], tmp_path)
    ws = _latest_ws(tmp_path, "syn")
    assert (ws / "params_final.npz").exists()
    assert (ws / "provenance.json").exists()
    csv = (ws / "syn_metrics.csv").read_text().strip().splitlines()
    assert len(csv) >= 3  # header + 2 train rows (+ eval row)
    assert "loss" in csv[0]
    # resolved config dumped with the override applied
    assert "1e-4" in (ws / "config.yaml").read_text().replace("0.0001",
                                                              "1e-4")

    # resume from the saved params
    _run(["--tiny-model", "--steps", "1", "--name", "resumed",
          "--resume", str(ws / "params_final.npz")], tmp_path)
    ws2 = _latest_ws(tmp_path, "resumed")
    assert (ws2 / "params_final.npz").exists()


def test_train_from_npz_batches(tmp_path):
    h, w, B = 32, 48, 1
    rng = np.random.default_rng(0)
    batch = {
        "img1": rng.normal(size=(B, h, w, 3)).astype(np.float32),
        "img2": rng.normal(size=(B, h, w, 3)).astype(np.float32),
        "gt1_pts": rng.normal(size=(B, h, w, 3)).astype(np.float32),
        "gt2_pts": rng.normal(size=(B, h, w, 3)).astype(np.float32),
        "valid1": np.ones((B, h, w), bool),
        "valid2": np.ones((B, h, w), bool),
    }
    np.savez(tmp_path / "b0.npz", **batch)
    out = _run(["--tiny-model", "--data", str(tmp_path / "b0.npz"),
                "--epochs", "2", "--name", "npz", "--verbose"], tmp_path)
    assert "step 1:" in out.stdout  # 1 file x 2 epochs = 2 steps
    ws = _latest_ws(tmp_path, "npz")
    assert (ws / "npz_metrics.csv").exists()


def test_masked_metric_test_sweep(tmp_path):
    """--test runs the reference's masked-metric protocol
    (run_experiment sweep, splatt3r_core/main.py:394-437): results.json
    keyed by (alpha, beta, apply_mask, average_over_mask), and the
    mask-averaged metrics genuinely differ from the plain-mean ones."""
    import json

    _run(["--tiny-model", "--test", "--alphas", "0.9", "0.3",
          "--name", "sweep"], tmp_path)
    ws = _latest_ws(tmp_path, "sweep")
    res = json.loads((ws / "results.json").read_text())
    assert len(res) == 4
    key_a = "alpha: 0.3, beta: 0.3, apply_mask: True, average_over_mask: False"
    key_b = "alpha: 0.3, beta: 0.3, apply_mask: True, average_over_mask: True"
    assert key_a in res and key_b in res
    row = res[key_a][0]
    for k in ("test/loss", "test/mse", "test/psnr", "test/ssim"):
        assert k in row and np.isfinite(row[k])
    # averaging over the 9%-coverage mask vs the full image must move
    # both SSIM and MSE
    a, b = res[key_a][0], res[key_b][0]
    assert abs(a["test/ssim"] - b["test/ssim"]) > 1e-6
    assert abs(a["test/mse"] - b["test/mse"]) > 1e-9
