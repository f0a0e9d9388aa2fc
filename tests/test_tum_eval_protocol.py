"""End-to-end TUM eval protocol on the committed fixture sequence.

Executes the reference's entire correctness story (spec:
`scripts/eval_tum.sh:33-52` -> `main.py --no-viz` per sequence ->
`evo_ape tum <gt> <est> -as`) against the committed synthetic TUM-format
fixture (`tests/fixtures/tum/rgbd_dataset_freiburg1_fixture`, generated
by `scripts/make_tum_fixture.py`): dataset parsing (rgb.txt layout, fr1
calib detection, `dataloader.py:67-91`), the full SLAM loop as a real
subprocess CLI run, TUM trajectory export (`evaluate.py:14-43`), render
PNG export, and the Sim3-aligned ATE metric.

The tiny random-weight model cannot track real images, so the fixture
config (`tests/fixtures/tum/eval_fixture.yaml`) forces keyframe cadence
and relaxes the reloc gate — the code path is the eval protocol's; only
the thresholds differ (documented in the yaml).
"""

import json
import os
import pathlib
import subprocess

import numpy as np
import pytest


pytestmark = pytest.mark.smoke
ROOT = pathlib.Path(__file__).resolve().parents[1]
FIXTURE = ROOT / "tests" / "fixtures" / "tum"
SEQ = "rgbd_dataset_freiburg1_fixture"


@pytest.mark.slow
def test_tum_eval_protocol_on_fixture(tmp_path):
    env = os.environ.copy()
    env.update(
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=env.get("JAX_COMPILATION_CACHE_DIR",
                                          "/tmp/jax_cache"),
        DATASET_ROOT=str(FIXTURE),
        SEQS_OVERRIDE=SEQ,
        CONFIG=str(FIXTURE / "eval_fixture.yaml"),
        SAVE_AS="fixture_ci",
        EXTRA_ARGS="--tiny-model --img-size 64 --render-stride 6",
    )
    r = subprocess.run(
        ["bash", "scripts/eval_tum.sh"], cwd=ROOT, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, f"eval_tum.sh failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"

    # the ATE line is the protocol's final product
    ate_lines = [ln for ln in r.stdout.splitlines()
                 if ln.startswith("{") and "ate_rmse" in ln]
    assert ate_lines, f"no ATE output:\n{r.stdout[-2000:]}"
    ate = json.loads(ate_lines[-1])["ate_rmse"]
    assert np.isfinite(ate), f"ATE not finite: {ate}"

    # trajectory: TUM rows (t x y z qx qy qz qw), associable timestamps
    est = ROOT / "logs" / "fixture_ci" / f"{SEQ}.txt"
    rows = np.loadtxt(est, comments="#")
    rows = np.atleast_2d(rows)
    assert rows.shape[0] >= 3, f"too few keyframes exported: {rows.shape}"
    assert rows.shape[1] == 8
    gt_ts = np.loadtxt(FIXTURE / SEQ / "groundtruth.txt", comments="#")[:, 0]
    for t in rows[:, 0]:
        assert np.min(np.abs(gt_ts - t)) < 0.02, f"orphan timestamp {t}"

    # reference output set: reconstruction PLY, keyframe PNGs, GS renders
    assert (ROOT / "logs" / "fixture_ci" / f"{SEQ}.ply").exists()
    kf_dir = ROOT / "logs" / "fixture_ci" / f"{SEQ}_keyframes"
    assert any(kf_dir.glob("*.png"))
    render_dir = ROOT / "logs" / "fixture_ci" / f"{SEQ}_renders"
    assert any(render_dir.glob("*.png")), "no GS render PNGs exported"


def test_fixture_groundtruth_is_valid_tum():
    """The committed fixture parses with the production TUM machinery."""
    from splatt3r_slam_tpu.runtime.evaluate import read_tum_trajectory

    t, p, q = read_tum_trajectory(FIXTURE / SEQ / "groundtruth.txt")
    assert len(t) == 24
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)
    # the trajectory moves (parallax) and returns toward the start (loop)
    assert np.linalg.norm(p, axis=1).max() > 0.5
    assert np.linalg.norm(p[-1] - p[0]) < 0.15


def test_fixture_loader_roundtrip():
    """TUMDataset parses the fixture: fr1 calib, timestamps, 320x240."""
    from splatt3r_slam_tpu.runtime.dataloader import load_dataset

    ds = load_dataset(str(FIXTURE / SEQ))
    assert len(ds) == 24
    ds.img_size = 64
    (h, w), raw = ds.get_img_shape()
    assert raw == (240, 320)
    assert (h, w) == (48, 64)
    ts, img = ds[0]
    assert float(ts) == pytest.approx(1000.0)
    assert img.dtype == np.float32 and img.max() <= 1.0

    # calibrated mode: fr1 factory intrinsics are detected from the path
    # (from_calib is gated on use_calib, reference dataloader.py:277-281)
    from splatt3r_slam_tpu import config as cfgmod

    prev = cfgmod.config.get("use_calib", False)
    try:
        cfgmod.config["use_calib"] = True
        ds_c = load_dataset(str(FIXTURE / SEQ))
        assert ds_c.has_calib()
        assert ds_c.camera_intrinsics.K_frame[0, 0] > 0
    finally:
        cfgmod.config["use_calib"] = prev
