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


def test_associate_is_one_to_one():
    """Regression: the built-in ATE used greedy-nearest association that
    could map many GT stamps onto one estimated pose; evo's TUM
    association is one-to-one (best-|dt|-first greedy matching, each
    stamp used once — the TUM RGB-D benchmark associate.py algorithm)."""
    from splatt3r_slam_tpu.runtime.evaluate import associate

    t_gt = np.array([0.0, 0.008, 1.0])
    t_es = np.array([0.005, 1.0])
    ia, ib = associate(t_gt, t_es, max_dt=0.02)
    # est stamp 0.005 is nearest to BOTH 0.0 and 0.008: it must pair only
    # with 0.008 (smaller |dt|), leaving GT 0.0 unmatched
    assert len(set(ib.tolist())) == len(ib), "est stamps must be unique"
    assert list(zip(ia.tolist(), ib.tolist())) == [(1, 0), (2, 1)]


def test_ate_rmse_matches_tum_benchmark_association(tmp_path):
    """RMSE on a duplicate-nearest-stamp case must equal the value under
    the TUM benchmark's one-to-one association, computed independently
    here (sort-by-dt greedy, the exact associate.py algorithm evo uses)."""
    from splatt3r_slam_tpu.runtime.evaluate import (ate_rmse,
                                                    umeyama_alignment)

    rng = np.random.default_rng(3)
    # GT: dense stamps; est: sparse keyframe stamps slightly offset so
    # several GT stamps share a nearest est stamp
    t_gt = np.arange(0.0, 1.0, 0.05)
    p_gt = np.cumsum(rng.normal(size=(len(t_gt), 3)), axis=0) * 0.1
    keep = np.arange(0, len(t_gt), 3)
    t_es = t_gt[keep] + 0.004
    p_es = p_gt[keep] + rng.normal(size=(len(keep), 3)) * 0.01

    def write(path, t, p):
        q = np.tile([0, 0, 0, 1.0], (len(t), 1))
        np.savetxt(path, np.column_stack([t, p, q]))

    gt_f, es_f = tmp_path / "gt.txt", tmp_path / "est.txt"
    write(gt_f, t_gt, p_gt)
    write(es_f, t_es, p_es)

    # independent re-derivation of TUM associate.py
    pairs = sorted((abs(a - b), i, j) for i, a in enumerate(t_gt)
                   for j, b in enumerate(t_es) if abs(a - b) < 0.02)
    ua, ub, match = set(), set(), []
    for _, i, j in pairs:
        if i not in ua and j not in ub:
            ua.add(i); ub.add(j); match.append((i, j))
    match.sort()
    g = p_gt[[i for i, _ in match]]
    e = p_es[[j for _, j in match]]
    s, R, t = umeyama_alignment(e, g)
    expected = float(np.sqrt((np.linalg.norm(
        (s * (R @ e.T)).T + t - g, axis=1) ** 2).mean()))

    got = ate_rmse(str(gt_f), str(es_f), max_dt=0.02)
    assert abs(got - expected) < 1e-12
    # and the association is strictly one-to-one (10 est stamps, <=10 pairs)
    assert len(match) == len(keep)
