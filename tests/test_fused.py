"""Fused frontend step: consistency against the modular tracking path."""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from splatt3r_slam_tpu import config as cfgmod
from splatt3r_slam_tpu.models import TwoViewConfig, init_model
from splatt3r_slam_tpu.runtime.frame import create_frame
from splatt3r_slam_tpu.runtime.inference import InferenceEngine
from splatt3r_slam_tpu.runtime.system import SLAMSystem

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def setup():
    cfgmod.load_config(str(ROOT / "config" / "base.yaml"))
    cfgmod.config["tracking"]["max_iters"] = 4
    cfgmod.config["tracking"]["min_match_frac"] = 0.0
    cfgmod.config["matching"]["max_iter"] = 2
    # modular-equivalence tests need full-res matching (the modular path
    # has no subgrid mode); the stride path gets its own test below
    cfgmod.config["matching"]["match_stride"] = 1
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    h, w = 48, 64
    model, params = init_model(cfg, h, w)
    return InferenceEngine(model, params, h, w), h, w


def _frames(h, w, n=4, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h * 2, w * 2, 3)).astype(np.float32)
    return [base[i : i + h, 2 * i : 2 * i + w] for i in range(n)]


def test_fused_matches_modular(setup):
    engine, h, w = setup
    imgs = _frames(h, w)

    def run(fused):
        sysm = SLAMSystem(engine, h, w, fused=fused)
        poses = []
        for i, img in enumerate(imgs):
            f = create_frame(i, img, img_size=w)
            sysm.process_frame(f)
            poses.append(np.asarray(f.T_WC))
        return np.stack(poses), len(sysm.keyframes)

    p_mod, k_mod = run(False)
    p_fus, k_fus = run(True)
    assert k_mod == k_fus
    np.testing.assert_allclose(p_fus, p_mod, atol=2e-4)


def test_fused_single_dispatch_outputs(setup):
    """Fused step populates frame state usable downstream (gaussians,
    features, pointmaps). Gaussians are lazily materialized from kept
    hook tokens (tracking head mode skips the gaussian DPTs per frame)."""
    engine, h, w = setup
    imgs = _frames(h, w)
    sysm = SLAMSystem(engine, h, w, fused=True)
    fr = []
    for i, img in enumerate(imgs[:2]):
        f = create_frame(i, img, img_size=w)
        sysm.process_frame(f)
        fr.append(f)
    f = fr[-1]
    assert f.gauss_hooks is not None or f.gaussian_pred is not None
    engine.ensure_gaussians(f)
    assert f.gaussian_pred is not None
    assert f.gaussian_pred["means"].shape == (1, h, w, 3)
    for k in ("scales", "rotations", "sh", "opacities", "conf"):
        assert k in f.gaussian_pred
    assert f.X_canon.shape == (h * w, 3)
    assert np.isfinite(np.asarray(f.T_WC)).all()


def test_fused_match_stride_2_runs(setup):
    """match_stride=2: the production TPU fast path compiles, tracks, and
    produces finite poses/flags on the subgrid (quality rationale in
    runtime/fused.py MatchingParams)."""
    engine, h, w = setup
    imgs = _frames(h, w)
    old = cfgmod.config["matching"].get("match_stride", 1)
    cfgmod.config["matching"]["match_stride"] = 2
    try:
        sysm = SLAMSystem(engine, h, w, fused=True)
        for i, img in enumerate(imgs):
            f = create_frame(i, img, img_size=w)
            sysm.process_frame(f)
            assert np.isfinite(np.asarray(f.T_WC)).all()
        assert len(sysm.keyframes) >= 1
    finally:
        cfgmod.config["matching"]["match_stride"] = old


def test_pipeline_lag_mode(setup):
    """pipeline_lag=1: flags consumed one frame late. The loop must
    complete, keep finite poses, and produce a near-identical keyframe
    set (decisions shift by at most one frame)."""
    engine, h, w = setup
    imgs = _frames(h, w, n=6)

    def run(lag):
        old = cfgmod.config["tracking"].get("pipeline_lag", 0)
        cfgmod.config["tracking"]["pipeline_lag"] = lag
        try:
            sysm = SLAMSystem(engine, h, w, fused=True)
            poses = []
            for i, img in enumerate(imgs):
                f = create_frame(i, img, img_size=w)
                sysm.process_frame(f)
                assert np.isfinite(np.asarray(f.T_WC)).all()
                poses.append(np.asarray(f.T_WC))
            return np.stack(poses), len(sysm.keyframes)
        finally:
            cfgmod.config["tracking"]["pipeline_lag"] = old

    p0, k0 = run(0)
    p1, k1 = run(1)
    assert abs(k0 - k1) <= 2, (k0, k1)
    # early frames (before any keyframe decision diverges) match exactly
    np.testing.assert_allclose(p1[0], p0[0], atol=1e-5)


def test_pipeline_lag_resync_keeps_fusion_count(setup):
    """A keyframe-state resync under pipeline_lag=1 (here: marking the
    keyframe dirty, as a backend solve does) must first flush the lagged
    in-flight frame so the host fusion count N matches the device fold
    count — otherwise N_fused is re-seeded one low for the keyframe's
    remaining life and C/N confidence normalization drifts."""
    from splatt3r_slam_tpu.runtime.frame import Mode

    engine, h, w = setup
    imgs = _frames(h, w, n=5)
    old = cfgmod.config["tracking"].get("pipeline_lag", 0)
    old_it = cfgmod.config["tracking"]["max_iters"]
    cfgmod.config["tracking"]["pipeline_lag"] = 1
    # 0 GN iterations: tracking trivially succeeds (pose passthrough), so
    # the test deterministically stays in TRACKING and every frame folds
    # into the keyframe — tiny-random GN would otherwise fail into RELOC
    # and bypass the lag/resync machinery under test
    cfgmod.config["tracking"]["max_iters"] = 0
    try:
        sysm = SLAMSystem(engine, h, w, fused=True)
        for i, img in enumerate(imgs[:3]):
            f = create_frame(i, img, img_size=w)
            sysm.process_frame(f)
        assert sysm.mode == Mode.TRACKING
        kfr = sysm.keyframes.last_keyframe()
        n_before = kfr.N
        # force the resync path mid-stream (backend solves set is_dirty)
        sysm.keyframes.is_dirty[len(sysm.keyframes) - 1] = True
        f = create_frame(3, imgs[3], img_size=w)
        sysm.process_frame(f)
        assert sysm.mode == Mode.TRACKING
        # the flush consumed the lagged frame: host N advanced past the
        # pre-resync value and matches the tracker's host-side counter,
        # so the device N_fused seeded at resync is NOT one low
        assert kfr.N >= n_before
        assert sysm.tracker._host_N == kfr.N
        n_dev = float(np.asarray(sysm.tracker._kf_state.N_fused))
        assert n_dev >= kfr.N >= 1
        f4 = create_frame(4, imgs[4], img_size=w)
        sysm.process_frame(f4)
        assert np.isfinite(np.asarray(f4.T_WC)).all()
    finally:
        cfgmod.config["tracking"]["pipeline_lag"] = old
        cfgmod.config["tracking"]["max_iters"] = old_it


def test_forced_keyframe_resets_match_warmstart(setup):
    """force_keyframe must drop the matcher warm start (idx_f2k refers to
    the OLD keyframe); the device-decided keyframe path resets it in
    _consume, the forced path resets it in process_frame. Deterministic
    stub tracker: real tiny-random GN can fail into RELOC and mask the
    forced-keyframe branch."""
    from splatt3r_slam_tpu.runtime.frame import Mode

    engine, h, w = setup
    imgs = _frames(h, w, n=2)

    class _StubTracker:
        filtering_mode = "weighted_pointmap"
        filtering_score = "median"
        idx_f2k = "warm-start-against-old-kf"
        last_T_WC_host = None

        def track(self, frame):
            frame.T_WC_host = np.zeros(3, np.float32)
            return False, False  # device says: not a keyframe

        def reset_idx_f2k(self):
            self.idx_f2k = None

    sysm = SLAMSystem(engine, h, w, fused=True)
    f0 = create_frame(0, imgs[0], img_size=w)
    sysm.process_frame(f0)  # INIT keyframe
    sysm.tracker = _StubTracker()
    f1 = create_frame(1, imgs[1], img_size=w)
    f1.feat, f1.pos = f0.feat, f0.pos
    f1.X_canon, f1.C = f0.X_canon, f0.C
    mode, new_kf = sysm.process_frame(f1, force_keyframe=True)
    assert mode == Mode.TRACKING and new_kf
    assert sysm.tracker.idx_f2k is None
    assert len(sysm.keyframes) == 2


def test_unique_match_count_exact():
    """Pins the keyframe-selection unique count to the reference's
    torch.unique semantics (tracker.py:104-110), including the case
    where valid matches legitimately land on index 0 while other
    matches are invalid (the old scatter-to-0 approximation miscounted
    here)."""
    from splatt3r_slam_tpu.runtime.fused import unique_match_count

    rng = np.random.default_rng(7)
    ns = 64
    for trial in range(20):
        idx = rng.integers(0, ns, size=ns).astype(np.int32)
        valid = rng.random(ns) < 0.6
        # force the adversarial pattern: matches (valid and invalid)
        # landing on index 0
        idx[:3] = 0
        expect = len(np.unique(idx[valid]))
        got = int(unique_match_count(jnp.asarray(idx), jnp.asarray(valid),
                                     ns))
        assert got == expect, (trial, got, expect)
    # deterministic adversarial case: valid match on 0 + invalid elsewhere
    idx = np.zeros(8, np.int32)
    idx[4:] = [1, 2, 2, 3]
    valid = np.array([True, True, False, False, True, False, True, True])
    assert int(unique_match_count(jnp.asarray(idx), jnp.asarray(valid),
                                  8)) == 4  # {0, 1, 2, 3}


def test_fused_matches_modular_calibrated(setup):
    """Calibrated pose solve (pixel+log-depth GN) in the fused step must
    match the modular tracker (reference tracker.py:216-266 semantics)."""
    engine, h, w = setup
    imgs = _frames(h, w)
    K = jnp.asarray(
        np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]],
                 np.float32))
    cfgmod.config["use_calib"] = True
    try:
        def run(fused):
            sysm = SLAMSystem(engine, h, w, K=K, fused=fused)
            poses = []
            for i, img in enumerate(imgs):
                f = create_frame(i, img, img_size=w)
                f.K = K
                sysm.process_frame(f)
                poses.append(np.asarray(f.T_WC))
            return np.stack(poses), len(sysm.keyframes)

        p_mod, k_mod = run(False)
        p_fus, k_fus = run(True)
        assert k_mod == k_fus
        np.testing.assert_allclose(p_fus, p_mod, atol=2e-4)
    finally:
        cfgmod.config["use_calib"] = False


def test_neighbor_edge_reuse_matches_symmetric(setup):
    """FactorGraph.add_neighbor_edge_from_tracking (one reverse decode +
    the fused step's stored half) builds the same consecutive edge as
    the full symmetric add_factors path."""
    from splatt3r_slam_tpu.backend import FactorGraph

    engine, h, w = setup
    imgs = _frames(h, w)

    from splatt3r_slam_tpu.runtime.frame import Mode

    def run(reuse):
        cfgmod.config["local_opt"]["reuse_tracking_edge"] = reuse
        sysm = SLAMSystem(engine, h, w, fused=True)
        sysm.backend = FactorGraph(engine, sysm.keyframes)
        for i, img in enumerate(imgs[:3]):
            f = create_frame(i, img, img_size=w)
            # identity-init the tracker's match warm start: the reused
            # direction then solves the exact problem add_factors would
            # (in production the tracker warm-starts across frames — the
            # same tracker-vs-backend init asymmetry the reference has,
            # absorbed by the descriptor refine on real geometry)
            sysm.tracker.reset_idx_f2k()
            sysm.process_frame(f, force_keyframe=(i > 0))
            if sysm.mode == Mode.RELOC:
                # random weights: GN 'fail' flips to RELOC and skips the
                # keyframe branch; run the event path explicitly (as
                # bench_system's cadence mode does)
                sysm.mode = Mode.TRACKING
                if i > 0:
                    sysm.keyframes.append(f)
                    sysm._dispatch_backend(len(sysm.keyframes) - 1)
        fg = sysm.backend
        return {k: [np.asarray(a) for a in getattr(fg, k)]
                for k in ("ii", "jj", "idx_ii2jj", "idx_jj2ii",
                          "valid_match_j", "valid_match_i",
                          "Q_ii2jj", "Q_jj2ii")}

    try:
        full = run(False)
        reused = run(True)
    finally:
        cfgmod.config["local_opt"].pop("reuse_tracking_edge", None)

    assert full["ii"] == reused["ii"] and full["jj"] == reused["jj"]
    assert len(full["ii"]) >= 2
    for k in ("idx_ii2jj", "idx_jj2ii", "valid_match_j", "valid_match_i"):
        for a, b in zip(full[k], reused[k]):
            agree = (a == b).mean()
            assert agree > 0.995, (k, agree)
    for k in ("Q_ii2jj", "Q_jj2ii"):
        for a, b in zip(full[k], reused[k]):
            close = np.isclose(a, b, atol=1e-4).mean()
            assert close > 0.995, (k, close)
