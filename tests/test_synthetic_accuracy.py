"""Trajectory-accuracy oracles: tracker + backend GN on ground-truth data.

VERDICT r1 item 7: the e2e smoke tests only assert survival. Here the
network is bypassed with a FakeEngine that serves *exact* pointmaps and
correspondences from a known scene (a textured plane) and a known camera
trajectory — the only accuracy oracle available without real checkpoint
weights.

Three tiers (pixel-index matching quantizes correspondences to the grid,
which biases tiny-image pose estimates ~25% of a 2° motion, so only
integer-pixel trajectories are *exact* end-to-end):
1. frontend GN with exact 3-D pairs → pose recovered to ~1e-3 (verified:
   exact to 4 decimals; catches Sim(3)/GN math regressions);
2. full SLAM loop (INIT → TRACKING → keyframes → backend GN) on a
   frontoparallel plane with integer-pixel camera shifts — correspondences
   exact → tight Sim3-aligned ATE;
3. full loop on a sloped plane with rotation — quantization-limited, loose
   bounds (regression canary for gross breakage).

Mirrors the reference eval protocol (`scripts/eval_tum.sh:33-52`,
evo_ape-style Sim3-aligned RMSE) with the built-in umeyama alignment.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from splatt3r_slam_tpu import config as cfgmod
from splatt3r_slam_tpu.backend import FactorGraph
from splatt3r_slam_tpu.lie import sim3
from splatt3r_slam_tpu.runtime.evaluate import umeyama_alignment
from splatt3r_slam_tpu.runtime.frame import create_frame
from splatt3r_slam_tpu.runtime.system import SLAMSystem
from splatt3r_slam_tpu.tracking.tracker import (
    TrackingConfig,
    opt_pose_ray_dist_sim3,
)

from splatt3r_slam_tpu.runtime.oracle import PlaneSceneOracle

H, W = 48, 64
N = H * W
FOCAL = float(W)
# sloped plane n·X = d (depth variation conditions the rotating scenario)
PLANE_N = np.array([0.25, 0.15, 1.0]) / np.linalg.norm([0.25, 0.15, 1.0])
PLANE_D = 2.0


def _rays():
    return PlaneSceneOracle(H, W, FOCAL).rays


def _gt_pointmap_cam(T, n, d):
    return PlaneSceneOracle(H, W, FOCAL, n, d).gt_pointmap_cam(
        np.asarray(T, np.float64))


def _project_into(T_src, T_dst, n, d):
    return PlaneSceneOracle(H, W, FOCAL, n, d).project_into(
        np.asarray(T_src, np.float64), np.asarray(T_dst, np.float64))


class FakeEngine(PlaneSceneOracle):
    """Exact-geometry engine at the test dims (the shared implementation
    lives in `splatt3r_slam_tpu/runtime/oracle.py`; the closed-loop
    benchmark uses the same class wrapping the real model)."""

    def __init__(self, plane_n=PLANE_N, plane_d=PLANE_D):
        super().__init__(H, W, FOCAL, plane_n, plane_d)


def _run_slam(engine, poses):
    # the FakeEngine's analytic matches are full-resolution; the backend's
    # TPU subgrid path (matching.match_stride > 1) is covered by
    # test_backend_subgrid_* below with a stride-aware oracle
    cfgmod.config["matching"]["match_stride"] = 1
    sysm = SLAMSystem(engine, H, W, fused=False)
    sysm.backend = FactorGraph(engine, sysm.keyframes)
    rng = np.random.default_rng(0)
    tex = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    for i, T in enumerate(poses):
        engine.register(i, T)
        sysm.process_frame(create_frame(i, tex.copy(), img_size=W))
    return sysm


def _ate(sysm, engine):
    est = np.stack(
        [np.asarray(sim3.matrix(kf.T_WC))[:3, 3] for kf in sysm.keyframes]
    )
    gt = np.stack([engine.gt[kf.frame_id][:3, 3] for kf in sysm.keyframes])
    s, R, t = umeyama_alignment(est, gt)
    err = (s * (R @ est.T)).T + t - gt
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


# ---- tier 1: frontend GN with exact pairs --------------------------------

def test_gn_recovers_pose_from_exact_pairs():
    """Rotation + translation + exact 3-D pairs → pose to ~1e-3."""
    cfgmod.load_config("config/base.yaml")
    tcfg = TrackingConfig.from_config(cfgmod.config)
    yaw = 0.06
    c, s = np.cos(yaw), np.sin(yaw)
    Tf = np.eye(4)
    Tf[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    Tf[:3, 3] = [0.6, 0.05, 0.08]
    Tk = np.eye(4)
    Xk = _gt_pointmap_cam(Tk, PLANE_N, PLANE_D)
    _, ok, Xf_exact = _project_into(Tk, Tf, PLANE_N, PLANE_D)
    Q = jnp.full((N, 1), 10.0)
    T_WCf, _, fail = opt_pose_ray_dist_sim3(
        jnp.asarray(Xf_exact, jnp.float32), jnp.asarray(Xk, jnp.float32),
        sim3.identity(), sim3.identity(), Q,
        jnp.asarray(ok)[:, None], tcfg,
    )
    assert not bool(fail)
    T = np.asarray(sim3.matrix(T_WCf))
    sc = np.cbrt(np.linalg.det(T[:3, :3]))
    np.testing.assert_allclose(sc, 1.0, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], Tf[:3, 3], atol=2e-3)
    np.testing.assert_allclose(T[:3, :3] / sc, Tf[:3, :3], atol=1e-3)


# ---- tier 2: full loop, integer-pixel shifts → exact ----------------------

def _int_shift_poses(n_frames, px_per_frame=7, py_every=4):
    """Frontoparallel plane + integer-pixel translations: index matching
    is exact, so the whole pipeline should be."""
    d = PLANE_D
    poses = []
    for i in range(n_frames):
        T = np.eye(4)
        T[0, 3] = i * px_per_frame * d / FOCAL
        T[1, 3] = (i // py_every) * d / FOCAL
        poses.append(T)
    return poses


@pytest.fixture(scope="module")
def exact_run():
    cfgmod.load_config("config/base.yaml")
    engine = FakeEngine(plane_n=np.array([0.0, 0.0, 1.0]), plane_d=2.0)
    sysm = _run_slam(engine, _int_shift_poses(20))
    return sysm, engine


def test_exact_loop_multiple_keyframes(exact_run):
    sysm, _ = exact_run
    assert len(sysm.keyframes) >= 3, "trajectory should span several KFs"
    assert sysm.backend.ii, "backend should hold factor-graph edges"


def test_exact_loop_ate_tight(exact_run):
    sysm, engine = exact_run
    rmse = _ate(sysm, engine)
    assert rmse < 2e-3, f"aligned ATE {rmse:.5f} too high for exact data"


def test_exact_loop_scale_unity(exact_run):
    sysm, _ = exact_run
    for kf in sysm.keyframes:
        T = np.asarray(sim3.matrix(kf.T_WC))
        sc = np.cbrt(np.linalg.det(T[:3, :3]))
        np.testing.assert_allclose(sc, 1.0, atol=5e-3)


# ---- tier 3: rotating trajectory, quantization-limited --------------------

def _rot_poses(n_frames):
    poses = []
    for i in range(n_frames):
        yaw = 0.012 * i
        c, s = np.cos(yaw), np.sin(yaw)
        T = np.eye(4)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T[:3, 3] = [0.22 * i, 0.03 * np.sin(0.5 * i), 0.02 * i]
        poses.append(T)
    return poses


def test_rotating_loop_ate_loose():
    """Pixel-index matching limits accuracy here (half-pixel
    correspondence quantization at 64 px); bound is a gross-regression
    canary, not an exactness claim."""
    cfgmod.load_config("config/base.yaml")
    engine = FakeEngine()
    sysm = _run_slam(engine, _rot_poses(16))
    assert len(sysm.keyframes) >= 3
    rmse = _ate(sysm, engine)
    assert rmse < 0.08, f"aligned ATE {rmse:.4f} beyond quantization budget"


# ---- threaded backend mode (VERDICT r1 weak-point 7) ----------------------

def test_threaded_backend_converges_and_drains():
    """single_thread=False: the worker thread optimizes keyframe poses
    concurrently with tracking; the run must drain cleanly, surface no
    worker exception, and still recover the trajectory."""
    cfgmod.load_config("config/base.yaml")
    cfgmod.config["single_thread"] = False
    try:
        engine = FakeEngine(plane_n=np.array([0.0, 0.0, 1.0]), plane_d=2.0)
        sysm = _run_slam(engine, _int_shift_poses(20))
        sysm._drain_backend()  # re-raises worker exceptions
        sysm._stop = True
        assert len(sysm.keyframes) >= 3
        rmse = _ate(sysm, engine)
        assert rmse < 5e-3, f"threaded-mode ATE {rmse:.5f}"
    finally:
        cfgmod.config["single_thread"] = True


def test_threaded_backend_surfaces_worker_errors():
    """A backend failure on the worker thread must not vanish: drain
    re-raises it on the main thread."""
    cfgmod.load_config("config/base.yaml")
    cfgmod.config["single_thread"] = False
    try:
        engine = FakeEngine()
        sysm = SLAMSystem(engine, H, W, fused=False)

        class Boom:
            def on_keyframe(self, kf_idx):
                raise RuntimeError("backend exploded")

        sysm.backend = Boom()
        sysm._dispatch_backend(0)
        with pytest.raises(RuntimeError, match="backend exploded"):
            sysm._drain_backend()
        sysm._stop = True
    finally:
        cfgmod.config["single_thread"] = True


def test_calib_gn_recovers_pose_from_exact_pairs():
    """Calibrated pixel+log-depth GN (tracker.py:216-266 semantics) with
    exact 3-D pairs + measurements recovers the pose to ~1e-3."""
    from splatt3r_slam_tpu.tracking.tracker import opt_pose_calib_sim3

    cfgmod.load_config("config/base.yaml")
    tcfg = TrackingConfig.from_config(cfgmod.config)
    K = jnp.asarray(
        np.array([[FOCAL, 0, W / 2], [0, FOCAL, H / 2], [0, 0, 1]],
                 np.float32))
    yaw = 0.05
    c, s = np.cos(yaw), np.sin(yaw)
    Tf = np.eye(4)
    Tf[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    Tf[:3, 3] = [0.5, 0.04, 0.06]
    Tk = np.eye(4)
    Xk = _gt_pointmap_cam(Tk, PLANE_N, PLANE_D)
    _, ok, Xf_exact = _project_into(Tk, Tf, PLANE_N, PLANE_D)
    # keyframe measurements: pixel grid + log depth of Xk
    uv = _rays()[:, :2] * FOCAL + np.array([W / 2, H / 2]) \
        - 0.0  # rays built at pixel centers -> u = x/z*f + cx
    z = Xk[:, 2:3]
    meas = np.concatenate([uv, np.log(np.maximum(z, 1e-12))], axis=-1)
    Q = jnp.full((N, 1), 10.0)
    T_WCf, _, fail = opt_pose_calib_sim3(
        jnp.asarray(Xf_exact, jnp.float32), jnp.asarray(Xk, jnp.float32),
        sim3.identity(), sim3.identity(), Q,
        jnp.asarray(ok)[:, None],
        jnp.asarray(meas, jnp.float32),
        jnp.asarray(z > 1e-6), K, (H, W), tcfg,
    )
    assert not bool(fail)
    T = np.asarray(sim3.matrix(T_WCf))
    sc = np.cbrt(np.linalg.det(T[:3, :3]))
    np.testing.assert_allclose(sc, 1.0, atol=2e-3)
    np.testing.assert_allclose(T[:3, 3], Tf[:3, 3], atol=4e-3)
    np.testing.assert_allclose(T[:3, :3] / sc, Tf[:3, :3], atol=2e-3)


# ---- tier 4: backend on the TPU matching subgrid --------------------------

class SubgridFakeEngine(FakeEngine):
    """FakeEngine whose match_symmetric honours matching.match_stride —
    the real InferenceEngine.match_symmetric contract: edge idx/valid/Q
    live on the (H/s, W/s) subgrid and the staged pose-graph solve
    subgrids its keyframe pointmaps to match (pose_graph._subgrid)."""

    def match_symmetric(self, feat_i, pos_i, feat_j, pos_j):
        out = super().match_symmetric(feat_i, pos_i, feat_j, pos_j)
        s = int(cfgmod.config["matching"].get("match_stride", 1))
        if s == 1:
            return out
        idx_i2j, idx_j2i, valid_j, valid_i, Qii, Qjj, Qji, Qij = out
        Hs, Ws = H // s, W // s
        qsel = (np.arange(H * W).reshape(H, W)[::s, ::s]).reshape(-1)

        def sub_idx(idx):
            a = np.asarray(idx)[:, qsel]
            u, v = a % W, a // W
            return jnp.asarray((v // s) * Ws + (u // s), jnp.int32)

        def sub_rows(a):
            return jnp.asarray(np.asarray(a)[:, qsel])

        return (sub_idx(idx_i2j), sub_idx(idx_j2i),
                sub_rows(valid_j), sub_rows(valid_i),
                sub_rows(Qii), sub_rows(Qjj), sub_rows(Qji),
                sub_rows(Qij))


def test_backend_subgrid_matches_full_res_ate():
    """match_stride=2 backend: subgrid-exact integer-pixel trajectory
    (shifts divisible by the stride) recovers the same tight ATE as the
    full-resolution edge state."""
    cfgmod.load_config("config/base.yaml")
    engine = SubgridFakeEngine(plane_n=np.array([0.0, 0.0, 1.0]),
                               plane_d=2.0)
    poses = _int_shift_poses(16, px_per_frame=8, py_every=4)
    # stride-2-divisible y steps keep subgrid correspondences exact
    for i, T in enumerate(poses):
        T[1, 3] = (i // 4) * 2 * PLANE_D / FOCAL
    sysm = _run_slam(engine, poses)
    cfgmod.config["matching"]["match_stride"] = 2  # _run_slam pinned 1
    sysm2 = SLAMSystem(engine, H, W, fused=False)
    sysm2.backend = FactorGraph(engine, sysm2.keyframes)
    rng = np.random.default_rng(0)
    tex = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    for i, T in enumerate(poses):
        engine.register(i, T)
        sysm2.process_frame(create_frame(i, tex.copy(), img_size=W))
    rmse_full = _ate(sysm, engine)
    rmse_sub = _ate(sysm2, engine)
    assert sysm2.backend.ii, "subgrid backend should hold edges"
    assert rmse_sub < 4e-3, f"subgrid ATE {rmse_sub:.5f} too high"
    assert rmse_sub < max(2 * rmse_full, 3e-3), (rmse_sub, rmse_full)


# ---- tier 5: edge-eviction pressure (VERDICT r03 weak-6) -------------------


def test_eviction_drops_loop_edges_before_odometry():
    """_enforce_max_edges must evict oldest loop-closure edges first and
    keep the consecutive odometry chain intact (the chain is what keeps
    the active window connected)."""
    cfgmod.load_config("config/base.yaml")
    g = FactorGraph(engine=None, frames=None)
    # 6 odometry edges (k, k+1) + 4 loop edges, interleaved in time
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (1, 4), (3, 4),
             (4, 5), (0, 5), (5, 6), (2, 6)]
    for i, j in edges:
        g.ii.append(i)
        g.jj.append(j)
        for name in ("idx_ii2jj", "idx_jj2ii", "valid_match_j",
                     "valid_match_i", "Q_ii2jj", "Q_jj2ii"):
            getattr(g, name).append(None)
    g.cfg = dict(g.cfg)
    g.cfg["max_edges"] = 7
    g._enforce_max_edges()
    kept = set(zip(g.ii, g.jj))
    chain = {(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)}
    assert chain <= kept, f"odometry chain broken: kept {kept}"
    assert len(g.ii) == 7
    # oldest loop edges evicted first: (0,2),(1,4),(0,5) out, (2,6) kept
    assert (2, 6) in kept and (0, 2) not in kept


def test_eviction_pressure_keeps_ate_bounded_and_graph_connected():
    """System-level: a long exact-data run under heavy max_edges pressure
    must keep the active edge set connected (single component over its
    keyframes) and the FULL trajectory ATE tight — frozen-out keyframes
    keep their last optimized (correct) poses, the active window stays
    anchored to them via the pin."""
    cfgmod.load_config("config/base.yaml")
    cap = 4
    cfgmod.config["local_opt"]["max_edges"] = cap
    try:
        engine = FakeEngine(plane_n=np.array([0.0, 0.0, 1.0]), plane_d=2.0)
        cfgmod.config["matching"]["match_stride"] = 1
        sysm = SLAMSystem(engine, H, W, fused=False)
        sysm.backend = FactorGraph(engine, sysm.keyframes)
        rng = np.random.default_rng(0)
        tex = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        # force a fast keyframe cadence: eviction pressure without large
        # per-frame motion (keeps the exact-match oracle valid) and with
        # the active window inside the smallest solver buckets
        for i, T in enumerate(_int_shift_poses(28)):
            engine.register(i, T)
            sysm.process_frame(create_frame(i, tex.copy(), img_size=W),
                               force_keyframe=(i > 0 and i % 3 == 0))
        n_kf = len(sysm.keyframes)
        assert n_kf >= cap + 3, f"need eviction pressure, got {n_kf} KFs"
        assert len(sysm.backend.ii) <= cap

        # active edge set forms ONE connected component
        active = sorted(set(sysm.backend.ii) | set(sysm.backend.jj))
        parent = {k: k for k in active}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for i, j in zip(sysm.backend.ii, sysm.backend.jj):
            parent[find(i)] = find(j)
        comps = {find(k) for k in active}
        assert len(comps) == 1, f"active graph split into {len(comps)} parts"
        # the window covers the newest keyframes contiguously
        assert active == list(range(min(active), n_kf))

        rmse = _ate(sysm, engine)
        assert rmse < 5e-3, f"ATE {rmse:.5f} drifted under eviction pressure"
    finally:
        cfgmod.load_config("config/base.yaml")
