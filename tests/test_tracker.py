"""Pose-recovery tests for the frontend GN tracker.

Oracle: synthesize a ground-truth Sim(3) pose, generate matched point sets,
and verify the optimizer recovers it (with and without noise/outliers).
"""

import pytest

import jax.numpy as jnp
import numpy as np

from splatt3r_slam_tpu.lie import sim3
from splatt3r_slam_tpu.tracking import (

    TrackingConfig,
    opt_pose_calib_sim3,
    opt_pose_ray_dist_sim3,
)

pytestmark = pytest.mark.smoke


def _random_pose(rng, rot=0.2, trans=0.3, scale=0.1):
    xi = np.concatenate(
        [
            rng.normal(size=3) * trans,
            rng.normal(size=3) * rot,
            rng.normal(size=1) * scale,
        ]
    ).astype(np.float32)
    return sim3.exp(jnp.asarray(xi))


def _cloud(rng, n=500):
    X = rng.normal(size=(n, 3)).astype(np.float32)
    X[:, 2] = np.abs(X[:, 2]) + 2.0
    return jnp.asarray(X)


def test_ray_dist_recovers_pose(rng):
    cfg = TrackingConfig()
    T_WCk = sim3.identity()
    T_gt = _random_pose(rng)  # true T_CkCf

    Xf = _cloud(rng)  # points in frame f's camera
    Xk = sim3.act(T_gt, Xf)  # same points seen in keyframe camera
    n = Xf.shape[0]
    Qk = jnp.full((n, 1), 4.0)
    valid = jnp.ones((n, 1), bool)

    T_WCf0 = sim3.identity()  # bad init (identity relative pose)
    T_WCf, T_CkCf, fail = opt_pose_ray_dist_sim3(
        Xf, Xk, T_WCf0, T_WCk, Qk, valid, cfg
    )
    assert not bool(fail)
    np.testing.assert_allclose(np.asarray(T_CkCf), np.asarray(T_gt), atol=2e-3)


def test_ray_dist_robust_to_outliers(rng):
    cfg = TrackingConfig()
    T_WCk = sim3.identity()
    T_gt = _random_pose(rng)
    Xf = _cloud(rng, 800)
    Xk = np.array(sim3.act(T_gt, Xf))
    # corrupt 15% of matches grossly
    m = rng.random(800) < 0.15
    Xk[m] += rng.normal(size=(m.sum(), 3)) * 2.0
    n = 800
    Qk = jnp.full((n, 1), 4.0)
    valid = jnp.ones((n, 1), bool)
    T_WCf, T_CkCf, fail = opt_pose_ray_dist_sim3(
        Xf, jnp.asarray(Xk), sim3.identity(), T_WCk, Qk, valid, cfg
    )
    assert not bool(fail)
    err = np.abs(np.asarray(T_CkCf) - np.asarray(T_gt))
    assert err[:3].max() < 0.05  # translation
    assert err[3:7].max() < 0.02  # quaternion


def test_ray_dist_invalid_mask_excludes(rng):
    """Corrupted points flagged invalid must not affect the solution."""
    cfg = TrackingConfig()
    T_gt = _random_pose(rng)
    Xf = np.array(_cloud(rng, 600))
    Xk = np.array(sim3.act(T_gt, jnp.asarray(Xf)))
    Xk[:100] = 1e3  # garbage
    valid = np.ones((600, 1), bool)
    valid[:100] = False
    Qk = jnp.full((600, 1), 4.0)
    _, T_CkCf, fail = opt_pose_ray_dist_sim3(
        jnp.asarray(Xf), jnp.asarray(Xk), sim3.identity(), sim3.identity(),
        Qk, jnp.asarray(valid), cfg
    )
    assert not bool(fail)
    np.testing.assert_allclose(np.asarray(T_CkCf), np.asarray(T_gt), atol=5e-3)


def test_calib_recovers_pose(rng):
    cfg = TrackingConfig()
    h, w = 120, 160
    K = jnp.array([[150.0, 0, 80], [0, 150, 60], [0, 0, 1]])
    T_gt = _random_pose(rng, rot=0.1, trans=0.15, scale=0.05)

    Xf = _cloud(rng, 700)
    Xk = sim3.act(T_gt, Xf)
    uvz, valid_meas = None, None
    from splatt3r_slam_tpu.geometry import project_calib

    meas_k, valid_meas = project_calib(Xk, K, (h, w), border=cfg.pixel_border,
                                       z_eps=cfg.depth_eps)
    n = 700
    Qk = jnp.full((n, 1), 4.0)
    valid = jnp.ones((n, 1), bool)
    _, T_CkCf, fail = opt_pose_calib_sim3(
        Xf, Xk, sim3.identity(), sim3.identity(), Qk, valid,
        meas_k, valid_meas, K, (h, w), cfg
    )
    assert not bool(fail)
    np.testing.assert_allclose(np.asarray(T_CkCf), np.asarray(T_gt), atol=5e-3)


def test_degenerate_input_sets_fail_flag():
    cfg = TrackingConfig(max_iters=5)
    n = 50
    Xf = jnp.zeros((n, 3))  # degenerate: all points at origin → singular H
    Xk = jnp.zeros((n, 3))
    Qk = jnp.ones((n, 1))
    valid = jnp.zeros((n, 1), bool)  # nothing valid → H = 0 → cholesky NaN
    _, _, fail = opt_pose_ray_dist_sim3(
        Xf, Xk, sim3.identity(), sim3.identity(), Qk, valid, cfg
    )
    assert bool(fail)
