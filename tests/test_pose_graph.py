"""Pose-graph GN solver tests: synthetic multi-keyframe recovery.

Oracle: ground-truth Sim(3) poses observing shared world points with
identity pixel matches; perturbed initializations must be pulled back to
ground truth (pose 0 pinned fixes the gauge; the dist/log-depth residual
fixes scale).
"""

import jax.numpy as jnp
import numpy as np

from splatt3r_slam_tpu.lie import sim3
from splatt3r_slam_tpu.ops import pose_graph


def _setup(rng, m=4, n=300, perturb=0.1):
    P = rng.normal(size=(n, 3)).astype(np.float32)
    P[:, 2] += 4.0  # in front

    T_gt = [sim3.identity()]
    for k in range(1, m):
        xi = np.concatenate(
            [rng.normal(size=3) * 0.3, rng.normal(size=3) * 0.2,
             rng.normal(size=1) * 0.1]
        ).astype(np.float32)
        T_gt.append(sim3.exp(jnp.asarray(xi)))
    T_gt = jnp.stack(T_gt)  # camera→world

    Xs = jnp.stack([sim3.act(sim3.inverse(T_gt[k]), jnp.asarray(P))
                    for k in range(m)])
    Cs = jnp.ones((m, n, 1)) * 5.0

    # chain + loop edges, identity matches
    ii = list(range(m - 1)) + [0]
    jj = list(range(1, m)) + [m - 1]
    E = len(ii)
    idx = jnp.broadcast_to(jnp.arange(n), (E, n))
    valid = jnp.ones((E, n), bool)
    Q = jnp.ones((E, n)) * 5.0
    on = jnp.ones((E,))

    # perturb all but pose 0
    T0 = [np.asarray(T_gt[0])]
    for k in range(1, m):
        xi = (rng.normal(size=7) * perturb).astype(np.float32)
        T0.append(np.asarray(sim3.retr(T_gt[k], jnp.asarray(xi))))
    T0 = jnp.asarray(np.stack(T0))
    return T_gt, T0, Xs, Cs, jnp.asarray(ii), jnp.asarray(jj), idx, valid, Q, on


def test_rays_recovers_poses(rng):
    T_gt, T0, Xs, Cs, ii, jj, idx, valid, Q, on = _setup(rng)
    T = pose_graph.gauss_newton_rays(T0, Xs, Cs, ii, jj, idx, valid, Q, on,
                                     max_iter=20)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_gt), atol=5e-3)


def test_points_recovers_poses(rng):
    T_gt, T0, Xs, Cs, ii, jj, idx, valid, Q, on = _setup(rng)
    T = pose_graph.gauss_newton_points(T0, Xs, Cs, ii, jj, idx, valid, Q, on,
                                       max_iter=20)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_gt), atol=5e-3)


def test_calib_recovers_poses(rng):
    T_gt, T0, Xs, Cs, ii, jj, idx, valid, Q, on = _setup(rng, perturb=0.05)
    h, w = 120, 160
    K = jnp.array([[140.0, 0, 80], [0, 140, 60], [0, 0, 1]])
    T = pose_graph.gauss_newton_calib(
        T0, Xs, Cs, K, ii, jj, idx, valid, Q, on, (h, w), max_iter=20
    )
    err = np.abs(np.asarray(T) - np.asarray(T_gt))
    assert err.max() < 2e-2, err.max()


def test_padded_edges_are_inert(rng):
    """Zeroed edge_on rows must not change the solution."""
    T_gt, T0, Xs, Cs, ii, jj, idx, valid, Q, on = _setup(rng)
    E = ii.shape[0]
    # pad with garbage edges that are switched off
    ii_p = jnp.concatenate([ii, jnp.zeros(3, ii.dtype)])
    jj_p = jnp.concatenate([jj, jnp.ones(3, jj.dtype)])
    idx_p = jnp.concatenate([idx, idx[:3] * 0])
    valid_p = jnp.concatenate([valid, jnp.ones_like(valid[:3])])
    Q_p = jnp.concatenate([Q, Q[:3] * 100])
    on_p = jnp.concatenate([on, jnp.zeros(3)])
    T1 = pose_graph.gauss_newton_rays(T0, Xs, Cs, ii, jj, idx, valid, Q, on,
                                      max_iter=5)
    T2 = pose_graph.gauss_newton_rays(T0, Xs, Cs, ii_p, jj_p, idx_p, valid_p,
                                      Q_p, on_p, max_iter=5)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-5)


def test_pinned_pose_unchanged(rng):
    T_gt, T0, Xs, Cs, ii, jj, idx, valid, Q, on = _setup(rng)
    T = pose_graph.gauss_newton_rays(T0, Xs, Cs, ii, jj, idx, valid, Q, on,
                                     max_iter=3)
    np.testing.assert_array_equal(np.asarray(T[0]), np.asarray(T0[0]))
