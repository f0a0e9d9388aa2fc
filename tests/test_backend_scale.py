"""Backend GN at the bucket ceiling: 512 keyframes / 1024 two-way edges.

VERDICT r1 task 8: prove the padded dense system (7·512 = 3584 square)
compiles and solves with bounded memory, and that identity-padding
yields exactly zero updates for inactive (padding) poses.

Pixel count per keyframe is kept small (the solver is N-agnostic; the
3584-square dense Cholesky and the 2048-edge scatter are what scale) so
the CPU test stays tractable. Spec: `ops/pose_graph.py`,
`backend/factor_graph.py::_staged_inputs`, SURVEY §7 (dense-on-MXU
design; reference Eigen solve `gn_kernels.cu:56-158`).
"""

import json
import pathlib
import time

import numpy as np
import pytest

import jax.numpy as jnp

from splatt3r_slam_tpu.lie import sim3
from splatt3r_slam_tpu.ops import pose_graph

M_REAL = 400          # real keyframes (padded to the 512 bucket)
M_PAD = 512
E_REAL = 900          # one-way edges (doubled to 1800, padded to 2048)
E_PAD = 2048
N_PIX = 64


@pytest.mark.slow
def test_backend_at_512kf_bucket_ceiling():
    rng = np.random.default_rng(0)

    # GT poses along a corridor; canonical (camera-frame) points are the
    # shared world scene seen from each GT pose, so edges constrain
    # relative poses; INITIAL pose estimates are GT + noise → nonzero
    # GN updates
    Xw = rng.uniform(-1, 1, size=(N_PIX, 3)).astype(np.float32)
    Xw[:, 2] += 3.0

    Twc, Xs = [], []
    for k in range(M_REAL):
        t_gt = np.array([0.05 * k, 0.0, 0.0], np.float32)
        Xs.append(jnp.asarray(
            Xw - t_gt + 0.002 * rng.normal(size=Xw.shape), jnp.float32))
        tau = np.zeros(7, np.float32)
        tau[:3] = t_gt + (0.01 * rng.normal(size=3) if k > 0 else 0.0)
        tau[3:6] = 0.003 * rng.normal(size=3) if k > 0 else 0.0
        Twc.append(sim3.retr(sim3.identity(), jnp.asarray(tau)))
    Twc_t = tuple(Twc) + (Twc[0],) * (M_PAD - M_REAL)
    Xs_t = tuple(Xs) + (Xs[0],) * (M_PAD - M_REAL)
    Cs_t = tuple(jnp.full((N_PIX, 1), 10.0) for _ in range(M_PAD))
    Ns = np.ones((M_PAD,), np.float32)

    # consecutive + random long-range edges, two-way
    ii1 = list(range(M_REAL - 1))
    jj1 = list(range(1, M_REAL))
    extra = E_REAL - len(ii1)
    ri = rng.integers(0, M_REAL - 5, size=extra)
    rj = ri + rng.integers(2, 5, size=extra)
    ii1 += ri.tolist()
    jj1 += np.minimum(rj, M_REAL - 1).tolist()
    ii = np.asarray(ii1 + jj1, np.int32)
    jj = np.asarray(jj1 + ii1, np.int32)
    E2 = len(ii)
    on = np.zeros((E_PAD,), np.float32)
    on[:E2] = 1.0
    ii_p = np.zeros((E_PAD,), np.int32)
    jj_p = np.zeros((E_PAD,), np.int32)
    ii_p[:E2], jj_p[:E2] = ii, jj

    idx = jnp.asarray(np.arange(N_PIX, dtype=np.int32))
    valid = jnp.ones((N_PIX,), bool)
    Q = jnp.full((N_PIX,), 10.0)
    idx_t = (idx,) * E_PAD
    valid_t = (valid,) * E_PAD
    Q_t = (Q,) * E_PAD

    def solve_once():
        out = pose_graph.gauss_newton_rays_staged(
            Twc_t, Xs_t, Cs_t, Ns, jnp.asarray(ii_p), jnp.asarray(jj_p),
            idx_t, valid_t, Q_t, jnp.asarray(on),
            num_fix=1, max_iter=2, sigma_ray=0.003, sigma_dist=10.0,
            C_thresh=0.0, Q_thresh=1.5, delta_thresh=1e-10, pix_stride=1,
        )
        return np.asarray(out)

    t0 = time.time()
    Twc_new = solve_once()
    dt = time.time() - t0
    t1 = time.time()
    solve_once()  # warm: execution only, the comparable number
    dt_warm = time.time() - t1

    assert Twc_new.shape == (M_PAD, 8)
    assert np.isfinite(Twc_new).all()
    # pinned pose untouched
    np.testing.assert_allclose(Twc_new[0], np.asarray(Twc_t[0]), atol=1e-7)
    # identity-padding: inactive poses receive exactly zero update
    pad_in = np.stack([np.asarray(T) for T in Twc_t[M_REAL:]])
    np.testing.assert_allclose(Twc_new[M_REAL:], pad_in, atol=1e-6)
    # active poses actually moved (the noisy inits get optimized)
    moved = np.abs(Twc_new[1:M_REAL, :3]
                   - np.stack([np.asarray(T)[:3]
                               for T in Twc_t[1:M_REAL]])).max()
    assert moved > 1e-5

    logs = pathlib.Path(__file__).resolve().parents[1] / "logs"
    logs.mkdir(exist_ok=True)
    (logs / "backend_scale_cpu.json").write_text(json.dumps({
        "m_real": M_REAL, "m_pad": M_PAD, "edges_two_way": E2,
        "e_pad": E_PAD, "n_pix": N_PIX, "iters": 2,
        "wall_s_incl_compile": round(dt, 2),
        "wall_s_warm": round(dt_warm, 2),
        "note": "CPU test-harness timing on a 1-core shared host. "
                "wall_s_incl_compile swings several-x with host load and "
                "compile-cache state between commits (4.1 -> 16.5 -> 6.8 s "
                "across rounds was environment, not code) — do not compare "
                "it; wall_s_warm (execution only) is the comparable CPU "
                "number. TPU solve timing: logs/bench_system_tpu_v5e.json.",
    }, indent=1))
