"""Frontend Sim(3) Gauss-Newton pose tracking.

Spec: reference `splatt3r_slam/tracker.py:129-266` — per-frame alignment of
the current frame's matched points against the last keyframe, on the
relative pose T_CkCf, with Huber-whitened residuals and a 7x7 Cholesky
solve per iteration.

TPU-native shape: the GN iteration is a `lax.while_loop` with a static
iteration cap and the reference's convergence test as the loop predicate
(`nonlinear_optimizer.py:5-25` semantics); a failed Cholesky (NaNs in the
step) raises no exception — it sets a `fail` flag that the runtime maps to
relocalization, exactly where the reference catches the torch exception
(`tracker.py:91-93`). H = JᵀWJ is built by one fp32 einsum over all pixels
(MXU) instead of materializing the stacked A matrix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from splatt3r_slam_tpu.geometry.projective import point_to_ray_dist, project_calib
from splatt3r_slam_tpu.geometry.robust import huber
from splatt3r_slam_tpu.lie import sim3


class TrackingConfig(NamedTuple):
    """Static tracking parameters (reference config/base.yaml `tracking:`)."""

    min_match_frac: float = 0.05
    max_iters: int = 50
    C_conf: float = 0.0
    Q_conf: float = 1.5
    rel_error: float = 1e-3
    delta_norm: float = 1e-3
    huber: float = 1.345
    match_frac_thresh: float = 0.333
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    sigma_point: float = 0.05
    pixel_border: float = -10.0
    depth_eps: float = 1e-6
    filtering_mode: str = "weighted_pointmap"
    filtering_score: str = "median"

    @classmethod
    def from_config(cls, cfg: dict) -> "TrackingConfig":
        t = cfg["tracking"]
        return cls(**{k: t[k] for k in cls._fields if k in t})


def _solve_7x7(sqrt_info: jnp.ndarray, r: jnp.ndarray, J: jnp.ndarray, k_huber: float):
    """Whiten → Huber → normal equations → Cholesky (spec: tracker.py:156-171).

    sqrt_info, r: (n, d); J: (n, d, 7). Returns (tau (7,), cost scalar).
    """
    whitened_r = sqrt_info * r
    robust = sqrt_info * jnp.sqrt(huber(whitened_r, k=k_huber))
    A = robust[..., None] * J  # (n, d, 7)
    b = robust * r  # (n, d)
    H = jnp.einsum("ndi,ndj->ij", A, A, precision=lax.Precision.HIGH)
    g = -jnp.einsum("ndi,nd->i", A, b, precision=lax.Precision.HIGH)
    cost = 0.5 * jnp.sum(b * b)
    L, low = jax.scipy.linalg.cho_factor(H, lower=True)
    tau = jax.scipy.linalg.cho_solve((L, low), g)
    return tau, cost


def _gn_loop(residual_fn, T_init: jnp.ndarray, cfg: TrackingConfig):
    """Shared GN driver: while_loop with convergence-or-fail predicate.

    residual_fn(T) -> (sqrt_info (n,d), r (n,d), J (n,d,7)).
    Returns (T, fail) where fail=True reproduces the reference's
    Cholesky-exception path.
    """

    def cond(state):
        T, old_cost, it, done, fail = state
        return (~done) & (~fail) & (it < cfg.max_iters)

    def body(state):
        T, old_cost, it, _, fail = state
        sqrt_info, r, J = residual_fn(T)
        tau, new_cost = _solve_7x7(sqrt_info, r, J, cfg.huber)
        bad = ~jnp.all(jnp.isfinite(tau))
        tau = jnp.where(bad, jnp.zeros_like(tau), tau)
        T_new = sim3.retr(T, tau)
        rel_dec = jnp.abs((old_cost - new_cost) / old_cost)
        converged = (rel_dec < cfg.rel_error) | (
            jnp.linalg.norm(tau) < cfg.delta_norm
        )
        return T_new, new_cost, it + 1, converged, fail | bad

    init = (T_init, jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0),
            jnp.asarray(False), jnp.asarray(False))
    T, _, _, _, fail = lax.while_loop(cond, body, init)
    return T, fail


def opt_pose_ray_dist_sim3(
    Xf: jnp.ndarray,  # (n, 3) frame points, matched into keyframe order
    Xk: jnp.ndarray,  # (n, 3) keyframe points
    T_WCf: jnp.ndarray,  # (8,)
    T_WCk: jnp.ndarray,  # (8,)
    Qk: jnp.ndarray,  # (n, 1) match confidence
    valid: jnp.ndarray,  # (n, 1) bool
    cfg: TrackingConfig,
):
    """Uncalibrated ray+log-dist tracking (spec: tracker.py:173-214).

    Returns (T_WCf', T_CkCf, fail).
    """
    # production dtype policy: all GN math in fp32
    Xf, Xk, T_WCf, T_WCk, Qk = (
        jnp.asarray(a, jnp.float32) for a in (Xf, Xk, T_WCf, T_WCk, Qk)
    )
    w = valid.astype(jnp.float32) * jnp.sqrt(Qk)
    sqrt_info = jnp.concatenate(
        [jnp.repeat(w / cfg.sigma_ray, 3, axis=-1), w / cfg.sigma_dist], axis=-1
    )  # (n, 4)

    T_CkCf0 = sim3.rel(T_WCk, T_WCf)
    rd_k = point_to_ray_dist(Xk)  # (n, 4) measurement

    def residual(T_CkCf):
        # hand-fused ∂(ray,dist)/∂ξ rows (the closed forms the CUDA kernel
        # uses, gn_kernels.cu:979-1088): dr/dω = −[r]ₓ, dr/dσ = 0,
        # dd/dτ = rᵀ, dd/dσ = d — avoids the (n,3,7) act-jacobian and the
        # per-point batched einsum entirely (pure VPU elementwise math).
        P = sim3.act(T_CkCf, Xf)  # (n, 3)
        d2 = jnp.sum(P * P, axis=-1, keepdims=True)
        d = jnp.sqrt(d2)
        dinv = 1.0 / d
        rh = P * dinv  # unit rays (n, 3)
        rd_f = jnp.concatenate([rh, d], axis=-1)
        r = rd_k - rd_f

        n3i = dinv / d2
        px, py, pz = P[:, 0:1], P[:, 1:2], P[:, 2:3]
        rx, ry, rz = rh[:, 0:1], rh[:, 1:2], rh[:, 2:3]
        z = jnp.zeros_like(rx)
        dxx = dinv - px * px * n3i
        dyy = dinv - py * py * n3i
        dzz = dinv - pz * pz * n3i
        dxy = -px * py * n3i
        dxz = -px * pz * n3i
        dyz = -py * pz * n3i
        # rows of d(rd_f)/dξ; J = −rows
        row_x = jnp.concatenate([dxx, dxy, dxz, z, rz, -ry, z], axis=-1)
        row_y = jnp.concatenate([dxy, dyy, dyz, -rz, z, rx, z], axis=-1)
        row_z = jnp.concatenate([dxz, dyz, dzz, ry, -rx, z, z], axis=-1)
        row_d = jnp.concatenate([rx, ry, rz, z, z, z, d], axis=-1)
        J = -jnp.stack([row_x, row_y, row_z, row_d], axis=1)  # (n, 4, 7)
        return sqrt_info, r, J

    T_CkCf, fail = _gn_loop(residual, T_CkCf0, cfg)
    T_WCf_new = sim3.multiply(T_WCk, T_CkCf)
    return T_WCf_new, T_CkCf, fail


def opt_pose_calib_sim3(
    Xf: jnp.ndarray,  # (n, 3)
    Xk: jnp.ndarray,  # (n, 3) (unused beyond meas; kept for API parity)
    T_WCf: jnp.ndarray,
    T_WCk: jnp.ndarray,
    Qk: jnp.ndarray,  # (n, 1)
    valid: jnp.ndarray,  # (n, 1) bool
    meas_k: jnp.ndarray,  # (n, 3) [u, v, log z] keyframe measurements
    valid_meas_k: jnp.ndarray,  # (n, 1) bool
    K: jnp.ndarray,  # (3, 3)
    img_size,
    cfg: TrackingConfig,
):
    """Calibrated pixel+log-depth tracking (spec: tracker.py:216-266)."""
    Xf, Xk, T_WCf, T_WCk, Qk, meas_k, K = (
        jnp.asarray(a, jnp.float32)
        for a in (Xf, Xk, T_WCf, T_WCk, Qk, meas_k, K)
    )
    w = valid.astype(jnp.float32) * jnp.sqrt(Qk)
    sqrt_info = jnp.concatenate(
        [jnp.repeat(w / cfg.sigma_pixel, 2, axis=-1), w / cfg.sigma_depth],
        axis=-1,
    )  # (n, 3)

    T_CkCf0 = sim3.rel(T_WCk, T_WCf)

    def residual(T_CkCf):
        Xf_Ck = sim3.act(T_CkCf, Xf)
        dX_dT = sim3.act_jacobian(Xf_Ck)
        pz, dpz_dX, valid_proj = project_calib(
            Xf_Ck,
            K,
            img_size,
            jacobian=True,
            border=cfg.pixel_border,
            z_eps=cfg.depth_eps,
        )
        valid2 = (valid_proj & valid_meas_k).astype(jnp.float32)
        r = meas_k - pz
        J = -jnp.einsum(
            "nij,njk->nik", dpz_dX, dX_dT, precision=lax.Precision.HIGH
        )
        return valid2 * sqrt_info, r, J

    T_CkCf, fail = _gn_loop(residual, T_CkCf0, cfg)
    T_WCf_new = sim3.multiply(T_WCk, T_CkCf)
    return T_WCf_new, T_CkCf, fail
