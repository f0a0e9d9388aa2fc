"""Pure-JAX Sim(3) / SE(3) Lie-group library.

Storage layout matches the reference's lietorch embedding (reference
`splatt3r_slam/frame.py:266`, `gn_kernels.cu:414-452`): an 8-float vector
``[tx ty tz qx qy qz qw s]`` — translation, unit quaternion (xyzw), scale.
The group action is ``x' = s * R(q) @ x + t``.

Tangent vectors are 7-floats ``[tau(3), phi(3), sigma]`` (translation,
rotation, log-scale) applied as *left* perturbations: ``retr(T, xi) =
exp(xi) ∘ T``, matching `gn_kernels.cu:retrSim3` (lines 414-437) and
lietorch ``.retr()`` semantics used by the reference tracker
(`splatt3r_slam/tracker.py:195,247`).

Everything here is elementwise math that XLA fuses; no kernels needed
(SURVEY.md §2b "lietorch" row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6  # small-angle switch, matches gn_kernels.cu:33 (#define EPS 1e-6)

# -----------------------------------------------------------------------------
# Quaternion primitives (xyzw layout).
# -----------------------------------------------------------------------------


def quat_mul(qi: jnp.ndarray, qj: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q_i ⊗ q_j, xyzw layout (spec: gn_kernels.cu:179-186)."""
    xi, yi, zi, wi = jnp.split(qi, 4, axis=-1)
    xj, yj, zj, wj = jnp.split(qj, 4, axis=-1)
    x = wi * xj + xi * wj + yi * zj - zi * yj
    y = wi * yj - xi * zj + yi * wj + zi * xj
    z = wi * zj + xi * yj - yi * xj + zi * wj
    w = wi * wj - xi * xj - yi * yj - zi * zj
    return jnp.concatenate([x, y, z, w], axis=-1)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a unit quaternion (conjugate), gn_kernels.cu:190-195."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_act(q: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) x by unit quaternion q (spec: gn_kernels.cu:197-207).

    Broadcasts over leading dims: q (..., 4), x (..., 3).
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, x)
    return x + qw * uv + jnp.cross(qv, uv)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (xyzw) → 3x3 rotation matrix.

    Matches `splatt3r_core/utils/geometry.py:24-50` (scipy xyzw order).
    """
    i, j, k, r = jnp.split(q, 4, axis=-1)
    two_s = 2.0 / jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-12)
    rows = jnp.stack(
        [
            1 - two_s[..., 0] * (j[..., 0] ** 2 + k[..., 0] ** 2),
            two_s[..., 0] * (i[..., 0] * j[..., 0] - k[..., 0] * r[..., 0]),
            two_s[..., 0] * (i[..., 0] * k[..., 0] + j[..., 0] * r[..., 0]),
            two_s[..., 0] * (i[..., 0] * j[..., 0] + k[..., 0] * r[..., 0]),
            1 - two_s[..., 0] * (i[..., 0] ** 2 + k[..., 0] ** 2),
            two_s[..., 0] * (j[..., 0] * k[..., 0] - i[..., 0] * r[..., 0]),
            two_s[..., 0] * (i[..., 0] * k[..., 0] - j[..., 0] * r[..., 0]),
            two_s[..., 0] * (j[..., 0] * k[..., 0] + i[..., 0] * r[..., 0]),
            1 - two_s[..., 0] * (i[..., 0] ** 2 + j[..., 0] ** 2),
        ],
        axis=-1,
    )
    return rows.reshape(q.shape[:-1] + (3, 3))


# -----------------------------------------------------------------------------
# Sim(3) group ops on the (..., 8) embedding.
# -----------------------------------------------------------------------------


def identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """Identity Sim3 element(s), embedding [0 0 0, 0 0 0 1, 1]."""
    e = jnp.array([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)
    return jnp.broadcast_to(e, tuple(batch_shape) + (8,))


def split(T: jnp.ndarray):
    """(t, q, s) views of the embedding. s keeps its trailing singleton dim."""
    return T[..., 0:3], T[..., 3:7], T[..., 7:8]


def act(T: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Group action x' = s·R(q)·x + t  (spec: gn_kernels.cu:209-221).

    T: (..., 8); x: (..., 3). Leading dims broadcast.
    """
    t, q, s = split(T)
    return s * quat_act(q, x) + t


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Group inverse: x = (1/s)·Rᵀ·(x' − t)."""
    t, q, s = split(T)
    q_inv = quat_conj(q)
    s_inv = 1.0 / s
    t_inv = -s_inv * quat_act(q_inv, t)
    return jnp.concatenate([t_inv, q_inv, s_inv], axis=-1)


def multiply(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    """Composition Ta ∘ Tb (act with Tb first)."""
    ta, qa, sa = split(Ta)
    tb, qb, sb = split(Tb)
    t = sa * quat_act(qa, tb) + ta
    q = quat_mul(qa, qb)
    s = sa * sb
    return jnp.concatenate([t, q, s], axis=-1)


def rel(Ti: jnp.ndarray, Tj: jnp.ndarray) -> jnp.ndarray:
    """Relative transform T_ij = T_i⁻¹ ∘ T_j (spec: gn_kernels.cu:249-270)."""
    return multiply(inverse(Ti), Tj)


def normalize(T: jnp.ndarray) -> jnp.ndarray:
    """Re-normalize the quaternion part (guards against fp drift)."""
    t, q, s = split(T)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([t, q, s], axis=-1)


def exp_so3(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential → quaternion (spec: gn_kernels.cu:302-323)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    theta_p4 = theta_sq * theta_sq
    imag_small = 0.5 - (1.0 / 48.0) * theta_sq + (1.0 / 3840.0) * theta_p4
    real_small = 1.0 - (1.0 / 8.0) * theta_sq + (1.0 / 384.0) * theta_p4
    imag_big = jnp.sin(0.5 * theta) / theta
    real_big = jnp.cos(0.5 * theta)
    imag = jnp.where(small, imag_small, imag_big)
    real = jnp.where(small, real_small, real_big)
    return jnp.concatenate([imag * phi, real], axis=-1)


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) exponential map, tangent [tau, phi, sigma] → embedding.

    Coefficients A, B, C of W = C·I + A·Φ + B·Φ² follow lietorch's rxso3
    (spec: gn_kernels.cu:325-412). Branches are selected with `where` over
    safe denominators so the unused branch never produces NaNs.
    """
    tau = xi[..., 0:3]
    phi = xi[..., 3:6]
    sigma = xi[..., 6:7]

    q = exp_so3(phi)
    scale = jnp.exp(sigma)

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 0.0))
    small_theta = theta < _EPS
    small_sigma = jnp.abs(sigma) < _EPS

    theta_s = jnp.where(small_theta, 1.0, theta)
    theta_sq_s = jnp.where(small_theta, 1.0, theta_sq)
    sigma_s = jnp.where(small_sigma, 1.0, sigma)
    sigma_sq_s = sigma_s * sigma_s

    # sigma small
    C_ss = jnp.ones_like(sigma)
    A_ss_ts = jnp.full_like(sigma, 0.5)
    B_ss_ts = jnp.full_like(sigma, 1.0 / 6.0)
    A_ss_tl = (1.0 - jnp.cos(theta_s)) / theta_sq_s
    B_ss_tl = (theta_s - jnp.sin(theta_s)) / (theta_sq_s * theta_s)

    # sigma large
    C_sl = (scale - 1.0) / sigma_s
    A_sl_ts = ((sigma_s - 1.0) * scale + 1.0) / sigma_sq_s
    B_sl_ts = (scale * 0.5 * sigma_sq_s + scale - 1.0 - sigma_s * scale) / (
        sigma_sq_s * sigma_s
    )
    a_ = scale * jnp.sin(theta_s)
    b_ = scale * jnp.cos(theta_s)
    c_ = theta_sq_s + sigma_s * sigma_s
    A_sl_tl = (a_ * sigma_s + (1.0 - b_) * theta_s) / (theta_s * c_)
    B_sl_tl = (C_sl - ((b_ - 1.0) * sigma_s + a_ * theta_s) / c_) / theta_sq_s

    C = jnp.where(small_sigma, C_ss, C_sl)
    A = jnp.where(
        small_sigma,
        jnp.where(small_theta, A_ss_ts, A_ss_tl),
        jnp.where(small_theta, A_sl_ts, A_sl_tl),
    )
    B = jnp.where(
        small_sigma,
        jnp.where(small_theta, B_ss_ts, B_ss_tl),
        jnp.where(small_theta, B_sl_ts, B_sl_tl),
    )

    phi_x_tau = jnp.cross(phi, tau)
    phi_x2_tau = jnp.cross(phi, phi_x_tau)
    t = C * tau + A * phi_x_tau + B * phi_x2_tau
    return jnp.concatenate([t, q, scale], axis=-1)


def retr(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left retraction exp(xi) ∘ T  (spec: gn_kernels.cu:414-437)."""
    return multiply(exp(xi), T)


def matrix(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous matrix [sR | t; 0 0 0 1].

    Matches reference `_sim3_to_4x4` (`splatt3r_utils.py:153-165`).
    """
    t, q, s = split(T)
    R = quat_to_matrix(q) * s[..., None]
    bottom = jnp.zeros(T.shape[:-1] + (1, 4), dtype=T.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def adj_inv_apply_row(T: jnp.ndarray, x7: jnp.ndarray) -> jnp.ndarray:
    """Row-vector × Adj(T)⁻¹  (spec: gn_kernels.cu:272-300 apply_Sim3_adj_inv).

    Used by the pose-graph backend to transform a residual Jacobian taken
    w.r.t. the relative pose T_ij into one w.r.t. the left perturbation of
    T_j: ∂r/∂ξ_j = (∂r/∂ξ_ij) · Adj(T_i)⁻¹.

    T: (..., 8); x7: (..., 7) rows [a(3), b(3), c].
    """
    t, q, s = split(T)
    a = x7[..., 0:3]
    b = x7[..., 3:6]
    c = x7[..., 6:7]
    s_inv = 1.0 / s
    Ra = quat_act(q, a)
    y0 = s_inv * Ra
    y1 = quat_act(q, b) + s_inv * jnp.cross(t, Ra)
    y2 = c + s_inv * jnp.sum(t * Ra, axis=-1, keepdims=True)
    return jnp.concatenate([y0, y1, y2], axis=-1)


def act_jacobian(pW: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of ξ ↦ exp(ξ)·pW at ξ=0: [I₃ | −[pW]ₓ | pW], shape (..., 3, 7).

    Matches reference `geometry.py:45-52` (act_Sim3 with jacobian=True).
    """
    batch = pW.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pW.dtype), batch + (3, 3))
    sk = -skew(pW)
    return jnp.concatenate([eye, sk, pW[..., :, None]], axis=-1)


def skew(x: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [x]ₓ (spec: geometry.py:5-9)."""
    x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
    o = jnp.zeros_like(x0)
    rows = jnp.stack([o, -x2, x1, x2, o, -x0, -x1, x0, o], axis=-1)
    return rows.reshape(x.shape[:-1] + (3, 3))


# -----------------------------------------------------------------------------
# SE(3) helpers (scale-dropped Sim3, for trajectory export).
# -----------------------------------------------------------------------------


def to_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Drop scale: 8-vec → 7-vec [t q] (reference `lietorch_utils.py:6-13`)."""
    return T[..., :7]


def se3_matrix(T7: jnp.ndarray) -> jnp.ndarray:
    """SE3 7-vec [t q] → 4x4 matrix."""
    t = T7[..., 0:3]
    q = T7[..., 3:7]
    R = quat_to_matrix(q)
    bottom = jnp.zeros(T7.shape[:-1] + (1, 4), dtype=T7.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
