"""Projective geometry with analytic Jacobians (pure JAX).

Behavioral spec: reference `splatt3r_slam/geometry.py:5-123`. All functions
are shape-polymorphic over leading batch dims and jit/vmap friendly; the
boolean-masking of invalid log-depths is expressed with `where` instead of
in-place writes.
"""

from __future__ import annotations

import jax.numpy as jnp


def point_to_dist(X: jnp.ndarray) -> jnp.ndarray:
    """Euclidean norm along the last axis, kept-dim (geometry.py:12-14)."""
    return jnp.linalg.norm(X, axis=-1, keepdims=True)


def point_to_ray_dist(X: jnp.ndarray, jacobian: bool = False):
    """Point → [ray(3), dist(1)] with optional 4x3 Jacobian.

    Spec: geometry.py:17-34. dr/dX = (I − r rᵀ)/d, dd/dX = rᵀ.
    """
    d = point_to_dist(X)
    d_inv = 1.0 / d
    r = d_inv * X
    rd = jnp.concatenate([r, d], axis=-1)
    if not jacobian:
        return rd
    batch = X.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), batch + (3, 3))
    outer = X[..., :, None] * X[..., None, :]
    dr_dX = d_inv[..., None] * (eye - (d_inv**2)[..., None] * outer)
    dd_dX = r[..., None, :]
    drd_dX = jnp.concatenate([dr_dX, dd_dX], axis=-2)
    return rd, drd_dX


def decompose_K(K: jnp.ndarray):
    return K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]


def project_calib(
    P: jnp.ndarray,
    K: jnp.ndarray,
    img_size,
    jacobian: bool = False,
    border: float = 0.0,
    z_eps: float = 0.0,
):
    """Pinhole projection → [u, v, log z] + validity (+ 3x3 Jacobian).

    Spec: geometry.py:63-104. img_size is (H, W).
    """
    h, w = img_size
    fx, fy, cx, cy = decompose_K(K)
    x = P[..., 0]
    y = P[..., 1]
    z = P[..., 2]
    z_safe = jnp.where(z > z_eps, z, 1.0)
    u = fx * x / z_safe + cx
    v = fy * y / z_safe + cy

    valid_u = (u > border) & (u < w - 1 - border)
    valid_v = (v > border) & (v < h - 1 - border)
    valid_z = z > z_eps
    valid = (valid_u & valid_v & valid_z)[..., None]

    logz = jnp.where(valid_z, jnp.log(z_safe), 0.0)
    pz = jnp.stack([u, v, logz], axis=-1)

    if not jacobian:
        return pz, valid

    z_inv = 1.0 / z_safe
    zero = jnp.zeros_like(z_inv)
    # rows: du/dP, dv/dP, dlogz/dP  (geometry.py:95-103)
    J = jnp.stack(
        [
            jnp.stack([fx * z_inv, zero, -fx * x * z_inv * z_inv], axis=-1),
            jnp.stack([zero, fy * z_inv, -fy * y * z_inv * z_inv], axis=-1),
            jnp.stack([zero, zero, z_inv], axis=-1),
        ],
        axis=-2,
    )
    return pz, J, valid


def backproject(p: jnp.ndarray, z: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel + depth → camera-space point (spec: geometry.py:107-115)."""
    tmp1 = (p[..., 0] - K[0, 2]) / K[0, 0]
    tmp2 = (p[..., 1] - K[1, 2]) / K[1, 1]
    dirs = jnp.stack([tmp1, tmp2, jnp.ones_like(tmp1)], axis=-1)
    return z * dirs


def get_pixel_coords(b: int, img_size, dtype=jnp.float32) -> jnp.ndarray:
    """(b, h, w, 2) pixel grid in (u, v) order (spec: geometry.py:118-123)."""
    h, w = img_size
    u, v = jnp.meshgrid(jnp.arange(w, dtype=dtype), jnp.arange(h, dtype=dtype),
                        indexing="xy")
    uv = jnp.stack([u, v], axis=-1)[None]
    return jnp.broadcast_to(uv, (b, h, w, 2))


def constrain_points_to_ray(img_size, Xs: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Snap points to their pixel rays, keeping depth (spec: geometry.py:37-42).

    Xs: (b, h*w, 3) or (b, h, w, 3)-flattened consistent with the pixel grid.
    """
    b = Xs.shape[0]
    uv = get_pixel_coords(b, img_size, dtype=Xs.dtype).reshape(Xs.shape[:-1] + (2,))
    return backproject(uv, Xs[..., 2:3], K)
