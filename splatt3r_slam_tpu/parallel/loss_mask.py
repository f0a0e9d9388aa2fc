"""Training loss masks: target-pixel visibility in context frustums.

Parity: `splatt3r_core/utils/loss_mask.py:8-92` — for each target view,
mask pixels whose unprojected 3D point falls inside at least one context
view's frustum (in front of the camera and projecting inside the image),
so the photometric loss ignores never-seen regions.
"""

from __future__ import annotations

import jax.numpy as jnp


def unproject(depth, K, T_WC):
    """depth (H, W), K (3,3), T_WC (4,4) cam→world → world points (H,W,3)."""
    H, W = depth.shape
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32) + 0.5,
                        jnp.arange(H, dtype=jnp.float32) + 0.5,
                        indexing="xy")
    x = (u - K[0, 2]) / K[0, 0] * depth
    y = (v - K[1, 2]) / K[1, 1] * depth
    Pc = jnp.stack([x, y, depth], axis=-1)
    return Pc @ T_WC[:3, :3].T + T_WC[:3, 3]


def in_frustum_mask(points_w, K, T_WC, hw, z_eps=1e-6):
    """points (..., 3) world; True where visible in the camera."""
    H, W = hw
    T_CW_R = T_WC[:3, :3].T
    t = T_WC[:3, 3]
    Pc = (points_w - t) @ T_CW_R.T
    z = Pc[..., 2]
    z_s = jnp.where(z > z_eps, z, 1.0)
    u = K[0, 0] * Pc[..., 0] / z_s + K[0, 2]
    v = K[1, 1] * Pc[..., 1] / z_s + K[1, 2]
    return (z > z_eps) & (u >= 0) & (u < W) & (v >= 0) & (v < H)


def calculate_loss_mask(target_depth, target_K, target_T_WC,
                        context_Ks, context_T_WCs, hw):
    """(H, W) bool — target pixels visible in ≥1 context view.

    target_depth (H, W); context_Ks (V, 3, 3); context_T_WCs (V, 4, 4).
    """
    pts = unproject(target_depth, target_K, target_T_WC)
    masks = []
    for v in range(context_T_WCs.shape[0]):
        masks.append(in_frustum_mask(pts, context_Ks[v], context_T_WCs[v],
                                     hw))
    m = jnp.stack(masks).any(axis=0)
    return m & (target_depth > 0)
