"""Gaussian-splat math utilities + camera→world conversion.

Spec:
- covariance Σ = R S Sᵀ Rᵀ from scale + xyzw quaternion
  (`splatt3r_core/utils/geometry.py:24-63`);
- SH basis constants / RGB↔SH (`splatt3r_core/utils/sh_utils.py`);
- `gaussians_to_world` filtering + world transform
  (`splatt3r_slam/splatt3r_utils.py:180-328`): depth window with an
  adaptive percentile upper bound, max-scale and confidence gates, SH
  residual + C0 color, [sR|t] world transform of means and covariances.

TPU adaptation: filters never compact — invalid gaussians get opacity 0
(static shapes; the rasterizer and the pool treat them as absent), and
the spatial stride is a static slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from splatt3r_slam_tpu.lie import sim3

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def RGB2SH(rgb):
    return (rgb - 0.5) / C0


def SH2RGB(sh):
    return sh * C0 + 0.5


def eval_sh(deg: int, sh, dirs):
    """Evaluate real SH up to degree 3 (sh_utils.py eval_sh semantics).

    sh: (..., C, (deg+1)²); dirs: (..., 3) unit directions.
    """
    result = C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (result - C1 * y * sh[..., 1] + C1 * z * sh[..., 2]
                  - C1 * x * sh[..., 3])
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + C2[0] * xy * sh[..., 4]
                      + C2[1] * yz * sh[..., 5]
                      + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                      + C2[3] * xz * sh[..., 7]
                      + C2[4] * (xx - yy) * sh[..., 8])
            if deg > 2:
                result = (result
                          + C3[0] * y * (3 * xx - yy) * sh[..., 9]
                          + C3[1] * xy * z * sh[..., 10]
                          + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                          + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                          + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                          + C3[5] * z * (xx - yy) * sh[..., 14]
                          + C3[6] * x * (xx - 3 * yy) * sh[..., 15])
    return result


def build_covariance(scale, rotation_xyzw):
    """Σ = R diag(s²) Rᵀ (spec: utils/geometry.py:52-63)."""
    R = sim3.quat_to_matrix(rotation_xyzw)
    s2 = scale * scale
    return jnp.einsum("...ij,...j,...kj->...ik", R, s2, R)


_TRIU_R = (0, 0, 0, 1, 1, 2)
_TRIU_C = (0, 1, 2, 1, 2, 2)


def cov_to_triu(cov):
    """(..., 3, 3) → (..., 6) upper-triangular [xx xy xz yy yz zz]."""
    return jnp.stack([cov[..., r, c] for r, c in zip(_TRIU_R, _TRIU_C)],
                     axis=-1)


def triu_to_cov(t):
    xx, xy, xz, yy, yz, zz = jnp.split(t, 6, axis=-1)
    rows = jnp.concatenate([xx, xy, xz, xy, yy, yz, xz, yz, zz], axis=-1)
    return rows.reshape(t.shape[:-1] + (3, 3))


@functools.partial(
    jax.jit,
    static_argnames=("spatial_stride", "depth_min", "depth_max_percentile",
                     "max_scale", "min_confidence"),
)
def gaussians_to_world_masked(
    means,  # (h, w, 3) camera-space
    scales,  # (h, w, 3)
    rotations,  # (h, w, 4)
    sh,  # (h, w, 3, d)
    opacities,  # (h, w, 1)
    conf,  # (h, w)
    img,  # (h, w, 3) in [0,1] — SH residual source
    T_WC,  # (8,) Sim3
    spatial_stride: int = 1,
    depth_min: float = 0.05,
    depth_max_percentile: float = 0.98,
    max_scale: float = 0.5,
    min_confidence: float = 1.5,
):
    """Filter + world-transform one view's gaussians (fixed-size output).

    Returns (means_w (G,3), cov_triu (G,6), colors (G,3), opa (G,)) with
    G = (h/s)·(w/s); filtered-out gaussians have opacity 0.
    """
    s = spatial_stride
    means = means[::s, ::s].reshape(-1, 3)
    scales = scales[::s, ::s].reshape(-1, 3)
    rotations = rotations[::s, ::s].reshape(-1, 4)
    sh0 = sh[::s, ::s, :, 0].reshape(-1, 3)
    opa = opacities[::s, ::s].reshape(-1)
    conf = conf[::s, ::s].reshape(-1)
    img = img[::s, ::s].reshape(-1, 3)

    z = means[:, 2]
    valid = z > depth_min
    if depth_max_percentile < 1.0:
        # adaptive upper bound: percentile of valid depths
        z_for_q = jnp.where(valid, z, jnp.nan)
        z_upper = jnp.nanpercentile(z_for_q, depth_max_percentile * 100.0)
        z_upper = jnp.where(jnp.isnan(z_upper), jnp.inf, z_upper)
        valid = valid & (z <= z_upper)
    valid = valid & (scales.max(axis=-1) < max_scale)
    if min_confidence > 0:
        valid = valid & (conf >= min_confidence)

    M = sim3.matrix(T_WC)  # [sR | t]
    R = M[:3, :3]
    t = M[:3, 3]
    means_w = means @ R.T + t
    cov = build_covariance(scales, rotations)
    cov_w = jnp.einsum("ij,njk,lk->nil", R, cov, R)
    cov_triu = cov_to_triu(cov_w)

    # full SH = residual + RGB2SH(img); color = SH2RGB(sh0)
    colors = jnp.clip(SH2RGB(sh0 + RGB2SH(img)), 0.0, 1.0)
    opa = jnp.where(valid, opa, 0.0)
    return means_w, cov_triu, colors, opa


class GaussianAccumulator:
    """Frame → world-space gaussian chunks for the pool.

    Mirrors the reference `gaussians_to_world` call sites (main.py:457-489):
    converts the self-prediction stored on the frame (the reference
    passes include_cross=False at both SLAM append sites,
    main.py:417/471; include_cross=True adds the cross view).
    """

    def __init__(self, spatial_stride: int = 4, depth_min: float = 0.05,
                 depth_max_percentile: float = 0.98, max_scale: float = 0.5,
                 min_confidence: float = 1.5, include_cross: bool = False):
        self.kw = dict(
            spatial_stride=spatial_stride,
            depth_min=depth_min,
            depth_max_percentile=depth_max_percentile,
            max_scale=max_scale,
            min_confidence=min_confidence,
        )
        self.include_cross = include_cross

    def gaussians_to_world(self, frame):
        """Returns (means, cov_triu, colors, opacities) as ONE device
        dispatch — every eager op on this per-append path costs a
        dispatch round-trip on a remote-TPU platform."""
        if frame.gaussian_pred is None:
            return None
        preds = [frame.gaussian_pred]
        if self.include_cross and frame.gaussian_pred_cross is not None:
            preds.append(frame.gaussian_pred_cross)
        return _gaussians_to_world_jit(
            tuple(
                (p["means"][0], p["scales"][0], p["rotations"][0],
                 p["sh"][0], p["opacities"][0], p["conf"][0])
                for p in preds
            ),
            frame.img, frame.T_WC,
            tuple(sorted(self.kw.items())),
        )


@functools.partial(jax.jit, static_argnames=("kw_items",))
def _gaussians_to_world_jit(preds, img_norm, T_WC, kw_items):
    kw = dict(kw_items)
    img = jnp.clip(img_norm[0] * 0.5 + 0.5, 0.0, 1.0)  # ImgNorm inverse
    outs = [
        gaussians_to_world_masked(m, s, r, sh, o, c, img, T_WC, **kw)
        for (m, s, r, sh, o, c) in preds
    ]
    return tuple(
        jnp.concatenate([o[k] for o in outs]) for k in range(4)
    )


@functools.partial(jax.jit, static_argnames=("stride", "flatten"))
def pointmap_to_surfels(X_grid, color_grid, T_WC, stride: int = 4,
                        flatten: float = 0.1):
    """Oriented surfel gaussians from a keyframe pointmap grid.

    Viewer parity for the reference's GLSL surfel pointmap mode
    (`splatt3r_slam/visualization.py:602-624`,
    `resources/programs/surfels.glsl`, which orients a camera-facing
    disc by the local surface normal per point): each (strided)
    pointmap sample becomes a disc Σ = r²(I − nnᵀ) + (flatten·r)²nnᵀ
    with the normal from the grid-tangent cross product and radius
    matched to the local sample spacing, so neighboring discs just
    overlap. Rendered by the SAME device rasterizer as the GS path —
    no GL needed.

    X_grid: (H, W, 3) camera-frame pointmap; color_grid: (H, W, 3) in
    [0, 1]; T_WC: (8,) Sim3. Returns (means_w (G,3), cov_triu (G,6),
    colors (G,3), opa (G,)).
    """
    Xp = jnp.pad(X_grid, ((1, 1), (1, 1), (0, 0)), mode="edge")
    du = (Xp[1:-1, 2:] - Xp[1:-1, :-2]) * 0.5  # ∂X/∂u (per pixel)
    dv = (Xp[2:, 1:-1] - Xp[:-2, 1:-1]) * 0.5
    s = int(stride)
    o = s // 2
    X = X_grid[o::s, o::s].reshape(-1, 3)
    du = du[o::s, o::s].reshape(-1, 3) * s  # per-sample spacing
    dv = dv[o::s, o::s].reshape(-1, 3) * s
    col = color_grid[o::s, o::s].reshape(-1, 3)
    n = jnp.cross(du, dv)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    r = 0.6 * jnp.maximum(jnp.linalg.norm(du, axis=-1),
                          jnp.linalg.norm(dv, axis=-1))[:, None]
    nnT = n[:, :, None] * n[:, None, :]
    eye = jnp.eye(3, dtype=X.dtype)[None]
    cov = (r[..., None] ** 2) * (eye - nnT) \
        + ((flatten * r)[..., None] ** 2) * nnT
    # world transform [sR|t]: means = sR·X + t, Σw = (sR) Σ (sR)ᵀ
    t, q, sc = sim3.split(T_WC)
    R = sim3.quat_to_matrix(q) * sc[..., None]
    means_w = X @ R.T + t
    cov_w = jnp.einsum("ij,njk,lk->nil", R, cov, R)
    opa = jnp.full((X.shape[0],), 0.95, X.dtype)
    return means_w, cov_to_triu(cov_w), col, opa
