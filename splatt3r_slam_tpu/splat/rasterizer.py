"""Tile-binned 3D Gaussian splatting rasterizer (forward, TPU-native).

Replaces the reference's `diff-gaussian-rasterization-modified` CUDA
submodule (call sites: `splatt3r_core/src/pixelsplat_src/cuda_splatting.py:
100-128`, `splatt3r_slam/visualization.py:563-594`): project → EWA 2D
covariance → tile binning → per-tile front-to-back alpha compositing,
with precomputed 3x3 covariance (6 upper-tri floats) and deg-0 SH colors,
forward-only (the SLAM runtime never backprops through it,
`splatt3r_utils.py:331`).

TPU-native formulation (no dynamic shapes, no atomics):
1. one global depth argsort puts all gaussians front-to-back;
2. each gaussian emits ≤ TPG tile keys (covered-tile cap) — a stable sort
   by tile id then yields per-tile, depth-ordered contiguous segments;
3. per-tile segments are gathered into a (tiles, K_MAX) index matrix and
   composited with an exclusive cumulative product over the depth axis —
   cumprod replaces the CUDA kernel's sequential transmittance loop, and
   the alpha/weight evaluation is dense VPU math over (tiles, K, 256)
   blocks, chunked to bound VMEM/HBM traffic.

Approximations vs CUDA (documented): per-gaussian tile coverage is capped
at TPG tiles (very large splats are cropped) and per-tile depth lists at
K_MAX entries (farthest splats dropped on overflow) — both are static-
shape analogues of caps real-time 3DGS implementations already employ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from splatt3r_slam_tpu.splat.gaussians import triu_to_cov

TILE = 16


def project_gaussians(means, cov_triu, opa, view, K, hw, near=0.01,
                      blur=0.3):
    """World gaussians → screen-space (means2d, conic, depth, radius, ok).

    view: (4,4) world→camera; K: (3,3) pixel intrinsics.
    """
    H, W = hw
    means, cov_triu, opa, view, K = (
        jnp.asarray(a, jnp.float32) for a in (means, cov_triu, opa, view, K)
    )
    R = view[:3, :3]
    t = view[:3, 3]
    Xc = means @ R.T + t
    z = Xc[:, 2]
    ok = (z > near) & (opa > 1.0 / 255.0)
    z_s = jnp.where(ok, z, 1.0)

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = fx * Xc[:, 0] / z_s + cx
    v = fy * Xc[:, 1] / z_s + cy
    means2d = jnp.stack([u, v], axis=-1)

    cov = triu_to_cov(cov_triu)
    cov_c = jnp.einsum("ij,njk,lk->nil", R, cov, R)
    x_, y_ = Xc[:, 0], Xc[:, 1]
    zi = 1.0 / z_s
    J = jnp.stack(
        [
            jnp.stack([fx * zi, jnp.zeros_like(zi), -fx * x_ * zi * zi], -1),
            jnp.stack([jnp.zeros_like(zi), fy * zi, -fy * y_ * zi * zi], -1),
        ],
        axis=-2,
    )  # (G, 2, 3)
    cov2d = jnp.einsum("nij,njk,nlk->nil", J, cov_c, J)
    cov2d = cov2d + blur * jnp.eye(2)

    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] ** 2
    det_s = jnp.where(det > 1e-12, det, 1.0)
    ok = ok & (det > 1e-12)
    conic = jnp.stack(
        [cov2d[:, 1, 1] / det_s, -cov2d[:, 0, 1] / det_s,
         cov2d[:, 0, 0] / det_s],
        axis=-1,
    )
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    inside = (u + radius > 0) & (u - radius < W) & (v + radius > 0) & (
        v - radius < H
    )
    ok = ok & inside
    return means2d, conic, z, radius, ok


@functools.partial(
    jax.jit,
    static_argnames=("hw", "tpg_side", "k_max", "tile_chunk"),
)
def render_tiles(
    means,  # (G, 3) world
    cov_triu,  # (G, 6)
    colors,  # (G, 3)
    opa,  # (G,)
    view,  # (4, 4) world→camera
    K,  # (3, 3) pixel intrinsics
    hw,  # static (H, W), multiples of 16
    bg=None,  # (3,) background
    tpg_side: int = 4,
    k_max: int = 512,
    tile_chunk: int = 32,
):
    """Render (H, W, 3) image. H, W must be multiples of TILE=16."""
    H, W = hw
    assert H % TILE == 0 and W % TILE == 0
    TX, TY = W // TILE, H // TILE
    T = TX * TY
    G = means.shape[0]
    if bg is None:
        bg = jnp.zeros(3)

    means2d, conic, depth, radius, ok = project_gaussians(
        means, cov_triu, opa, view, K, hw
    )

    # ---- global front-to-back order --------------------------------------
    order = jnp.argsort(jnp.where(ok, depth, jnp.inf))
    means2d = means2d[order]
    conic = conic[order]
    colors_s = colors[order]
    opa_s = opa[order]
    ok_s = ok[order]
    radius_s = radius[order]

    # ---- tile key emission (≤ tpg_side² tiles per gaussian) --------------
    tx0 = jnp.clip(((means2d[:, 0] - radius_s) // TILE).astype(jnp.int32),
                   0, TX - 1)
    tx1 = jnp.clip(((means2d[:, 0] + radius_s) // TILE).astype(jnp.int32),
                   0, TX - 1)
    ty0 = jnp.clip(((means2d[:, 1] - radius_s) // TILE).astype(jnp.int32),
                   0, TY - 1)
    ty1 = jnp.clip(((means2d[:, 1] + radius_s) // TILE).astype(jnp.int32),
                   0, TY - 1)

    dxy = jnp.stack(
        jnp.meshgrid(jnp.arange(tpg_side), jnp.arange(tpg_side),
                     indexing="xy"),
        axis=-1,
    ).reshape(-1, 2)  # (TPG, 2)
    tx = tx0[:, None] + dxy[None, :, 0]  # (G, TPG)
    ty = ty0[:, None] + dxy[None, :, 1]
    key_ok = (tx <= tx1[:, None]) & (ty <= ty1[:, None]) & ok_s[:, None]
    tile_id = jnp.where(key_ok, ty * TX + tx, T)  # sentinel T = invalid

    # stable sort by tile id keeps the global depth order within each tile
    flat_tile = tile_id.reshape(-1)
    flat_g = jnp.broadcast_to(
        jnp.arange(G, dtype=jnp.int32)[:, None], tile_id.shape
    ).reshape(-1)
    sort_idx = jnp.argsort(flat_tile, stable=True)
    sorted_tile = flat_tile[sort_idx]
    sorted_g = flat_g[sort_idx]

    # per-tile segment boundaries
    starts = jnp.searchsorted(sorted_tile, jnp.arange(T), side="left")
    ends = jnp.searchsorted(sorted_tile, jnp.arange(T), side="right")

    # (T, K_MAX) per-tile gaussian indices (depth-ordered, padded)
    pos = starts[:, None] + jnp.arange(k_max)[None, :]
    valid_k = pos < ends[:, None]
    pos = jnp.clip(pos, 0, sorted_g.shape[0] - 1)
    gidx = sorted_g[pos]  # (T, K_MAX)

    # ---- per-tile compositing (chunked over tiles) ------------------------
    px = jnp.arange(TILE, dtype=jnp.float32)
    pxx, pyy = jnp.meshgrid(px, px, indexing="xy")
    pix_local = jnp.stack([pxx, pyy], -1).reshape(-1, 2) + 0.5  # (256, 2)
    tile_origin = jnp.stack(
        [(jnp.arange(T) % TX) * TILE, (jnp.arange(T) // TX) * TILE], axis=-1
    ).astype(jnp.float32)  # (T, 2)

    def tile_block(args):
        gi, vk, orig = args  # (C, K), (C, K), (C, 2)
        m2 = means2d[gi]  # (C, K, 2)
        cn = conic[gi]  # (C, K, 3)
        cl = colors_s[gi]  # (C, K, 3)
        op = opa_s[gi]  # (C, K)
        pix = orig[:, None, :] + pix_local[None, :, :]  # (C, 256, 2)
        d = pix[:, None, :, :] - m2[:, :, None, :]  # (C, K, 256, 2)
        power = -0.5 * (
            cn[:, :, None, 0] * d[..., 0] ** 2
            + cn[:, :, None, 2] * d[..., 1] ** 2
        ) - cn[:, :, None, 1] * d[..., 0] * d[..., 1]
        alpha = jnp.minimum(0.99, op[:, :, None] * jnp.exp(power))
        alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
        alpha = alpha * vk[:, :, None]
        # exclusive transmittance along the depth axis
        one_m = 1.0 - alpha
        trans_incl = jnp.cumprod(one_m, axis=1)
        trans_excl = trans_incl / one_m  # safe: one_m ≥ 0.01
        w = alpha * trans_excl  # (C, K, 256)
        rgb = jnp.einsum("ckp,ckd->cpd", w, cl)
        t_final = trans_incl[:, -1, :]  # (C, 256)
        rgb = rgb + t_final[..., None] * bg[None, None, :]
        return rgb  # (C, 256, 3)

    nchunk = -(-T // tile_chunk)
    Tpad = nchunk * tile_chunk
    pad = Tpad - T

    def padT(a, fill=0):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    gi_c = padT(gidx).reshape(nchunk, tile_chunk, k_max)
    vk_c = padT(valid_k.astype(jnp.float32)).reshape(nchunk, tile_chunk,
                                                     k_max)
    or_c = padT(tile_origin).reshape(nchunk, tile_chunk, 2)

    rgb = jax.lax.map(tile_block, (gi_c, vk_c, or_c))
    rgb = rgb.reshape(Tpad, TILE, TILE, 3)[:T]
    img = rgb.reshape(TY, TX, TILE, TILE, 3).transpose(0, 2, 1, 3, 4)
    return img.reshape(H, W, 3)


def render_bruteforce(means, cov_triu, colors, opa, view, K, hw, bg=None):
    """O(G·P) reference renderer (tests/small scenes only): exact global
    depth-sorted alpha compositing over every pixel."""
    H, W = hw
    if bg is None:
        bg = jnp.zeros(3)
    means2d, conic, depth, radius, ok = project_gaussians(
        means, cov_triu, opa, view, K, hw
    )
    order = jnp.argsort(jnp.where(ok, depth, jnp.inf))
    means2d, conic = means2d[order], conic[order]
    colors, opa, ok = colors[order], opa[order], ok[order]

    xx, yy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32), indexing="xy")
    pix = jnp.stack([xx, yy], -1).reshape(-1, 2) + 0.5  # (P, 2)

    d = pix[None, :, :] - means2d[:, None, :]  # (G, P, 2)
    power = -0.5 * (
        conic[:, None, 0] * d[..., 0] ** 2 + conic[:, None, 2] * d[..., 1] ** 2
    ) - conic[:, None, 1] * d[..., 0] * d[..., 1]
    alpha = jnp.minimum(0.99, opa[:, None] * jnp.exp(power))
    alpha = jnp.where(alpha < 1.0 / 255.0, 0.0, alpha)
    alpha = alpha * ok[:, None]
    one_m = 1.0 - alpha
    trans_incl = jnp.cumprod(one_m, axis=0)
    trans_excl = trans_incl / one_m
    w = alpha * trans_excl  # (G, P)
    rgb = jnp.einsum("gp,gc->pc", w, colors)
    rgb = rgb + trans_incl[-1][:, None] * bg[None, :]
    return rgb.reshape(H, W, 3)
