"""Tile-binned 3D Gaussian splatting rasterizer (forward, TPU-native).

Replaces the reference's `diff-gaussian-rasterization-modified` CUDA
submodule (call sites: `splatt3r_core/src/pixelsplat_src/cuda_splatting.py:
100-128`, `splatt3r_slam/visualization.py:563-594`): project → EWA 2D
covariance → tile binning → per-tile front-to-back alpha compositing,
with precomputed 3x3 covariance (6 upper-tri floats) and deg-0 SH colors,
forward-only (the SLAM runtime never backprops through it,
`splatt3r_utils.py:331`).

TPU-native formulation (no dynamic shapes, no atomics):
1. each gaussian emits ≤ TPG combined int32 keys `tile_id << 18 |
   depth_quantized` (the CUDA rasterizer's tile|depth key, which is also
   the right shape for TPU: ONE `lax.sort` with the gaussian index as
   payload replaces depth-argsort + per-array reorder gathers that cost
   ~85 ms per 6.4M rows);
2. per-tile segment bounds come from an explicit log-step binary search
   (`_searchsorted_bin`), and a (tiles, K_MAX) index matrix gathers
   packed 9-float attribute rows straight from the original arrays;
3. compositing is an exclusive cumulative product over the depth axis —
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
import numpy as np

TILE = 16


def default_rasterizer() -> str:
    """Production compositor choice: 'pallas' on TPU (wins at every
    production gaussian count — 28/58/292 ms vs XLA's 39/63/303 ms at
    0.4/1/4M, logs/bench_rasterizer_tpu_v5e.json), 'xla' elsewhere
    (Mosaic kernels need a TPU; CPU tests/dryruns use the XLA
    compositor). The Pallas compositor is differentiable (custom VJP,
    `pallas_rasterizer._composite`), so training's render loss also
    runs it on TPU."""
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def project_gaussians(means, cov_triu, opa, view, K, hw, near=0.01,
                      blur=0.3):
    """World gaussians → screen-space (means2d, conic, depth, radius, ok).

    view: (4,4) world→camera; K: (3,3) pixel intrinsics.

    All per-gaussian 3x3/2x2 algebra is written as explicit component
    arithmetic over (G,) vectors — batched tiny einsums lower to
    MXU-hostile shapes and measured 19 ms at G=400k vs ~2 ms elementwise.
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

    # world cov components (upper-tri): [xx, xy, xz, yy, yz, zz]
    cxx, cxy, cxz = cov_triu[:, 0], cov_triu[:, 1], cov_triu[:, 2]
    cyy, cyz, czz = cov_triu[:, 3], cov_triu[:, 4], cov_triu[:, 5]

    def rowmul(a, b, c):
        """(a b c)·C → components of a row of R·C."""
        return (
            a * cxx + b * cxy + c * cxz,
            a * cxy + b * cyy + c * cyz,
            a * cxz + b * cyz + c * czz,
        )

    # JR = J @ R, rows j0 (for u) and j1 (for v); J is the projective
    # Jacobian [[fx/z, 0, -fx·x/z²], [0, fy/z, -fy·y/z²]]
    zi = 1.0 / z_s
    a0 = fx * zi
    c0 = -fx * Xc[:, 0] * zi * zi
    b1 = fy * zi
    c1 = -fy * Xc[:, 1] * zi * zi
    # j0 = a0·R[0] + c0·R[2];  j1 = b1·R[1] + c1·R[2]   (each (G, 3))
    j0x = a0 * R[0, 0] + c0 * R[2, 0]
    j0y = a0 * R[0, 1] + c0 * R[2, 1]
    j0z = a0 * R[0, 2] + c0 * R[2, 2]
    j1x = b1 * R[1, 0] + c1 * R[2, 0]
    j1y = b1 * R[1, 1] + c1 * R[2, 1]
    j1z = b1 * R[1, 2] + c1 * R[2, 2]
    # cov2d = (JR) C (JR)ᵀ, 2x2 symmetric
    w0x, w0y, w0z = rowmul(j0x, j0y, j0z)  # (JR C) row 0
    w1x, w1y, w1z = rowmul(j1x, j1y, j1z)
    s00 = w0x * j0x + w0y * j0y + w0z * j0z + blur
    s01 = w0x * j1x + w0y * j1y + w0z * j1z
    s11 = w1x * j1x + w1y * j1y + w1z * j1z + blur

    det = s00 * s11 - s01 * s01
    det_s = jnp.where(det > 1e-12, det, 1.0)
    ok = ok & (det > 1e-12)
    conic = jnp.stack([s11 / det_s, -s01 / det_s, s00 / det_s], axis=-1)
    mid = 0.5 * (s00 + s11)
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    inside = (u + radius > 0) & (u - radius < W) & (v + radius > 0) & (
        v - radius < H
    )
    ok = ok & inside
    return means2d, conic, z, radius, ok


def _searchsorted_bin(sorted_arr, queries, n_iter):
    """Vectorized left binary search (XLA's jnp.searchsorted lowers to a
    scan over the full array here — measured 49 ms for 768 queries over
    6.4M keys; this explicit log-step search is ~23 tiny gathers)."""
    n = sorted_arr.shape[0]
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, n, jnp.int32)
    for _ in range(n_iter):
        mid = (lo + hi) // 2
        go_right = sorted_arr[jnp.clip(mid, 0, n - 1)] < queries
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def bin_tiles(means2d, depth, radius, ok, hw, tpg_side, k_max):
    """Tile binning shared by the XLA and Pallas compositors.

    One combined (tile_id << 18 | depth_q) int32 key per (gaussian, tile
    slot), ONE `lax.sort` with the gaussian index as payload, per-tile
    segment bounds via explicit binary search, and per-tile depth-ordered
    index lists capped at k_max.

    Returns (gidx (T, k_max) int32, valid_k (T, k_max) bool,
    counts (T,) int32). Strategy kept from the CUDA rasterizer because it
    is also right for TPU: argsort + per-array reorder gathers cost
    ~85 ms per 6.4M-row gather; the capped (T·k_max)-row gather the
    consumer performs instead is bounded by the image size, not G·TPG.
    """
    H, W = hw
    TX, TY = W // TILE, H // TILE
    T = TX * TY
    G = means2d.shape[0]

    DBITS = 18
    dmax = jnp.max(jnp.where(ok, depth, 0.0))
    dmin = jnp.min(jnp.where(ok, depth, jnp.inf))
    dspan = jnp.maximum(dmax - dmin, 1e-9)
    depth_q = jnp.clip(
        ((depth - dmin) / dspan * ((1 << DBITS) - 1)).astype(jnp.int32),
        0, (1 << DBITS) - 1,
    )

    u_, v_ = means2d[:, 0], means2d[:, 1]
    tx0 = jnp.clip(((u_ - radius) // TILE).astype(jnp.int32), 0, TX - 1)
    tx1 = jnp.clip(((u_ + radius) // TILE).astype(jnp.int32), 0, TX - 1)
    ty0 = jnp.clip(((v_ - radius) // TILE).astype(jnp.int32), 0, TY - 1)
    ty1 = jnp.clip(((v_ + radius) // TILE).astype(jnp.int32), 0, TY - 1)

    dxy = jnp.stack(
        jnp.meshgrid(jnp.arange(tpg_side), jnp.arange(tpg_side),
                     indexing="xy"),
        axis=-1,
    ).reshape(-1, 2)  # (TPG, 2)
    tx = tx0[:, None] + dxy[None, :, 0]  # (G, TPG)
    ty = ty0[:, None] + dxy[None, :, 1]
    key_ok = (tx <= tx1[:, None]) & (ty <= ty1[:, None]) & ok[:, None]
    tile_id = jnp.where(key_ok, ty * TX + tx, T)  # sentinel T = invalid

    flat_g = jnp.broadcast_to(
        jnp.arange(G, dtype=jnp.int32)[:, None], tile_id.shape
    ).reshape(-1)
    if (T + 1) < (1 << (31 - DBITS)):
        # fused (tile_id << DBITS | depth_q) int32 key: one single-key sort
        key = (tile_id << DBITS) | depth_q[:, None]  # (G, TPG) int32
        flat_key = key.reshape(-1)
        sorted_key, sorted_g = jax.lax.sort((flat_key, flat_g), num_keys=1)
        tile_probe = jnp.arange(T + 1, dtype=jnp.int32) << DBITS
    else:
        # ≥ 2^13 tiles (≳2.1 MP at TILE=16): the shifted tile id would
        # overflow int32, so sort on (tile, depth) as two operands
        sorted_key, _, sorted_g = jax.lax.sort(
            (tile_id.reshape(-1),
             jnp.broadcast_to(depth_q[:, None], tile_id.shape).reshape(-1),
             flat_g),
            num_keys=2,
        )
        tile_probe = jnp.arange(T + 1, dtype=jnp.int32)

    P = sorted_key.shape[0]
    n_iter = max(1, int(np.ceil(np.log2(P + 1))))
    bounds = _searchsorted_bin(sorted_key, tile_probe, n_iter)
    starts, ends = bounds[:T], bounds[1:]

    pos = starts[:, None] + jnp.arange(k_max)[None, :]
    valid_k = pos < ends[:, None]
    pos = jnp.clip(pos, 0, sorted_g.shape[0] - 1)
    gidx = sorted_g[pos]  # (T, k_max) depth-ordered, padded
    counts = jnp.minimum(ends - starts, k_max).astype(jnp.int32)
    return gidx, valid_k, counts


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

    # ---- binning: combined (tile | depth) keys, ONE payload sort ---------
    gidx, valid_k, _counts = bin_tiles(
        means2d, depth, radius, ok, hw, tpg_side, k_max
    )

    attrs_s = jnp.concatenate(
        [means2d, conic, colors, opa[:, None]], axis=-1
    )  # (G, 9): u v ca cb cc r g b opa — original order, gathered by gidx

    # ---- per-tile compositing (chunked over tiles) ------------------------
    px = jnp.arange(TILE, dtype=jnp.float32)
    pxx, pyy = jnp.meshgrid(px, px, indexing="xy")
    pix_local = jnp.stack([pxx, pyy], -1).reshape(-1, 2) + 0.5  # (256, 2)
    tile_origin = jnp.stack(
        [(jnp.arange(T) % TX) * TILE, (jnp.arange(T) // TX) * TILE], axis=-1
    ).astype(jnp.float32)  # (T, 2)

    def tile_block(args):
        gi, vk, orig = args  # (C, K), (C, K), (C, 2)
        rows = attrs_s[gi]  # (C, K, 9) — single packed gather
        m2 = rows[..., 0:2]  # (C, K, 2)
        cn = rows[..., 2:5]  # (C, K, 3)
        cl = rows[..., 5:8]  # (C, K, 3)
        op = rows[..., 8]  # (C, K)
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


@functools.partial(jax.jit, static_argnames=("hw", "g_chunk"))
def render_bruteforce_scan(means, cov_triu, colors, opa, view, K, hw,
                           bg=None, g_chunk: int = 2048):
    """Exact compositing oracle at scale: identical math to
    `render_bruteforce` (global depth sort, every gaussian against every
    pixel — no k_max cap, no tile-coverage crop) but scanned over
    depth-ordered gaussian chunks so memory is O(g_chunk · P) instead of
    O(G · P). Used by the fidelity sweep
    (`scripts/sweep_rasterizer_fidelity.py`)."""
    H, W = hw
    P = H * W
    if bg is None:
        bg = jnp.zeros(3)
    means2d, conic, depth, radius, ok = project_gaussians(
        means, cov_triu, opa, view, K, hw
    )
    order = jnp.argsort(jnp.where(ok, depth, jnp.inf))
    G = means.shape[0]
    Gpad = -(-G // g_chunk) * g_chunk
    pad = Gpad - G

    def padg(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    att = jnp.concatenate(
        [means2d[order], conic[order], jnp.asarray(colors)[order],
         jnp.where(ok, jnp.asarray(opa, jnp.float32), 0.0)[order][:, None]],
        axis=-1,
    )  # (G, 9): u v ca cb cc r g b opa
    att = padg(att).reshape(Gpad // g_chunk, g_chunk, 9)

    xx, yy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32), indexing="xy")
    pix = jnp.stack([xx, yy], -1).reshape(-1, 2) + 0.5  # (P, 2)

    def step(carry, rows):
        rgb, trans = carry  # (P, 3), (P,)
        du = pix[None, :, 0] - rows[:, 0:1]  # (Gc, P)
        dv = pix[None, :, 1] - rows[:, 1:2]
        power = -0.5 * (rows[:, 2:3] * du * du + rows[:, 4:5] * dv * dv) \
            - rows[:, 3:4] * du * dv
        alpha = jnp.minimum(0.99, rows[:, 8:9] * jnp.exp(power))
        alpha = jnp.where(alpha < 1.0 / 255.0, 0.0, alpha)
        one_m = 1.0 - alpha
        ti = jnp.cumprod(one_m, axis=0)  # (Gc, P) within-chunk inclusive
        w = alpha * (ti / one_m) * trans[None, :]
        rgb = rgb + jnp.einsum("gp,gc->pc", w, rows[:, 5:8])
        return (rgb, trans * ti[-1]), None

    (rgb, trans), _ = jax.lax.scan(
        step, (jnp.zeros((P, 3)), jnp.ones((P,))), att
    )
    rgb = rgb + trans[:, None] * bg[None, :]
    return rgb.reshape(H, W, 3)


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
