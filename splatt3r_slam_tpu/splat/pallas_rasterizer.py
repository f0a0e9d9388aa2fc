"""Pallas TPU kernel: per-tile Gaussian-splat alpha compositing.

The XLA rasterizer (`splat/rasterizer.py`) pads every tile's depth list to
a static K_MAX and evaluates the full (tiles, K_MAX, 256) block. This
kernel removes that waste: one grid program per 16x16 tile, per-tile
segment offsets delivered via PrefetchScalarGridSpec, gaussian rows DMA'd
from HBM in double-buffered chunks, and a `fori_loop` with the tile's
*actual* chunk count — tiles with few gaussians finish early instead of
masking K_MAX lanes.

Binning (project → depth sort → tile-key sort → contiguous per-tile
segments) stays in XLA where sorts belong; the kernel consumes
`pair_rows` = gaussian screen rows already ordered by (tile, depth).

Row layout (padded to 16 lanes... stored (P, 8)):
  [u, v, conic_a, conic_b, conic_c, opacity, r, g] + second array for b.
Here rows are (P, 16): [u v ca cb cc opa r g b 0*7].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatt3r_slam_tpu.splat.rasterizer import TILE, project_gaussians

CHUNK = 128  # gaussians per DMA chunk
ROWF = 16  # padded row width (lanes-friendly)


def _composite_kernel(
    # scalar prefetch
    starts_ref,  # (T+1,) int32 — pair-segment starts per tile
    origins_ref,  # (T, 2) int32 — tile pixel origins (x, y)
    # inputs
    rows_hbm,  # (P_pad, ROWF) f32 in ANY/HBM
    bg_ref,  # (1, 3) f32 in SMEM-ish VMEM
    # output
    out_ref,  # (TILE*TILE, 4) f32 — rgb + final transmittance
    # scratch
    buf,  # (2, CHUNK, ROWF) VMEM
    sem,  # DMA semaphores (2,)
):
    t = pl.program_id(0)
    start = jnp.int32(starts_ref[t])
    end = jnp.int32(starts_ref[t + 1])
    n = end - start
    nchunk = pl.cdiv(n, jnp.int32(CHUNK))

    ox = origins_ref[t, 0]
    oy = origins_ref[t, 1]
    # pixel centers (256,) laid out row-major
    pid = jax.lax.broadcasted_iota(jnp.int32, (TILE * TILE, 1), 0)[:, 0]
    px = (pid % TILE + ox).astype(jnp.float32) + 0.5
    py = (pid // TILE + oy).astype(jnp.float32) + 0.5

    def dma(slot, k):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start + k * CHUNK, CHUNK)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(nchunk > 0)
    def _():
        dma(0, 0).start()

    def body(k, carry):
        rgb, trans = carry  # (256, 3), (256, 1)
        slot = k % 2

        @pl.when(k + 1 < nchunk)
        def _():
            dma((k + 1) % 2, k + 1).start()

        dma(slot, k).wait()
        rows = buf[slot]  # (CHUNK, ROWF)

        u = rows[:, 0:1]
        v = rows[:, 1:2]
        ca = rows[:, 2:3]
        cb = rows[:, 3:4]
        cc = rows[:, 4:5]
        opa = rows[:, 5:6]
        col = rows[:, 6:9]  # (CHUNK, 3)

        du = px[None, :] - u  # (CHUNK, 256)
        dv = py[None, :] - v
        power = -0.5 * (ca * du * du + cc * dv * dv) - cb * du * dv
        alpha = jnp.minimum(0.99, opa * jnp.exp(power))
        alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
        # zero rows beyond the segment
        ridx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        alpha = jnp.where(ridx + k * CHUNK < n, alpha, 0.0)

        one_m = 1.0 - alpha  # (CHUNK, 256)
        # within-chunk exclusive product, sequential in depth:
        # cumulative log-product along the chunk axis
        logs = jnp.log(jnp.maximum(one_m, 1e-30))
        cumlog = jnp.cumsum(logs, axis=0)
        prod_incl = jnp.exp(cumlog)
        prod_excl = prod_incl / one_m
        w = alpha * prod_excl * trans[:, 0][None, :]  # (CHUNK, 256)
        rgb = rgb + jnp.dot(
            w.T, col, preferred_element_type=jnp.float32
        )  # (256, 3)
        trans = trans * prod_incl[-1][:, None]
        return rgb, trans

    rgb0 = jnp.zeros((TILE * TILE, 3), jnp.float32)
    tr0 = jnp.ones((TILE * TILE, 1), jnp.float32)
    rgb, trans = jax.lax.fori_loop(0, nchunk, body, (rgb0, tr0))
    rgb = rgb + trans * bg_ref[0][None, :]
    out_ref[:, 0:3] = rgb
    out_ref[:, 3:4] = trans


@functools.partial(jax.jit, static_argnames=("hw", "tpg_side", "interpret"))
def render_tiles_pallas(
    means, cov_triu, colors, opa, view, K, hw, bg=None,
    tpg_side: int = 4, interpret: bool = False,
):
    """Pallas-composited rendering; binning identical to render_tiles."""
    H, W = hw
    TX, TY = W // TILE, H // TILE
    T = TX * TY
    G = means.shape[0]
    if bg is None:
        bg = jnp.zeros(3)

    means2d, conic, depth, radius, ok = project_gaussians(
        means, cov_triu, opa, view, K, hw
    )
    colors = jnp.asarray(colors, jnp.float32)
    opa = jnp.asarray(opa, jnp.float32)
    order = jnp.argsort(jnp.where(ok, depth, jnp.inf))
    means2d = means2d[order]
    conic = conic[order]
    colors_s = colors[order]
    opa_s = jnp.where(ok[order], opa[order], 0.0)
    radius_s = radius[order]
    ok_s = ok[order]

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
                     indexing="xy"), axis=-1,
    ).reshape(-1, 2)
    tx = tx0[:, None] + dxy[None, :, 0]
    ty = ty0[:, None] + dxy[None, :, 1]
    key_ok = (tx <= tx1[:, None]) & (ty <= ty1[:, None]) & ok_s[:, None]
    tile_id = jnp.where(key_ok, ty * TX + tx, T)

    flat_tile = tile_id.reshape(-1)
    flat_g = jnp.broadcast_to(
        jnp.arange(G, dtype=jnp.int32)[:, None], tile_id.shape
    ).reshape(-1)
    sidx = jnp.argsort(flat_tile, stable=True)
    sorted_tile = flat_tile[sidx]
    sorted_g = flat_g[sidx]

    starts = jnp.searchsorted(sorted_tile, jnp.arange(T + 1)).astype(
        jnp.int32
    )

    # pre-gathered screen rows in (tile, depth) order, CHUNK-padded
    P = sorted_g.shape[0]
    Ppad = ((P + CHUNK - 1) // CHUNK) * CHUNK + CHUNK
    rows = jnp.zeros((Ppad, ROWF), jnp.float32)
    packed = jnp.concatenate(
        [means2d, conic, opa_s[:, None], colors_s], axis=-1
    )  # (G, 9)
    rows = rows.at[:P, :9].set(packed[sorted_g])

    origins = jnp.stack(
        [(jnp.arange(T, dtype=jnp.int32) % TX) * TILE,
         (jnp.arange(T, dtype=jnp.int32) // TX) * TILE], axis=-1
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bg
        ],
        out_specs=pl.BlockSpec(
            (TILE * TILE, 4), lambda t, *_: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, ROWF), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _composite_kernel,
        out_shape=jax.ShapeDtypeStruct((T * TILE * TILE, 4), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, origins, rows, bg.reshape(1, 3).astype(jnp.float32))

    rgb = out[:, :3].reshape(TY, TX, TILE, TILE, 3)
    img = rgb.transpose(0, 2, 1, 3, 4).reshape(H, W, 3)
    return img
