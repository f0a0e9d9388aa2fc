"""Pallas TPU kernel: per-tile Gaussian-splat alpha compositing.

The XLA rasterizer (`splat/rasterizer.py`) pads every tile's depth list to
a static K_MAX and evaluates the full (tiles, K_MAX, 256) block. This
kernel removes that waste: one grid program per 16x16 tile, per-tile
segment offsets delivered via PrefetchScalarGridSpec, gaussian columns
DMA'd from HBM in double-buffered chunks, and a `fori_loop` with the
tile's *actual* chunk count — tiles with few gaussians finish early
instead of masking K_MAX lanes.

Binning (project → depth sort → tile-key sort → per-tile segments) stays
in XLA where sorts belong; the kernel consumes `rows` = gaussian screen
attributes already ordered by (tile, depth).

Mosaic layout constraints (v5e, f32 tiling (8, 128)) shape the data plane:
- attributes are stored transposed, (ROWF=16, P): a DMA chunk is then a
  (16, CHUNK=128) block — full sublanes, 128 lanes;
- per-tile DMA starts at the CHUNK-floor of the segment start (keeps the
  packing a pure gather — a scatter here serializes and is ~100x slower);
  the in-segment head offset is masked inside the kernel;
- in-kernel math runs in (256 pixels, CHUNK) orientation and the
  depth-cumulative transmittance is an upper-triangular matmul on the MXU
  (cumsum/dynamic_slice have no Mosaic TC lowering here).

Replaces the compositing loop of `diff-gaussian-rasterization`
(reference call sites `cuda_splatting.py:100-128`,
`splatt3r_slam/visualization.py:563-594`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatt3r_slam_tpu.splat.rasterizer import (
    TILE,
    _searchsorted_bin,
    project_gaussians,
)

CHUNK = 128  # gaussians per DMA chunk (= lane tiling)
ROWF = 16  # padded attribute count (sublane-friendly)
NPIX = TILE * TILE


def _composite_kernel(
    # scalar prefetch
    startc_ref,  # (T,) int32 — floor(segment start / CHUNK) per tile
    head_ref,  # (T,) int32 — segment start % CHUNK (masked in-kernel)
    counts_ref,  # (T,) int32 — actual gaussian count per tile
    origins_ref,  # (T, 2) int32 — tile pixel origins (x, y)
    # inputs
    rows_hbm,  # (ROWF, P_pad) f32 in ANY/HBM, transposed attribute layout
    bg_ref,  # (1, 3) f32 in VMEM
    # output
    out_ref,  # (NPIX, 4) f32 — rgb + final transmittance
    # scratch
    buf,  # (2, ROWF, CHUNK) VMEM
    sem,  # DMA semaphores (2,)
):
    t = pl.program_id(0)
    # starts are in CHUNK units: the (start + k) * CHUNK form lets Mosaic
    # prove lane-tile divisibility of the dynamic DMA offset
    start_c = startc_ref[t]
    head = head_ref[t]
    n = counts_ref[t]
    nchunk = pl.cdiv(head + n, jnp.int32(CHUNK))

    ox = origins_ref[t, 0]
    oy = origins_ref[t, 1]
    # pixel centers, row-major over the 16x16 tile → (NPIX, 1) columns
    pid = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    px = (pid % TILE + ox).astype(jnp.float32) + 0.5
    py = (pid // TILE + oy).astype(jnp.float32) + 0.5

    def dma(slot, k):
        # static `slot` only (no dynamic_slice in this Mosaic TC lowering);
        # offsets are CHUNK-aligned by the packing layout.
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds((start_c + k) * CHUNK, CHUNK)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(nchunk > 0)
    def _():
        dma(0, 0).start()

    # upper-triangular ones: inclusive cumsum along lanes via the MXU
    r_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    triu = (r_i <= c_i).astype(jnp.float32)

    def body(k, carry):
        rgb, trans = carry  # (NPIX, 3), (NPIX, 1)
        slot = k % 2

        @pl.when((k + 1 < nchunk) & (slot == 0))
        def _():
            dma(1, k + 1).start()

        @pl.when((k + 1 < nchunk) & (slot == 1))
        def _():
            dma(0, k + 1).start()

        @pl.when(slot == 0)
        def _():
            dma(0, k).wait()

        @pl.when(slot == 1)
        def _():
            dma(1, k).wait()

        rows = jnp.where(slot == 0, buf[0], buf[1])  # (ROWF, CHUNK)

        u = rows[0:1, :]  # (1, CHUNK)
        v = rows[1:2, :]
        ca = rows[2:3, :]
        cb = rows[3:4, :]
        cc = rows[4:5, :]
        opa = rows[5:6, :]
        col = rows[6:9, :]  # (3, CHUNK)

        du = px - u  # (NPIX, CHUNK)
        dv = py - v
        power = -0.5 * (ca * du * du + cc * dv * dv) - cb * du * dv
        alpha = jnp.minimum(0.99, opa * jnp.exp(power))
        alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
        # zero columns outside the segment [head, head + n)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + k * CHUNK
        alpha = jnp.where((j >= head) & (j < head + n), alpha, 0.0)

        one_m = 1.0 - alpha  # (NPIX, CHUNK)
        # within-chunk exclusive product, sequential in depth:
        # cumlog[:, j] = sum_{i<=j} log(one_m[:, i])  via logs @ triu
        logs = jnp.log(jnp.maximum(one_m, 1e-30))
        cumlog = jnp.dot(logs, triu, preferred_element_type=jnp.float32)
        prod_incl = jnp.exp(cumlog)
        prod_excl = prod_incl / one_m
        w = alpha * prod_excl * trans  # (NPIX, CHUNK)
        rgb = rgb + jax.lax.dot_general(
            w, col, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (NPIX, 3)
        trans = trans * jax.lax.slice(
            prod_incl, (0, CHUNK - 1), (NPIX, CHUNK)
        )
        return rgb, trans

    rgb0 = jnp.zeros((NPIX, 3), jnp.float32)
    tr0 = jnp.ones((NPIX, 1), jnp.float32)
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
    opa = jnp.where(ok, jnp.asarray(opa, jnp.float32), 0.0)

    # combined (tile | depth) keys + ONE payload sort (see rasterizer.py)
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
                     indexing="xy"), axis=-1,
    ).reshape(-1, 2)
    tx = tx0[:, None] + dxy[None, :, 0]
    ty = ty0[:, None] + dxy[None, :, 1]
    key_ok = (tx <= tx1[:, None]) & (ty <= ty1[:, None]) & ok[:, None]
    tile_id = jnp.where(key_ok, ty * TX + tx, T)
    key = (tile_id << DBITS) | depth_q[:, None]

    flat_key = key.reshape(-1)
    flat_g = jnp.broadcast_to(
        jnp.arange(G, dtype=jnp.int32)[:, None], key.shape
    ).reshape(-1)
    sorted_key, sorted_g = jax.lax.sort((flat_key, flat_g), num_keys=1)

    P0 = sorted_key.shape[0]
    n_it = max(1, int(np.ceil(np.log2(P0 + 1))))
    bounds = _searchsorted_bin(
        sorted_key, (jnp.arange(T + 1, dtype=jnp.int32) << DBITS), n_it
    )
    seg_starts, seg_ends = bounds[:T], bounds[1:]
    counts = seg_ends - seg_starts

    P = sorted_g.shape[0]
    P_pad = P + 2 * CHUNK  # tail overhang for floor-aligned DMA

    packed = jnp.concatenate(
        [means2d, conic, opa[:, None], colors], axis=-1
    )  # (G, 9) original order
    attrs = packed[sorted_g]  # (P, 9) — the kernel DMAs physically
    # contiguous segments, so the (tile, depth)-ordered reorder gather is
    # unavoidable here (the XLA path's gidx gather subsumes it there)
    rows = jnp.zeros((ROWF, P_pad), jnp.float32)
    rows = rows.at[:9, :P].set(attrs.T)  # static pad, not a scatter

    origins = jnp.stack(
        [(jnp.arange(T, dtype=jnp.int32) % TX) * TILE,
         (jnp.arange(T, dtype=jnp.int32) // TX) * TILE], axis=-1
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bg
        ],
        out_specs=pl.BlockSpec(
            (NPIX, 4), lambda t, *_: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ROWF, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _composite_kernel,
        out_shape=jax.ShapeDtypeStruct((T * NPIX, 4), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(seg_starts // CHUNK, seg_starts % CHUNK, counts, origins, rows,
      bg.reshape(1, 3).astype(jnp.float32))

    rgb = out[:, :3].reshape(TY, TX, TILE, TILE, 3)
    img = rgb.transpose(0, 2, 1, 3, 4).reshape(H, W, 3)
    return img
