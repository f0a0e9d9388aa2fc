"""Transformer building blocks for the two-view ViT (flax.linen).

Architecture spec: reference `croco/models/blocks.py:81-236` (Attention /
CrossAttention / Block / DecoderBlock, LayerNorm eps 1e-6, qkv_bias=True,
GELU MLP ratio 4) and `croco/models/pos_embed.py:106-159` (RoPE2D, freq 100,
y-half/x-half split, rotate-half form).

TPU-native choices:
- attention computes in bf16 (MXU) with fp32 softmax accumulation and
  fp32 LayerNorms; params stay fp32.
- RoPE cos/sin are gathered per token *outside* the head loop and fused by
  XLA into the attention einsums (no curope-style custom kernel needed).
- token layout is (B, N, H, Dh) to keep the last dim minor-most = lanes.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def rope_cos_sin(positions: jnp.ndarray, d_half: int, freq: float = 100.0):
    """cos/sin tables gathered at integer (y, x) token positions.

    positions: (B, N, 2) int. Returns cos, sin of shape (B, N, 2, d_half)
    where axis -2 indexes (y, x).
    """
    d4 = d_half // 2
    inv_freq = 1.0 / (freq ** (jnp.arange(0, d4, dtype=jnp.float32) / d4))
    ang = positions[..., None].astype(jnp.float32) * inv_freq  # (B,N,2,d4)
    ang = jnp.concatenate([ang, ang], axis=-1)  # duplicated-half layout
    return jnp.cos(ang), jnp.sin(ang)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope2d(tokens: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Apply 2D rotary embedding to (B, N, H, D) tokens.

    The feature dim is split in half: first half rotated by the y position,
    second half by x (spec: pos_embed.py:149-159). cos/sin: (B, N, 2, D/2).
    """
    ty, tx = jnp.split(tokens, 2, axis=-1)
    cy = cos[:, :, None, 0, :]  # (B, N, 1, D/2) broadcast over heads
    sy = sin[:, :, None, 0, :]
    cx = cos[:, :, None, 1, :]
    sx = sin[:, :, None, 1, :]
    dt = tokens.dtype
    ty = ty * cy.astype(dt) + _rotate_half(ty) * sy.astype(dt)
    tx = tx * cx.astype(dt) + _rotate_half(tx) * sx.astype(dt)
    return jnp.concatenate([ty, tx], axis=-1)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


# Flash-attention mode. MEASURED on v5e at the production tracking shape
# (B=1..2, H=12..16, N=768, Dh=64): the Pallas flash kernel made the whole
# fused tracking step 44% SLOWER (55 ms vs 38 ms/step, 18.5 vs 26 FPS —
# the round-2 driver-bench regression). At N=768 the fp32 score tensor is
# only (B,H,768,768) ≈ 37 MB and XLA fuses softmax into the matmuls, so
# flash's VMEM-resident streaming buys nothing while its launch/tiling
# overheads dominate. "auto" therefore engages flash only at token counts
# where the score tensor genuinely blows past VMEM (N ≥ 4096 — e.g. a
# future ≥1024-res variant); "off" forces the einsum path (exact fp32
# softmax — the parity oracle), "on" forces flash where the shape permits.
# NOTE: _FLASH_MODE is read at trace time — set it BEFORE the first call
# of a jitted function (changing it later does not invalidate jit caches).
_FLASH_MODE = "auto"

# flash-attention auto threshold: minimum n_q·n_kv before the Pallas
# kernel is preferred over the fused einsum (see measurement note above)
_FLASH_AUTO_MIN_SCORES = 4096 * 4096


def set_flash_attention(mode: str):
    """Select the attention implementation: "auto" | "on" | "off".

    Must be called before the first trace of any jitted model function
    (module-global, read at trace time; see note on _FLASH_MODE).
    Wired to `--flash-attention` on main.py / bench scripts.
    """
    global _FLASH_MODE
    assert mode in ("auto", "on", "off"), mode
    _FLASH_MODE = mode


def _flash_shape_ok(n_q: int, n_kv: int, dh: int) -> bool:
    # shapes the Pallas Mosaic kernel tiles cleanly
    return (n_q % 256 == 0 and n_kv % 256 == 0
            and dh % 64 == 0 and dh >= 64)


def _flash_wanted(n_q: int, n_kv: int, dh: int) -> bool:
    if _FLASH_MODE == "off":
        return False
    if not _flash_shape_ok(n_q, n_kv, dh):
        return False
    if _FLASH_MODE == "on":
        return True
    # auto: TPU backend only, and only above the measured crossover
    try:
        if jax.default_backend() in ("cpu", "gpu"):
            return False
    except RuntimeError:
        return False
    return n_q * n_kv >= _FLASH_AUTO_MIN_SCORES


def _attend_flash(q, k, v, scale):
    """Pallas TPU flash attention ((B,N,H,D) in/out); fwd-only use."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), causal=False, sm_scale=scale,
    )
    return out.transpose(0, 2, 1, 3).astype(v.dtype)


_FLASH_FALLBACK_LOGGED = False


def _attend(q, k, v, scale):
    """Softmax attention with fp32 logits/weights, bf16 matmuls."""
    if _flash_wanted(q.shape[1], k.shape[1], q.shape[-1]):
        try:
            return _attend_flash(q, k, v, scale)
        except (ImportError, NotImplementedError, ValueError) as e:
            # expected trace-time failures only (kernel missing / shape
            # rejected); log once so a silently-disabled flash path is
            # visible instead of masking real bugs
            global _FLASH_FALLBACK_LOGGED
            if not _FLASH_FALLBACK_LOGGED:
                _FLASH_FALLBACK_LOGGED = True
                import logging

                logging.getLogger(__name__).warning(
                    "flash attention unavailable (%s); using einsum path", e
                )
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    )
    w = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", w.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


class Attention(nn.Module):
    """Self-attention with RoPE on q/k (spec: blocks.py:84-115)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, rope_cs):
        B, N, C = x.shape
        H = self.num_heads
        Dh = C // H
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, Dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if rope_cs is not None:
            cos, sin = rope_cs
            q = apply_rope2d(q, cos, sin)
            k = apply_rope2d(k, cos, sin)
        out = _attend(q, k, v, Dh**-0.5).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class CrossAttention(nn.Module):
    """Cross-attention, separate q/k/v projections (spec: blocks.py:137-171)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, query, key, value, q_cs, k_cs):
        B, Nq, C = query.shape
        H = self.num_heads
        Dh = C // H
        q = nn.Dense(C, dtype=self.dtype, name="projq")(query).reshape(B, Nq, H, Dh)
        k = nn.Dense(C, dtype=self.dtype, name="projk")(key).reshape(
            B, key.shape[1], H, Dh
        )
        v = nn.Dense(C, dtype=self.dtype, name="projv")(value).reshape(
            B, value.shape[1], H, Dh
        )
        if q_cs is not None:
            q = apply_rope2d(q, *q_cs)
            k = apply_rope2d(k, *k_cs)
        out = _attend(q, k, v, Dh**-0.5).reshape(B, Nq, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


def _ln(name, dtype=jnp.float32):
    # fp32 LayerNorm regardless of compute dtype (eps matches reference 1e-6)
    return nn.LayerNorm(epsilon=1e-6, name=name, dtype=dtype)


class Block(nn.Module):
    """Encoder block: x + attn(LN(x)); x + mlp(LN(x)) (blocks.py:117-135)."""

    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, rope_cs):
        x = x + Attention(self.dim, self.num_heads, self.dtype, name="attn")(
            _ln("norm1")(x).astype(self.dtype), rope_cs
        )
        x = x + Mlp(self.dim * self.mlp_ratio, self.dim, self.dtype, name="mlp")(
            _ln("norm2")(x).astype(self.dtype)
        )
        return x


class DecoderBlock(nn.Module):
    """Decoder block: self-attn + cross-attn + MLP (blocks.py:173-192)."""

    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y, x_cs, y_cs):
        x = x + Attention(self.dim, self.num_heads, self.dtype, name="attn")(
            _ln("norm1")(x).astype(self.dtype), x_cs
        )
        y_ = _ln("norm_y")(y).astype(self.dtype)
        x = x + CrossAttention(
            self.dim, self.num_heads, self.dtype, name="cross_attn"
        )(_ln("norm2")(x).astype(self.dtype), y_, y_, x_cs, y_cs)
        x = x + Mlp(self.dim * self.mlp_ratio, self.dim, self.dtype, name="mlp")(
            _ln("norm3")(x).astype(self.dtype)
        )
        return x


class PatchEmbed(nn.Module):
    """16x16 conv patchifier → (B, N, C) tokens + (y, x) positions.

    Spec: blocks.py:225-256 + dust3r ManyAR_PatchEmbed (patch_embed.py:33-71).
    Shape-polymorphic: portrait frames are fed at their true orientation
    (checkpoint-parity verified — the reference's ManyAR computes portrait
    tokens/positions at portrait orientation); each orientation compiles
    once with static shapes.
    """

    patch_size: int = 16
    embed_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        # img: (B, H, W, 3) NHWC
        B, H, W, _ = img.shape
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(img)
        gh, gw = H // p, W // p
        x = x.reshape(B, gh * gw, self.embed_dim)
        yy, xx = jnp.meshgrid(jnp.arange(gh), jnp.arange(gw), indexing="ij")
        pos = jnp.stack([yy, xx], axis=-1).reshape(1, gh * gw, 2)
        pos = jnp.broadcast_to(pos, (B, gh * gw, 2))
        return x, pos


def bilinear_resize_ac(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize with align_corners=True as two interpolation matmuls.

    Matches torch `F.interpolate(..., mode='bilinear', align_corners=True)`.
    Expressed as out = A_h @ x @ A_wᵀ so it runs on the MXU instead of as
    gathers. x: (B, H, W, C) → (B, H', W', C).
    """
    B, H, W, C = x.shape
    H2, W2 = out_hw

    def interp_matrix(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return jnp.ones((n_out, n_in), jnp.float32) / n_in
        src = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 2)
        frac = src - i0
        A = jnp.zeros((n_out, n_in), jnp.float32)
        r = jnp.arange(n_out)
        A = A.at[r, i0].set(1.0 - frac)
        A = A.at[r, i0 + 1].add(frac)
        return A

    Ah = interp_matrix(H, H2)
    Aw = interp_matrix(W, W2)
    y = jnp.einsum("ph,bhwc->bpwc", Ah, x.astype(jnp.float32))
    y = jnp.einsum("qw,bpwc->bpqc", Aw, y)
    return y.astype(x.dtype)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch.pixel_shuffle in NHWC: (B,H,W,C·r²) → (B,H·r,W·r,C).

    Channel index decomposes as c·r² + i·r + j (torch convention), with the
    (i, j) sub-pixel offsets scattering to rows/cols.
    """
    B, H, W, CRR = x.shape
    C = CRR // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, i, W, j, C
    return x.reshape(B, H * r, W * r, C)
