"""Two-view ViT: siamese encoder + dual cross-attention decoder + heads.

Architecture spec (reference):
- encoder: ViT-L/16, dim 1024, depth 24, heads 16, RoPE100, LN eps 1e-6
  (`splatt3r_core/main.py:54-71`, `croco/models/croco.py:66-72`).
- decoder: dim 768, depth 12, heads 12, two parallel block stacks
  (dec_blocks / dec_blocks2), all 12 intermediate outputs retained for the
  DPT hooks, final LN (`dust3r/dust3r/model.py:168-187`).
- heads: GaussianHead per view over hooks [0, 6, 9, 12]
  (`mast3r/catmlp_dpt_head.py:304-324`).

TPU-native design: bf16 compute / fp32 params & LayerNorms; RoPE cos/sin
tables computed once per view and fused into the attention einsums; the
whole two-view forward is a single jittable pure function with static
shapes (shape-polymorphic: portrait frames run at their true orientation,
one compile per orientation).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from splatt3r_slam_tpu.models.heads import GaussianHead
from splatt3r_slam_tpu.models.layers import (
    Block,
    DecoderBlock,
    PatchEmbed,
    rope_cos_sin,
)


class TwoViewConfig(NamedTuple):
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    patch_size: int = 16
    local_feat_dim: int = 24
    sh_degree: int = 1
    use_offsets: bool = False
    rope_freq: float = 100.0
    dtype: str = "bfloat16"  # transformer compute dtype
    # DPT/MLP head trunk compute dtype. Default bfloat16: the two per-view
    # DPT trunks are ~half the tracked-frame FLOPs and fp32 convs run at a
    # fraction of bf16 MXU throughput on v5e; the final output projection
    # stays fp32 regardless (see models/dpt.py precision note). Set
    # "float32" for the reference's exact head precision
    # (mast3r_utils.py:37-40) — pinned in eval configs & parity tests.
    head_dtype: str = "bfloat16"
    # rematerialize each scanned block on the backward pass: activations
    # are recomputed instead of stored, trading ~1/3 extra FLOPs for
    # O(depth) less HBM — standard for training ViT-L on TPU. Inference
    # (the SLAM runtime) has no backward pass, so it stays off there.
    remat: bool = False
    # DPT trunk sizes (production values fixed by the checkpoint; scaled
    # down only in tiny() so tests/dryruns don't pay 256-wide convs)
    head_feature_dim: int = 256
    head_layer_dims: tuple = (96, 192, 384, 768)
    head_last_dim: int = 128

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def jhead_dtype(self):
        return jnp.dtype(self.head_dtype)

    def tiny(self):
        """A scaled-down config for tests."""
        return self._replace(
            enc_embed_dim=64,
            enc_depth=2,
            enc_num_heads=2,
            dec_embed_dim=48,
            dec_depth=4,  # hooks scale with depth: h=[d/2-1, 3d/4-1, d-1]
            dec_num_heads=2,
            head_feature_dim=16,
            head_layer_dims=(8, 12, 16, 24),
            head_last_dim=16,
        )


class _EncBody(nn.Module):
    """Scan body: one encoder block (params stacked over depth)."""

    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, cs):
        x = Block(self.dim, self.heads, 4, self.dtype, name="block")(x, cs)
        return x, None


class _DecBody(nn.Module):
    """Scan body: one dual decoder step (blk1 view1 / blk2 view2)."""

    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, _):
        x1, x2, cs1c, cs1s, cs2c, cs2s = carry
        nx1 = DecoderBlock(self.dim, self.heads, 4, self.dtype,
                           name="blk1")(x1, x2, (cs1c, cs1s), (cs2c, cs2s))
        nx2 = DecoderBlock(self.dim, self.heads, 4, self.dtype,
                           name="blk2")(x2, x1, (cs2c, cs2s), (cs1c, cs1s))
        return (nx1, nx2, cs1c, cs1s, cs2c, cs2s), (nx1, nx2)


class Splatt3RModel(nn.Module):
    """Full two-view network. Methods are exposed separately so the SLAM

    runtime can jit encode / decode+heads independently (the keyframe's
    encoder features are cached across frames, spec:
    `splatt3r_slam/splatt3r_utils.py:580-607`).

    The 24 encoder and 2x12 decoder blocks run under `lax.scan` with
    depth-stacked parameters — one compiled block body each instead of an
    unrolled graph, which cuts XLA compile time ~20x for the fused SLAM
    step (a first-class concern on TPU).
    """

    cfg: TwoViewConfig

    def setup(self):
        c = self.cfg
        dt = c.jdtype
        self.patch_embed = PatchEmbed(c.patch_size, c.enc_embed_dim,
                                      jnp.float32, name="patch_embed")
        # prevent_cse is safe (and faster) under scan's loop structure
        enc_body = (nn.remat(_EncBody, prevent_cse=False) if c.remat
                    else _EncBody)
        dec_body = (nn.remat(_DecBody, prevent_cse=False) if c.remat
                    else _DecBody)
        self.enc_blocks = nn.scan(
            enc_body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=c.enc_depth,
        )(c.enc_embed_dim, c.enc_num_heads, dt, name="enc_blocks")
        self.enc_norm = nn.LayerNorm(epsilon=1e-6, name="enc_norm")
        self.decoder_embed = nn.Dense(c.dec_embed_dim, name="decoder_embed")
        self.dec_blocks = nn.scan(
            dec_body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.dec_depth,
        )(c.dec_embed_dim, c.dec_num_heads, dt, name="dec_blocks")
        self.dec_norm = nn.LayerNorm(epsilon=1e-6, name="dec_norm")
        hd = c.jhead_dtype
        self.head1 = GaussianHead(
            c.enc_embed_dim, c.dec_embed_dim, c.local_feat_dim, c.patch_size,
            c.sh_degree, c.use_offsets, hd,
            feature_dim=c.head_feature_dim, layer_dims=c.head_layer_dims,
            last_dim=c.head_last_dim, name="head1",
        )
        self.head2 = GaussianHead(
            c.enc_embed_dim, c.dec_embed_dim, c.local_feat_dim, c.patch_size,
            c.sh_degree, c.use_offsets, hd,
            feature_dim=c.head_feature_dim, layer_dims=c.head_layer_dims,
            last_dim=c.head_last_dim, name="head2",
        )

    def _enc_rope(self, pos):
        d_half = self.cfg.enc_embed_dim // self.cfg.enc_num_heads // 2
        return rope_cos_sin(pos, d_half, self.cfg.rope_freq)

    def _dec_rope(self, pos):
        d_half = self.cfg.dec_embed_dim // self.cfg.dec_num_heads // 2
        return rope_cos_sin(pos, d_half, self.cfg.rope_freq)

    def encode(self, img):
        """img (B, H, W, 3) landscape → (tokens (B,N,C) fp32, pos (B,N,2))."""
        x, pos = self.patch_embed(img)
        cs = self._enc_rope(pos)
        x = x.astype(self.cfg.jdtype)
        x, _ = self.enc_blocks(x, cs)
        return self.enc_norm(x.astype(jnp.float32)), pos

    def decode(self, f1, pos1, f2, pos2):
        """Dual decoder; returns per-view hook lists [enc, d6, d9, d12·LN].

        The scan stacks every block output (depth, B, N, C); only the DPT
        hooks [dec_depth/2, 3·dec_depth/4, dec_depth] are consumed
        (`catmlp_dpt_head.py:297`).
        """
        c = self.cfg
        cs1 = self._dec_rope(pos1)
        cs2 = self._dec_rope(pos2)

        x1 = self.decoder_embed(f1).astype(c.jdtype)
        x2 = self.decoder_embed(f2).astype(c.jdtype)
        carry = (x1, x2, cs1[0], cs1[1], cs2[0], cs2[1])
        carry, (ys1, ys2) = self.dec_blocks(carry, None)
        h6 = c.dec_depth // 2 - 1
        h9 = 3 * c.dec_depth // 4 - 1
        out1 = [f1, ys1[h6].astype(jnp.float32), ys1[h9].astype(jnp.float32),
                self.dec_norm(carry[0].astype(jnp.float32))]
        out2 = [f2, ys2[h6].astype(jnp.float32), ys2[h9].astype(jnp.float32),
                self.dec_norm(carry[1].astype(jnp.float32))]
        return out1, out2

    def apply_head(self, head_num, hook_tokens, image_size, mode="full"):
        head = self.head1 if head_num == 1 else self.head2
        return head(hook_tokens, image_size, mode)

    def __call__(self, img1, img2):
        """Full two-view forward (spec: dust3r/model.py:198-207).

        Returns (res1, res2) activation dicts; res2's pts3d/means live in
        view1's frame (the cross prediction).
        """
        B, H, W, _ = img1.shape
        f1, pos1 = self.encode(img1)
        f2, pos2 = self.encode(img2)
        d1, d2 = self.decode(f1, pos1, f2, pos2)
        res1 = self.apply_head(1, d1, (H, W))
        res2 = self.apply_head(2, d2, (H, W))
        return res1, res2


def init_model(cfg: TwoViewConfig, h: int, w: int, seed: int = 0):
    """Random-init params for shape (1, h, w, 3) landscape inputs."""
    model = Splatt3RModel(cfg)
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), img, img)["params"]
    return model, params


@functools.partial(jax.jit, static_argnames=("model",))
def forward_pair(model: Splatt3RModel, params, img1, img2):
    return model.apply({"params": params}, img1, img2)
