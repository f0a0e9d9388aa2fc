"""DPT dense-prediction head (flax.linen, NHWC).

Architecture spec: reference `croco/models/dpt_block.py:264-445` as fixed
for dust3r in `dust3r/heads/dpt_head.py:20-66` (hooks [0, 6, 9, 12], token
dims [1024, 768, 768, 768], feature_dim 256, "regression" head, path_4
cropped to layer-3's spatial shape before fusion).

All convs are plain NHWC convolutions; bilinear x2 upsampling with
align_corners=True is expressed as interpolation matmuls
(`layers.bilinear_resize_ac`) which XLA maps onto the MXU.

Precision: `dtype` is the trunk compute dtype. On TPU the production
profile runs the trunk in bfloat16 (MXU-native; fp32 convs run at a
fraction of bf16 throughput on v5e), while the final 1x1 output
projection (`head_4`) always computes in float32 — it is <1% of the
head FLOPs and keeps the regressed channels (pts3d/conf/desc) at fp32
output precision. The reference runs its heads in fp32
(`splatt3r_slam/mast3r_utils.py:37-40`, tokens `.float()` under
`autocast(enabled=False)`); head_dtype="float32" restores that exactly
and is pinned in the parity suites and the reference-exact eval configs.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from splatt3r_slam_tpu.models.layers import bilinear_resize_ac


class ResidualConvUnit(nn.Module):
    """x + conv(relu(conv(relu(x)))). Mixed precision: the convs compute
    in `dtype` (bf16 on the MXU in the production profile) but the
    residual ADD stays in the input's dtype — the trunk signal rides an
    fp32 accumulator exactly like the transformer blocks' residual
    stream, so bf16 rounding stays per-op instead of compounding through
    the refinenet cascade (measured: compounding bf16 residuals cost
    ~13% absmax on pts3d; fp32 residuals ~1%)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x).astype(self.dtype)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      name="conv2")(out)
        return out.astype(x.dtype) + x


class FeatureFusionBlock(nn.Module):
    """Fusion + 2x align-corners upsample + 1x1 out conv (dpt_block.py:141-209).

    The inter-block signal (x, res, and their sum) stays fp32; only the
    conv interiors run in `dtype` (see ResidualConvUnit note)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res=None):
        x = x.astype(jnp.float32)
        if res is not None:
            x = x + ResidualConvUnit(self.features, self.dtype,
                                     name="resConfUnit1")(
                res.astype(jnp.float32))
        x = ResidualConvUnit(self.features, self.dtype, name="resConfUnit2")(x)
        B, H, W, C = x.shape
        x = bilinear_resize_ac(x, (2 * H, 2 * W))
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                    name="out_conv")(x.astype(self.dtype))
        return x


class DPT(nn.Module):
    """4-hook DPT adapter producing a dense (B, H, W, num_channels) map."""

    num_channels: int
    dim_tokens: Sequence[int] = (1024, 768, 768, 768)
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256
    last_dim: int = 128
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hook_tokens, image_size):
        """hook_tokens: list of 4 (B, N, C_i) token arrays; image_size (H, W)."""
        H, W = image_size
        nh, nw = H // self.patch_size, W // self.patch_size
        feats = [
            t.astype(self.dtype).reshape(t.shape[0], nh, nw, t.shape[-1])
            for t in hook_tokens
        ]

        # act_postprocess: per-hook projection + rescale to the DPT pyramid
        # (dpt_block.py:358-409). Pyramid scales: x4, x2, x1, /2.
        l0 = nn.Conv(self.layer_dims[0], (1, 1), dtype=self.dtype,
                     name="act_0_conv")(feats[0])
        l0 = nn.ConvTranspose(
            self.layer_dims[0], (4, 4), strides=(4, 4), padding="VALID",
            transpose_kernel=True, dtype=self.dtype, name="act_0_deconv",
        )(l0)
        l1 = nn.Conv(self.layer_dims[1], (1, 1), dtype=self.dtype,
                     name="act_1_conv")(feats[1])
        l1 = nn.ConvTranspose(
            self.layer_dims[1], (2, 2), strides=(2, 2), padding="VALID",
            transpose_kernel=True, dtype=self.dtype, name="act_1_deconv",
        )(l1)
        l2 = nn.Conv(self.layer_dims[2], (1, 1), dtype=self.dtype,
                     name="act_2_conv")(feats[2])
        l3 = nn.Conv(self.layer_dims[3], (1, 1), dtype=self.dtype,
                     name="act_3_conv")(feats[3])
        l3 = nn.Conv(self.layer_dims[3], (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="act_3_down")(l3)

        # scratch.layer_rn: 3x3 no-bias projections to feature_dim
        rn = []
        for idx, l in enumerate([l0, l1, l2, l3]):
            rn.append(
                nn.Conv(self.feature_dim, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"layer_{idx + 1}_rn")(l)
            )

        # refinenet cascade, top-down; path_4 cropped to layer-3's shape
        # (dust3r/heads/dpt_head.py:58)
        p4 = FeatureFusionBlock(self.feature_dim, self.dtype,
                                name="refinenet4")(rn[3])
        p4 = p4[:, : rn[2].shape[1], : rn[2].shape[2], :]
        p3 = FeatureFusionBlock(self.feature_dim, self.dtype,
                                name="refinenet3")(p4, rn[2])
        p2 = FeatureFusionBlock(self.feature_dim, self.dtype,
                                name="refinenet2")(p3, rn[1])
        p1 = FeatureFusionBlock(self.feature_dim, self.dtype,
                                name="refinenet1")(p2, rn[0])

        # regression head (dpt_block.py:319-326)
        x = nn.Conv(self.feature_dim // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="head_0")(p1)
        x = bilinear_resize_ac(x, (H, W))
        x = nn.Conv(self.last_dim, (3, 3), padding=1, dtype=self.dtype,
                    name="head_2")(x)
        x = nn.relu(x)
        # final projection always fp32 (precision note in module docstring)
        x = nn.Conv(self.num_channels, (1, 1), dtype=jnp.float32,
                    name="head_4")(x.astype(jnp.float32))
        return x
