"""Gaussian prediction head + output activations.

Spec: reference `mast3r/catmlp_dpt_head.py`:
- GaussianHead (lines 182-278): pts3d DPT (4ch), local-features MLP
  (1024+768 → 4x hidden → 25·256) + pixel-shuffle(16), second "gaussian"
  DPT (14ch) with calibrated final-layer init (lines 221-239), outputs
  concatenated and activated by gaussian_postprocess (lines 140-178).
- Activations (lines 100-137 + dust3r/heads/postprocess.py:22-58):
  pts3d = dir·expm1(‖x‖); conf = 1+exp(x); desc L2-normalized;
  offsets = dir·(exp(‖x‖−6)−exp(−6)); scales = exp; rotations L2-norm
  quat (xyzw); sh reshape to (..., 3, d_sh); opacity = sigmoid;
  means = pts3d + offset (when use_offsets).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from splatt3r_slam_tpu.models.dpt import DPT
from splatt3r_slam_tpu.models.layers import pixel_shuffle


def reg_dense_depth_exp(xyz: jnp.ndarray) -> jnp.ndarray:
    """'exp' depth mode: unit direction times expm1(norm)."""
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    return xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)


def reg_dense_conf_exp(x: jnp.ndarray, vmin: float = 1.0) -> jnp.ndarray:
    """'exp' conf mode with (vmin, inf) bounds: vmin + e^x."""
    return vmin + jnp.exp(x)


def reg_desc_norm(desc: jnp.ndarray) -> jnp.ndarray:
    return desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)


def reg_dense_offsets(xyz: jnp.ndarray, shift: float = 6.0) -> jnp.ndarray:
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    dirs = xyz / jnp.maximum(d, 1e-8)
    return dirs * (jnp.exp(d - shift) - jnp.exp(-shift))


def reg_dense_rotation(rot: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return rot / (jnp.linalg.norm(rot, axis=-1, keepdims=True) + eps)


def gaussian_postprocess(
    fmap: jnp.ndarray,
    desc_dim: int = 24,
    sh_degree: int = 1,
    use_offsets: bool = False,
) -> dict:
    """Split + activate the (B, H, W, 40) head output (spec lines 140-178).

    Channel split: [3 pts3d | 1 conf | 24 desc | 1 desc_conf | 3 offset |
    3 scales | 4 rot | 3·sh | 1 opacity].
    """
    import numpy as _np

    fmap = fmap.astype(jnp.float32)
    splits = [3, 1, desc_dim, 1, 3, 3, 4, 3 * sh_degree, 1]
    idx = _np.cumsum(splits)[:-1].tolist()
    (pts3d, conf, desc, desc_conf, offset, scales, rotations, sh, opacities
     ) = jnp.split(fmap, idx, axis=-1)

    pts3d = reg_dense_depth_exp(pts3d)
    res = {
        "pts3d": pts3d,
        "conf": reg_dense_conf_exp(conf[..., 0]),
        "desc": reg_desc_norm(desc),
        "desc_conf": reg_dense_conf_exp(desc_conf[..., 0]),
        "scales": jnp.exp(scales),
        "rotations": reg_dense_rotation(rotations),
        "sh": sh.reshape(sh.shape[:-1] + (3, sh_degree)),
        "opacities": jax.nn.sigmoid(opacities),
        "means": (
            pts3d + reg_dense_offsets(offset) if use_offsets
            else pts3d
        ),
    }
    return res


def gaussian_postprocess_tracking(fmap: jnp.ndarray, desc_dim: int = 24) -> dict:
    """Activate the tracking subset [3 pts3d | 1 conf | desc | 1 desc_conf]."""
    import numpy as _np

    fmap = fmap.astype(jnp.float32)
    idx = _np.cumsum([3, 1, desc_dim]).tolist()
    pts3d, conf, desc, desc_conf = jnp.split(fmap, idx, axis=-1)
    pts3d = reg_dense_depth_exp(pts3d)
    return {
        "pts3d": pts3d,
        "conf": reg_dense_conf_exp(conf[..., 0]),
        "desc": reg_desc_norm(desc),
        "desc_conf": reg_dense_conf_exp(desc_conf[..., 0]),
        "means": pts3d,
    }


def gaussian_postprocess_gauss_only(fmap: jnp.ndarray,
                                    sh_degree: int = 1) -> dict:
    """Activate the gaussian-DPT subset [3 offset | 3 scales | 4 rot |
    3·sh | 1 opacity] (spec lines 150-178 minus the tracking channels)."""
    import numpy as _np

    fmap = fmap.astype(jnp.float32)
    idx = _np.cumsum([3, 3, 4, 3 * sh_degree]).tolist()
    offset, scales, rotations, sh, opacities = jnp.split(fmap, idx, axis=-1)
    return {
        "offset_raw": offset,
        "scales": jnp.exp(scales),
        "rotations": reg_dense_rotation(rotations),
        "sh": sh.reshape(sh.shape[:-1] + (3, sh_degree)),
        "opacities": jax.nn.sigmoid(opacities),
    }


def combine_gaussians(gauss: dict, pts3d: jnp.ndarray, conf: jnp.ndarray,
                      use_offsets: bool = False) -> dict:
    """Merge a gaussian_only head output with the tracking pass's pts3d/conf
    into the full Gaussian prediction dict (means = pts3d (+ offsets))."""
    means = pts3d
    if use_offsets:
        means = pts3d + reg_dense_offsets(gauss["offset_raw"])
    return {
        "means": means,
        "scales": gauss["scales"],
        "rotations": gauss["rotations"],
        "sh": gauss["sh"],
        "opacities": gauss["opacities"],
        "conf": conf,
    }


class GaussianHead(nn.Module):
    """pts3d DPT + local-feature MLP + gaussian DPT (spec lines 182-278)."""

    enc_dim: int = 1024
    dec_dim: int = 768
    local_feat_dim: int = 24
    patch_size: int = 16
    sh_degree: int = 1
    use_offsets: bool = False
    dtype: jnp.dtype = jnp.float32
    # DPT trunk sizes (scaled down only for tiny test configs)
    feature_dim: int = 256
    layer_dims: Tuple[int, int, int, int] = (96, 192, 384, 768)
    last_dim: int = 128

    @nn.compact
    def __call__(self, hook_tokens, image_size, mode: str = "full") -> dict:
        """hook_tokens: [enc_out, dec6, dec9, dec12] (B, N, C_i).

        mode (TPU runtime split; the reference always runs everything):
        - "full": pts3d DPT + local-features MLP + gaussian DPT.
        - "tracking": skip the gaussian DPT — the per-frame tracking
          path only consumes pts3d/conf/desc/desc_conf; Gaussians are
          materialized lazily (mode="gaussian_only") on keyframe /
          render events, saving ~half the head cost per tracked frame.
        - "gaussian_only": just the gaussian DPT; combine with the
          tracking pass's pts3d via `combine_gaussians`.
        """
        H, W = image_size
        p = self.patch_size
        n_gauss_ch = 3 + 3 + 4 + 3 * self.sh_degree + 1

        if mode == "gaussian_only":
            gauss = DPT(
                num_channels=n_gauss_ch,
                feature_dim=self.feature_dim,
                layer_dims=self.layer_dims,
                last_dim=self.last_dim,
                dtype=self.dtype,
                name="gaussian_dpt",
            )(hook_tokens, image_size)
            return gaussian_postprocess_gauss_only(
                gauss, sh_degree=self.sh_degree
            )

        pts3d = DPT(num_channels=4, feature_dim=self.feature_dim,
                    layer_dims=self.layer_dims, last_dim=self.last_dim,
                    dtype=self.dtype, name="dpt")(
            hook_tokens, image_size
        )

        # local features: MLP over concat(enc, dec) tokens, pixel-shuffled
        cat = jnp.concatenate(
            [hook_tokens[0], hook_tokens[-1]], axis=-1
        ).astype(self.dtype)
        idim = self.enc_dim + self.dec_dim
        odim = (self.local_feat_dim + 1) * p * p  # +1: two_confs desc conf
        h = nn.Dense(4 * idim, dtype=self.dtype, name="hlf_fc1")(cat)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(odim, dtype=self.dtype, name="hlf_fc2")(h)
        B, N, _ = h.shape
        local = h.reshape(B, H // p, W // p, odim)
        local = pixel_shuffle(local, p)  # (B, H, W, 25)

        if mode == "tracking":
            fmap = jnp.concatenate([pts3d, local], axis=-1)
            return gaussian_postprocess_tracking(
                fmap, desc_dim=self.local_feat_dim
            )

        gauss = DPT(
            num_channels=n_gauss_ch,
            feature_dim=self.feature_dim,
            layer_dims=self.layer_dims,
            last_dim=self.last_dim,
            dtype=self.dtype,
            name="gaussian_dpt",
        )(hook_tokens, image_size)

        fmap = jnp.concatenate([pts3d, local, gauss], axis=-1)
        return gaussian_postprocess(
            fmap,
            desc_dim=self.local_feat_dim,
            sh_degree=self.sh_degree,
            use_offsets=self.use_offsets,
        )
