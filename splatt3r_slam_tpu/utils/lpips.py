"""LPIPS perceptual metric (VGG backbone), TPU-native.

Spec: the reference trains and evaluates with `lpips.LPIPS('vgg',
spatial=...)` (`splatt3r_core/main.py:86-88,220-230`): images are shifted/
scaled per-channel, passed through a VGG16 trunk, features at relu1_2 /
relu2_2 / relu3_3 / relu4_3 / relu5_3 are channel-unit-normalized, squared
differences are reduced by learned 1x1 linear calibration weights, and the
five layer maps are spatially averaged (or, with `spatial=True`, bilinearly
upsampled to the input size and summed) then added.

Weights: the torch `lpips` package composes torchvision's pretrained VGG16
`features.*` with its own `lin{0..4}.model.1.weight` calibration tensors.
`convert_torch_lpips` maps that exact state-dict layout into this module's
param tree; `load_lpips_params(path)` reads a torch file saved from the
reference module (or a dict of the same keys). Without a weights file
(this image has neither torchvision nor lpips), `random_params` gives a
shape-faithful tree so the full computation stays testable; the trainer
only reports LPIPS when real weights are supplied.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, in_channels) per conv, maxpool between
# blocks. torchvision `features` indices of each conv layer, grouped by
# the LPIPS slice that consumes the block's final ReLU.
VGG_SLICES = (
    ((0, 3, 64), (2, 64, 64)),
    ((5, 64, 128), (7, 128, 128)),
    ((10, 128, 256), (12, 256, 256), (14, 256, 256)),
    ((17, 256, 512), (19, 512, 512), (21, 512, 512)),
    ((24, 512, 512), (26, 512, 512), (28, 512, 512)),
)
LIN_CHANNELS = (64, 128, 256, 512, 512)

# lpips.ScalingLayer constants (ImageNet statistics in [-1, 1] space)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def random_params(seed: int = 0, channel_scale: int = 1) -> dict:
    """Shape-faithful random parameter tree (tests / dry runs).

    channel_scale > 1 divides every channel count (min 4) — the runtime
    (`_vgg_features`/`lpips`) reads layer widths from the tree, so a
    scaled-down net exercises the identical code path at a fraction of
    the compile/compute cost."""
    rng = np.random.default_rng(seed)

    def ch(c):
        return max(4, c // channel_scale)

    params = {"convs": [], "lins": []}
    for s, block in enumerate(VGG_SLICES):
        convs = []
        for i, (_, cin, cout) in enumerate(block):
            cin_s = 3 if (s == 0 and i == 0) else ch(cin)
            w = rng.standard_normal((3, 3, cin_s, ch(cout))).astype(
                np.float32)
            w *= np.sqrt(2.0 / (9 * cin_s))
            b = np.zeros(ch(cout), np.float32)
            convs.append({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)})
        params["convs"].append(convs)
        lin = rng.uniform(0, 1, (ch(LIN_CHANNELS[s]),)).astype(np.float32)
        params["lins"].append(jnp.asarray(lin))
    return params


def convert_torch_lpips(sd: dict) -> dict:
    """torch `lpips.LPIPS('vgg')` state dict → param tree.

    Accepts either full-module keys (`net.slice{k}.{i}.weight`,
    `lin{k}.model.1.weight`) or raw torchvision keys
    (`features.{i}.weight`) plus `lin{k}` tensors."""

    def fetch(names):
        for n in names:
            if n in sd:
                v = sd[n]
                return np.asarray(
                    v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                    np.float32,
                )
        raise KeyError(f"none of {names} in state dict")

    params = {"convs": [], "lins": []}
    slice_base = [0, 4, 9, 16, 23]  # first features-index of each slice
    for s, block in enumerate(VGG_SLICES):
        convs = []
        for idx, _, _ in block:
            w = fetch([
                f"net.slice{s + 1}.{idx - slice_base[s]}.weight",
                f"features.{idx}.weight",
                f"net.features.{idx}.weight",
            ])
            b = fetch([
                f"net.slice{s + 1}.{idx - slice_base[s]}.bias",
                f"features.{idx}.bias",
                f"net.features.{idx}.bias",
            ])
            # torch OIHW → lax HWIO
            convs.append({
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b),
            })
        params["convs"].append(convs)
        lin = fetch([f"lin{s}.model.1.weight", f"lins.{s}.model.1.weight"])
        params["lins"].append(jnp.asarray(lin.reshape(-1)))
    return params


def load_lpips_params(path: str) -> dict:
    """Load LPIPS weights: a `.npz` written by scripts/convert_lpips.py
    (torch-free), or a torch-saved LPIPS module/state-dict file."""
    if str(path).endswith(".npz"):
        z = np.load(path)
        params = {"convs": [], "lins": []}
        for s, block in enumerate(VGG_SLICES):
            params["convs"].append([
                {"kernel": jnp.asarray(z[f"conv_{s}_{c}_kernel"]),
                 "bias": jnp.asarray(z[f"conv_{s}_{c}_bias"])}
                for c in range(len(block))
            ])
            params["lins"].append(jnp.asarray(z[f"lin_{s}"]))
        return params

    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return convert_torch_lpips(obj)


def _conv(x, p):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"]


def _vgg_features(params, x):
    """x: (B, H, W, 3) in scaled space → 5 post-ReLU feature maps."""
    feats = []
    for s, convs in enumerate(params["convs"]):
        if s > 0:  # maxpool 2x2/2 between blocks
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
        for p in convs:
            x = jax.nn.relu(_conv(x, p))
        feats.append(x)
    return feats


def _unit_norm(f, eps=1e-10):
    return f * jax.lax.rsqrt(jnp.sum(f * f, -1, keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=("spatial",))
def lpips(params, img0, img1, spatial: bool = False):
    """LPIPS distance between (B, H, W, 3) images in [-1, 1].

    spatial=False → (B,); spatial=True → (B, H, W) per-pixel map (layer
    maps bilinearly upsampled to input size, matching
    `lpips.upsample(..., mode='bilinear', align_corners=False)`)."""
    img0 = jnp.asarray(img0, jnp.float32)
    img1 = jnp.asarray(img1, jnp.float32)
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    f0 = _vgg_features(params, (img0 - shift) / scale)
    f1 = _vgg_features(params, (img1 - shift) / scale)
    B, H, W = img0.shape[0], img0.shape[1], img0.shape[2]
    total = (jnp.zeros((B, H, W), jnp.float32) if spatial
             else jnp.zeros((B,), jnp.float32))
    for s in range(len(f0)):
        d = (_unit_norm(f0[s]) - _unit_norm(f1[s])) ** 2
        m = jnp.einsum("bhwc,c->bhw", d, params["lins"][s])
        if spatial:
            m = jax.image.resize(m, (B, H, W), method="bilinear")
        else:
            m = jnp.mean(m, axis=(1, 2))
        total = total + m
    return total


def lpips_from_01(params, img0_01, img1_01, spatial: bool = False):
    """`normalize=True` entry point: inputs in [0, 1] (reference
    `main.py:221` calls the criterion with normalize=True)."""
    return lpips(params, img0_01 * 2.0 - 1.0, img1_01 * 2.0 - 1.0,
                 spatial=spatial)
