"""Image-quality metrics: SSIM (optionally masked), PSNR, MSE.

Parity: `splatt3r_core/utils/compute_ssim.py:1-26` (11x11 Gaussian window,
standard C1/C2 constants, optional mask averaging) and the PSNR-from-MSE
logging in `splatt3r_core/main.py:249-262`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11):
    """Per-pixel SSIM map of (..., H, W, C) images in [0, 1]."""
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    w = _gaussian_window(window_size)
    pad = window_size // 2

    def filt(x):
        # depthwise gaussian blur via conv_general_dilated
        c = x.shape[-1]
        k = jnp.tile(w[:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
        squeeze = True
    else:
        squeeze = False

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    )
    return m[0] if squeeze else m


def ssim_mean(img1, img2, mask=None, window_size: int = 11):
    """Scalar SSIM, optionally averaged over a validity mask
    (compute_ssim.py masked path)."""
    m = ssim(img1, img2, window_size)
    if mask is None:
        return m.mean()
    mask = jnp.broadcast_to(mask[..., None], m.shape)
    return (m * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def mse(img1, img2, mask=None):
    d = (img1 - img2) ** 2
    if mask is None:
        return d.mean()
    mask = jnp.broadcast_to(mask[..., None], d.shape)
    return (d * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def psnr_from_mse(m):
    """PSNR in dB (main.py:249-262 convention, images in [0, 1])."""
    return -10.0 * jnp.log10(jnp.maximum(m, 1e-12))


def psnr(img1, img2, mask=None):
    return psnr_from_mse(mse(img1, img2, mask))
