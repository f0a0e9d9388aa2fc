"""Image-space ops: Scharr-like gradients via shifted adds.

Spec: reference `splatt3r_slam/image.py:5-38` (3x3 kernels /32, reflect
padding). Implemented as nine shifted accumulations instead of a grouped
conv — XLA fuses these into a single elementwise pass, which is faster on
the VPU than a tiny grouped convolution for c=3 channels.
"""

from __future__ import annotations

import jax.numpy as jnp

# 3x3 kernel taps: (dy, dx) → (gx weight, gy weight), Scharr-like /32.
_TAPS = [
    (-1, -1, -3.0, -3.0),
    (-1, 0, 0.0, -10.0),
    (-1, 1, 3.0, -3.0),
    (0, -1, -10.0, 0.0),
    (0, 1, 10.0, 0.0),
    (1, -1, -3.0, 3.0),
    (1, 0, 0.0, 10.0),
    (1, 1, 3.0, 3.0),
]


def img_gradient(img: jnp.ndarray):
    """Per-channel x/y gradients of (b, h, w, c) images (NHWC layout).

    Returns (gx, gy), each (b, h, w, c). NHWC (not the reference's NCHW)
    keeps the channel dim minor, which is the TPU-friendly layout.
    """
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    h, w = img.shape[1], img.shape[2]
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    for dy, dx, wx, wy in _TAPS:
        tile = p[:, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w, :]
        if wx:
            gx = gx + (wx / 32.0) * tile
        if wy:
            gy = gy + (wy / 32.0) * tile
    return gx, gy
