"""Host-side image preprocessing (CPU, feeds the device).

Behavioral spec: reference `splatt3r_slam/splatt3r_utils.py:647-693`
(`resize_img`): long side → 512 (or short side → 224), center-crop to
dimensions that are multiples of 16, square-input 3:4 exception, and
ImgNorm normalization (mean 0.5 / std 0.5, `dust3r/utils/image.py:23`).
"""

from __future__ import annotations

import numpy as np
import PIL.Image


def _resize_pil(img: PIL.Image.Image, long_edge: int) -> PIL.Image.Image:
    S = max(img.size)
    interp = PIL.Image.LANCZOS if S > long_edge else PIL.Image.BICUBIC
    new_size = tuple(int(round(x * long_edge / S)) for x in img.size)
    return img.resize(new_size, interp)


def resize_img(img: np.ndarray, size: int, square_ok: bool = False,
               return_transformation: bool = False) -> dict:
    """img: (H, W, 3) float [0,1] or uint8 → dict with normalized tensor.

    Returns {'img': (1, h, w, 3) float32 in [-1, 1] NHWC,
             'true_shape': [[h, w]] int32,
             'unnormalized_img': (h, w, 3) uint8}.
    """
    # 224 keeps its legacy short-side/square-crop path; any /16 long side is
    # accepted otherwise (512 = production default, small sizes for tests)
    assert size == 224 or size % 16 == 0
    if img.dtype != np.uint8:
        img = np.uint8(np.clip(img, 0, 1) * 255)
    H1_, W1_ = img.shape[:2]
    if (size != 224 and max(H1_, W1_) == size and H1_ % 16 == 0
            and W1_ % 16 == 0 and (square_ok or H1_ != W1_)
            and not return_transformation):
        # Already at the target geometry: the resize is identity and the
        # /16 crop arithmetic keeps every pixel — skip PIL entirely
        # (~40 ms/frame of host time on a loaded core).
        normalized = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
        return dict(
            img=normalized[None],
            true_shape=np.int32([[H1_, W1_]]),
            unnormalized_img=img,
        )
    pim = PIL.Image.fromarray(img)
    W1, H1 = pim.size
    if size == 224:
        pim = _resize_pil(pim, round(size * max(W1 / H1, H1 / W1)))
    else:
        pim = _resize_pil(pim, size)
    W, H = pim.size
    cx, cy = W // 2, H // 2
    if size == 224:
        half = min(cx, cy)
        pim = pim.crop((cx - half, cy - half, cx + half, cy + half))
    else:
        halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
        if not square_ok and W == H:
            halfh = 3 * halfw / 4
        pim = pim.crop((cx - halfw, cy - halfh, cx + halfw, cy + halfh))

    arr = np.asarray(pim)
    normalized = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
    res = dict(
        img=normalized[None],  # (1, h, w, 3) NHWC
        true_shape=np.int32([pim.size[::-1]]),
        unnormalized_img=arr,
    )
    if return_transformation:
        scale_w = W1 / W
        scale_h = H1 / H
        half_crop_w = (W - pim.size[0]) / 2
        half_crop_h = (H - pim.size[1]) / 2
        return res, (scale_w, scale_h, half_crop_w, half_crop_h)
    return res
