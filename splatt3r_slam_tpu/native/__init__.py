"""ctypes bindings for the native host preprocessing library.

Builds `libimpre.so` on first use (g++ is in the image); falls back to
None when the toolchain is unavailable so callers can keep the PIL path.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _DIR / "libimpre.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.resize_crop_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def resize_crop_normalize(img_u8: np.ndarray, rh: int, rw: int,
                          ch: int, cw: int):
    """uint8 (H, W, 3) → (normalized float32 (ch, cw, 3), uint8 crop).

    Resize to (rh, rw) bilinear (half-pixel centers), center-crop to
    (ch, cw), ImgNorm normalize — all in one native pass.
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    sh, sw = img_u8.shape[:2]
    out = np.empty((ch, cw, 3), np.float32)
    out_u8 = np.empty((ch, cw, 3), np.uint8)
    lib.resize_crop_normalize(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw,
        rh, rw, ch, cw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, out_u8


def resize_img_native(img: np.ndarray, size: int):
    """Drop-in fast path for utils.image.resize_img (landscape/portrait).

    Matches the reference geometry: long side → `size`, center crop to
    /16 multiples (square→3:4 exception), ImgNorm normalization.
    """
    if img.dtype != np.uint8:
        img = np.uint8(np.clip(img, 0, 1) * 255)
    H1, W1 = img.shape[:2]
    scale = size / max(W1, H1)
    rw, rh = int(round(W1 * scale)), int(round(H1 * scale))
    cx, cy = rw // 2, rh // 2
    halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
    if rw == rh:
        halfh = int(3 * halfw / 4)
    cw, ch = 2 * halfw, 2 * halfh
    norm, u8 = resize_crop_normalize(img, rh, rw, ch, cw)
    return dict(
        img=norm[None],
        true_shape=np.int32([[ch, cw]]),
        unnormalized_img=u8,
    )
