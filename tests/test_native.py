"""Native preprocessing library: build, correctness vs cv2/PIL paths."""

import numpy as np
import pytest

from splatt3r_slam_tpu import native



pytestmark = pytest.mark.smoke
@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_resize_matches_cv2(lib_ok, rng):
    import cv2

    img = (rng.random((97, 133, 3)) * 255).astype(np.uint8)
    rh, rw = 48, 64
    norm, u8 = native.resize_crop_normalize(img, rh, rw, rh, rw)
    ref = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LINEAR)
    # same sampling convention → near-identical (rounding only)
    assert np.abs(u8.astype(int) - ref.astype(int)).mean() < 1.0
    np.testing.assert_allclose(
        norm, (u8.astype(np.float32) / 255 - 0.5) / 0.5 + 0, atol=0.01
    )


def test_center_crop(lib_ok, rng):
    img = (rng.random((100, 100, 3)) * 255).astype(np.uint8)
    norm, u8 = native.resize_crop_normalize(img, 100, 100, 60, 80)
    assert u8.shape == (60, 80, 3)
    np.testing.assert_array_equal(u8, img[20:80, 10:90])


def test_resize_img_native_geometry(lib_ok, rng):
    """Same output geometry as the PIL reference pipeline."""
    from splatt3r_slam_tpu.utils.image import resize_img

    # smooth image: resampling filters (bilinear vs LANCZOS) agree closely
    yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
    img = np.stack([np.sin(xx / 40), np.cos(yy / 30),
                    np.sin((xx + yy) / 50)], -1) * 0.5 + 0.5
    fast = native.resize_img_native(img, 512)
    ref = resize_img(img, 512)
    assert fast["img"].shape == ref["img"].shape
    assert (fast["true_shape"] == ref["true_shape"]).all()
    d = np.abs(fast["img"] - ref["img"]).mean()
    assert d < 0.02, d
