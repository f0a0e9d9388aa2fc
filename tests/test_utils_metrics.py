"""Tests for SSIM/PSNR metrics, timing utils, queues, viewer helpers."""

import numpy as np
import jax.numpy as jnp
import pytest

from splatt3r_slam_tpu.utils.metrics import mse, psnr, ssim, ssim_mean
from splatt3r_slam_tpu.utils.queues import FakeQueue, new_queue, try_get_msg
from splatt3r_slam_tpu.utils.timing import Benchmarker, Timer



pytestmark = pytest.mark.smoke
def test_ssim_identical(rng):
    x = jnp.asarray(rng.random((32, 40, 3)), jnp.float32)
    assert float(ssim_mean(x, x)) > 0.999


def test_ssim_matches_torch_style(rng):
    """Cross-check against a scipy-based independent SSIM."""
    from scipy.ndimage import convolve

    x = rng.random((24, 24, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(size=x.shape) * 0.1, 0, 1).astype(np.float32)

    # independent implementation
    k = np.arange(11) - 5
    g = np.exp(-(k**2) / (2 * 1.5**2))
    g /= g.sum()
    W = np.outer(g, g)

    def f(a):
        return convolve(a[..., 0], W, mode="constant")[..., None]

    mu1, mu2 = f(x), f(y)
    s1 = f(x * x) - mu1**2
    s2 = f(y * y) - mu2**2
    s12 = f(x * y) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    want = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1**2 + mu2**2 + C1) * (s1 + s2 + C2)
    )
    got = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    # interiors match (border handling differs: zero-pad both here)
    np.testing.assert_allclose(got[6:-6, 6:-6], want[6:-6, 6:-6], atol=1e-4)


def test_psnr_known_value():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


def test_masked_mse(rng):
    a = jnp.zeros((4, 4, 3))
    b = jnp.ones((4, 4, 3))
    m = jnp.zeros((4, 4)).at[0, 0].set(1.0)
    assert float(mse(a, b, m)) == 1.0


def test_benchmarker(tmp_path):
    bm = Benchmarker()
    with bm.time("op"):
        sum(range(1000))
    with bm.time("op"):
        sum(range(1000))
    s = bm.summarize()
    assert s["op"]["n"] == 2
    bm.dump(tmp_path / "bench.json")
    assert (tmp_path / "bench.json").exists()
    bm.dump_memory(tmp_path / "mem.json")
    assert (tmp_path / "mem.json").exists()


def test_timer():
    t = Timer()
    t.tic()
    x = jnp.ones(8) * 2
    dt = t.toc(sync_on=x, verbose=False)
    assert dt >= 0


def test_queues():
    q = new_queue()
    assert try_get_msg(q) is None
    q.put(5)
    assert try_get_msg(q) == 5
    fq = FakeQueue()
    fq.put(1)
    assert try_get_msg(fq) is None
    assert fq.empty()


def test_viewer_headless(tmp_path, rng):
    """Viewer composes + writes a frame from a populated gaussian pool."""
    from splatt3r_slam_tpu.runtime.visualization import (
        Viewer,
        depth2rgb,
        orbit_pose,
        vfov_to_intrinsics,
        opengl_to_opencv_cam,
    )

    class FakePool:
        n = 64

        def get_all(self):
            means = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
            cov = jnp.tile(jnp.asarray([0.01, 0, 0, 0.01, 0, 0.01]), (64, 1))
            col = jnp.asarray(rng.random((64, 3)), jnp.float32)
            opa = jnp.full((64,), 0.8)
            return means, cov, col, opa

    class FakeKfs(list):
        pass

    class FakeSys:
        pool = FakePool()
        keyframes = FakeKfs()

        class mode:
            name = "TRACKING"

    v = Viewer(FakeSys(), hw=(64, 64), headless=True, out_dir=tmp_path)
    v.update()
    assert (tmp_path / "000000.png").exists()

    # helpers
    K = vfov_to_intrinsics(60, 480, 640)
    assert K[0, 0] == K[1, 1] and K[0, 2] == 320
    T = orbit_pose(np.zeros(3), 2.0, 0.3, 0.2)
    np.testing.assert_allclose(np.linalg.det(T[:3, :3]), 1.0, atol=1e-5)
    Tgl = opengl_to_opencv_cam(np.eye(4))
    np.testing.assert_allclose(np.diag(Tgl), [1, -1, -1, 1])
    rgb = depth2rgb(np.linspace(0, 5, 100).reshape(10, 10))
    assert rgb.shape == (10, 10, 3)
