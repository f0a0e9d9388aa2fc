"""DecoderSplatting batch-render smoke + consistency tests."""

import jax.numpy as jnp
import numpy as np

from splatt3r_slam_tpu.splat.decoder import (
    DecoderSplatting,
    get_fov,
    get_projection_matrix,
    render_frame,
)
from splatt3r_slam_tpu.splat.gaussians import build_covariance


def test_get_fov():
    Kn = jnp.array([[1.0, 0, 0.5], [0, 0.5, 0.5], [0, 0, 1]])
    fov = np.asarray(get_fov(Kn))
    np.testing.assert_allclose(fov[0], 2 * np.arctan(0.5), atol=1e-6)
    np.testing.assert_allclose(fov[1], 2 * np.arctan(1.0), atol=1e-6)


def test_projection_matrix_maps_frustum():
    near = jnp.asarray(0.1)
    far = jnp.asarray(100.0)
    P = np.asarray(get_projection_matrix(near, far, jnp.asarray(np.pi / 2),
                                         jnp.asarray(np.pi / 2)))
    # point on near plane center → z' = 0 after perspective divide
    p = P @ np.array([0, 0, 0.1, 1.0])
    np.testing.assert_allclose(p[2] / p[3], 0.0, atol=1e-6)
    # far plane → 1
    p = P @ np.array([0, 0, 100.0, 1.0])
    np.testing.assert_allclose(p[2] / p[3], 1.0, atol=1e-5)


def _pred(rng, B, h, w, cross=False):
    means = rng.normal(size=(B, h, w, 3)).astype(np.float32)
    means[..., 2] = np.abs(means[..., 2]) + 3.0
    scales = np.full((B, h, w, 3), 0.05, np.float32)
    rot = np.zeros((B, h, w, 4), np.float32)
    rot[..., 3] = 1.0
    cov = build_covariance(jnp.asarray(scales), jnp.asarray(rot))
    sh = rng.normal(size=(B, h, w, 3, 1)).astype(np.float32) * 0.2
    opa = np.full((B, h, w, 1), 0.8, np.float32)
    key = "means_in_other_view" if cross else "means"
    return {
        key: jnp.asarray(means),
        "covariances": cov,
        "sh": jnp.asarray(sh),
        "opacities": jnp.asarray(opa),
    }


def test_decoder_splatting_shapes(rng):
    B, h, w = 1, 32, 32
    pred1 = _pred(rng, B, h, w)
    pred2 = _pred(rng, B, h, w, cross=True)
    pose = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    K = jnp.broadcast_to(
        jnp.array([[40.0, 0, 16], [0, 40, 16], [0, 0, 1]]), (B, 3, 3)
    )
    batch = {
        "context": [{"camera_pose": pose}],
        "target": [{"camera_pose": pose, "camera_intrinsics": K}],
    }
    dec = DecoderSplatting(k_max=128)
    color, _ = dec(batch, pred1, pred2, (h, w))
    assert color.shape == (B, 1, 3, h, w)
    c = np.asarray(color)
    assert np.isfinite(c).all()
    assert c.max() > 0.05  # something rendered


def test_render_frame_facade(rng):
    from splatt3r_slam_tpu.runtime.frame import Frame
    from splatt3r_slam_tpu.lie import sim3

    h, w = 32, 32
    img = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32) * 2 - 1

    def gp():
        p = _pred(rng, 1, h, w)
        p["conf"] = jnp.ones((1, h, w))
        p["rotations"] = jnp.zeros((1, h, w, 4)).at[..., 3].set(1.0)
        p["scales"] = jnp.full((1, h, w, 3), 0.05)
        return p

    f = Frame(0, img, np.int32([[h, w]]), np.int32([[h, w]]),
              np.zeros((h, w, 3), np.float32))
    f.gaussian_pred = gp()
    f.gaussian_pred_cross = gp()
    out = render_frame(f, f, k_max=128)
    assert out.shape == (h, w, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_render_depth_modes():
    """render_depth (cuda_splatting.py:227-269 parity): one opaque
    gaussian at z=2 renders ~2 at its center pixel; modes transform it."""
    import jax.numpy as jnp

    from splatt3r_slam_tpu.splat.decoder import render_depth

    hw = (32, 32)
    K = jnp.asarray([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]])
    view = jnp.eye(4)
    means = jnp.asarray([[0.0, 0.0, 2.0]])
    cov = jnp.asarray([[0.04, 0, 0, 0.04, 0, 0.04]])
    opa = jnp.asarray([1.0])

    d = render_depth(means, cov, opa, view, K, hw)
    assert abs(float(d[16, 16]) - 2.0) < 0.05
    disp = render_depth(means, cov, opa, view, K, hw, mode="disparity")
    assert abs(float(disp[16, 16]) - 0.5) < 0.02
    logd = render_depth(means, cov, opa, view, K, hw, mode="log")
    assert abs(float(logd[16, 16]) - float(jnp.log(2.0))) < 0.03
    rel = render_depth(means, cov, opa, view, K, hw,
                       mode="relative_disparity", near=1.0, far=4.0)
    # disparity 0.5 between near-disp 1.0 and far-disp 0.25 → 2/3
    assert abs(float(rel[16, 16]) - 2.0 / 3.0) < 0.03
