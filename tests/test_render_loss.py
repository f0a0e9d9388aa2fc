"""Render-loss training: gradients must flow through the rasterizer into
the gaussian DPT heads (the reference's main training mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatt3r_slam_tpu.models import TwoViewConfig
from splatt3r_slam_tpu.parallel import TrainConfig, Trainer
from splatt3r_slam_tpu.parallel.loss_mask import (
    calculate_loss_mask,
    in_frustum_mask,
    unproject,
)
from splatt3r_slam_tpu.parallel.mesh import batch_sharding, make_mesh


@pytest.mark.slow
def test_render_loss_updates_gaussian_heads():
    mesh = make_mesh(1)
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    tcfg = TrainConfig(render_loss=True, ssim_weight=0.1,
                       train_gaussian_heads_only=True, lr=1e-3, k_max=64)
    trainer = Trainer(cfg, tcfg, mesh=mesh)
    h, w = 32, 32
    params, opt_state, pshard = trainer.init_state(h, w)
    step = trainer.make_train_step(pshard)

    rng = np.random.default_rng(0)
    B, V = 1, 1
    eye = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    K = jnp.broadcast_to(
        jnp.array([[40.0, 0, 16], [0, 40, 16], [0, 0, 1]]), (B, V, 3, 3)
    )
    batch = {
        "img1": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "img2": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "context_pose": eye,
        "target_pose": eye[:, None],
        "target_K": K,
        "target_img": jnp.asarray(rng.random((B, V, h, w, 3)), jnp.float32),
    }

    before = np.asarray(params["head1"]["gaussian_dpt"]["head_4"]["kernel"])
    enc_before = np.asarray(params["enc_blocks"]["block"]["attn"]["qkv"]["kernel"])
    params, opt_state, m = step(params, opt_state, batch)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["mse"]))
    after = np.asarray(params["head1"]["gaussian_dpt"]["head_4"]["kernel"])
    assert not np.array_equal(after, before), "no gradient reached gaussians"
    np.testing.assert_array_equal(
        np.asarray(params["enc_blocks"]["block"]["attn"]["qkv"]["kernel"]),
        enc_before,
    )


def test_loss_mask_geometry():
    h, w = 16, 16
    K = jnp.array([[16.0, 0, 8], [0, 16, 8], [0, 0, 1]])
    T = jnp.eye(4)
    depth = jnp.full((h, w), 2.0)
    pts = unproject(depth, K, T)
    # center pixel unprojects near the optical axis
    np.testing.assert_allclose(np.asarray(pts[8, 8, :2]), [0.0625, 0.0625],
                               atol=0.07)
    m = in_frustum_mask(pts, K, T, (h, w))
    assert bool(m.all())
    # context looking the other way sees nothing
    T_back = jnp.diag(jnp.asarray([-1.0, 1.0, -1.0, 1.0]))
    m2 = in_frustum_mask(pts, K, T_back, (h, w))
    assert not bool(m2.any())

    lm = calculate_loss_mask(depth, K, T, K[None], T[None], (h, w))
    assert bool(lm.all())
