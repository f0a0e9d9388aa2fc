"""Trainer eval-step metrics + param save/load round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from splatt3r_slam_tpu.models import TwoViewConfig
from splatt3r_slam_tpu.parallel import TrainConfig, Trainer
from splatt3r_slam_tpu.parallel.mesh import make_mesh


@pytest.mark.slow
def test_eval_step_and_param_roundtrip(tmp_path, rng):
    mesh = make_mesh(1)
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    trainer = Trainer(cfg, TrainConfig(k_max=64), mesh=mesh)
    h, w = 32, 32
    params, opt_state, pshard = trainer.init_state(h, w)
    eval_step = trainer.make_eval_step()

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
    metrics, rendered = eval_step(params, batch)
    assert rendered.shape == (B, V, h, w, 3)
    assert np.isfinite(float(metrics["mse"]))
    assert np.isfinite(float(metrics["psnr"]))
    assert -1.0 <= float(metrics["ssim"]) <= 1.0

    # param persistence round-trip
    trainer.save_params(tmp_path / "params.npz", params)
    p2 = trainer.load_params(tmp_path / "params.npz")
    a = np.asarray(params["decoder_embed"]["kernel"])
    b = np.asarray(p2["decoder_embed"]["kernel"])
    np.testing.assert_array_equal(a, b)
    import jax

    assert len(jax.tree.leaves(p2)) == len(jax.tree.leaves(params))