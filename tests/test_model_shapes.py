"""Shape/sanity tests for the two-view model on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatt3r_slam_tpu.models import Splatt3RModel, TwoViewConfig, init_model


@pytest.fixture(scope="module")
def tiny_model():
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    h, w = 32, 48
    model, params = init_model(cfg, h, w)
    return cfg, model, params, h, w


def test_forward_shapes(tiny_model):
    cfg, model, params, h, w = tiny_model
    img = jnp.zeros((1, h, w, 3))
    res1, res2 = model.apply({"params": params}, img, img)
    for res in (res1, res2):
        assert res["pts3d"].shape == (1, h, w, 3)
        assert res["conf"].shape == (1, h, w)
        assert res["desc"].shape == (1, h, w, 24)
        assert res["desc_conf"].shape == (1, h, w)
        assert res["means"].shape == (1, h, w, 3)
        assert res["scales"].shape == (1, h, w, 3)
        assert res["rotations"].shape == (1, h, w, 4)
        assert res["sh"].shape == (1, h, w, 3, 1)
        assert res["opacities"].shape == (1, h, w, 1)


def test_activation_ranges(tiny_model):
    cfg, model, params, h, w = tiny_model
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))
    res1, _ = model.apply({"params": params}, img, img)
    conf = np.asarray(res1["conf"])
    assert (conf >= 1.0).all()  # conf = 1 + exp(x)
    desc = np.asarray(res1["desc"])
    np.testing.assert_allclose(np.linalg.norm(desc, axis=-1), 1.0, atol=1e-4)
    rot = np.asarray(res1["rotations"])
    np.testing.assert_allclose(np.linalg.norm(rot, axis=-1), 1.0, atol=1e-3)
    opa = np.asarray(res1["opacities"])
    assert ((opa > 0) & (opa < 1)).all()
    assert (np.asarray(res1["scales"]) > 0).all()


def test_encoder_cache_equivalence(tiny_model):
    """encode → decode → head must equal the fused __call__ path."""
    cfg, model, params, h, w = tiny_model
    rng = np.random.default_rng(1)
    img1 = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))

    res1_full, res2_full = model.apply({"params": params}, img1, img2)

    f1, p1 = model.apply({"params": params}, img1, method=model.encode)
    f2, p2 = model.apply({"params": params}, img2, method=model.encode)
    d1, d2 = model.apply({"params": params}, f1, p1, f2, p2,
                         method=model.decode)
    res1 = model.apply({"params": params}, 1, d1, (h, w),
                       method=model.apply_head)
    np.testing.assert_allclose(
        np.asarray(res1["pts3d"]), np.asarray(res1_full["pts3d"]), atol=1e-5
    )


def test_batched_pair(tiny_model):
    cfg, model, params, h, w = tiny_model
    img = jnp.zeros((3, h, w, 3))
    res1, _ = model.apply({"params": params}, img, img)
    assert res1["pts3d"].shape[0] == 3
