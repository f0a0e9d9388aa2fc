"""LPIPS-VGG parity against a self-contained torch oracle.

The torch side reproduces the `lpips.LPIPS('vgg')` computation exactly
(scaling layer, VGG16 slices, channel unit-normalization, 1x1 linear
calibration, spatial upsample / mean) using the SAME random weights, dumped
in the torch state-dict layout that `convert_torch_lpips` consumes — so the
test covers both the math and the converter key mapping.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from splatt3r_slam_tpu.utils.lpips import (  # noqa: E402
    VGG_SLICES,
    convert_torch_lpips,
    lpips,
    lpips_from_01,
    random_params,
)

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _torch_state_dict(seed=0):
    """Random VGG16+lins in the torch lpips full-module key layout."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    slice_base = [0, 4, 9, 16, 23]
    for s, block in enumerate(VGG_SLICES):
        for idx, cin, cout in block:
            w = torch.randn(cout, cin, 3, 3, generator=g) * (
                2.0 / (9 * cin)
            ) ** 0.5
            b = torch.randn(cout, generator=g) * 0.01
            sd[f"net.slice{s + 1}.{idx - slice_base[s]}.weight"] = w
            sd[f"net.slice{s + 1}.{idx - slice_base[s]}.bias"] = b
        lin = torch.rand(1, block[-1][2], 1, 1, generator=g)
        sd[f"lin{s}.model.1.weight"] = lin
    return sd


def _torch_lpips(sd, x0, x1, spatial=False):
    """Faithful torch re-implementation of lpips.LPIPS('vgg').forward."""

    def features(x):
        x = (x - _SHIFT) / _SCALE
        feats = []
        slice_base = [0, 4, 9, 16, 23]
        for s, block in enumerate(VGG_SLICES):
            if s > 0:
                x = F.max_pool2d(x, 2, 2)
            for idx, _, _ in block:
                w = sd[f"net.slice{s + 1}.{idx - slice_base[s]}.weight"]
                b = sd[f"net.slice{s + 1}.{idx - slice_base[s]}.bias"]
                x = F.relu(F.conv2d(x, w, b, padding=1))
            feats.append(x)
        return feats

    f0, f1 = features(x0), features(x1)
    H, W = x0.shape[2], x0.shape[3]
    total = 0.0
    for s in range(5):
        n0 = f0[s] / (f0[s].pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
        n1 = f1[s] / (f1[s].pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
        d = (n0 - n1) ** 2
        m = F.conv2d(d, sd[f"lin{s}.model.1.weight"])  # (B,1,h,w)
        if spatial:
            m = F.interpolate(m, size=(H, W), mode="bilinear",
                              align_corners=False)
        else:
            m = m.mean(dim=(2, 3), keepdim=True)
        total = total + m
    return total


@pytest.fixture(scope="module")
def lpips_pair():
    sd = _torch_state_dict()
    params = convert_torch_lpips({k: v.numpy() for k, v in sd.items()})
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    return sd, params, a, b


def test_lpips_scalar_parity(lpips_pair):
    sd, params, a, b = lpips_pair
    want = _torch_lpips(
        sd, torch.from_numpy(a.transpose(0, 3, 1, 2)),
        torch.from_numpy(b.transpose(0, 3, 1, 2)),
    ).squeeze().numpy()
    got = np.asarray(lpips(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_lpips_spatial_parity(lpips_pair):
    sd, params, a, b = lpips_pair
    want = _torch_lpips(
        sd, torch.from_numpy(a.transpose(0, 3, 1, 2)),
        torch.from_numpy(b.transpose(0, 3, 1, 2)), spatial=True,
    ).squeeze(1).numpy()
    got = np.asarray(
        lpips(params, jnp.asarray(a), jnp.asarray(b), spatial=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_lpips_zero_for_identical(lpips_pair):
    _, params, a, _ = lpips_pair
    got = np.asarray(lpips(params, jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_lpips_from_01_rescales():
    params = random_params()
    rng = np.random.default_rng(1)
    a01 = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    b01 = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    v1 = np.asarray(lpips_from_01(params, a01, b01))
    v2 = np.asarray(lpips(params, a01 * 2 - 1, b01 * 2 - 1))
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_trainer_reports_lpips():
    """Trainer eval step reports a finite LPIPS when given VGG params."""
    from splatt3r_slam_tpu.models import TwoViewConfig
    from splatt3r_slam_tpu.parallel import TrainConfig, Trainer

    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    trainer = Trainer(cfg, TrainConfig(render_loss=True, lpips_weight=0.1),
                      n_devices=1,
                      lpips_params=random_params(channel_scale=8))
    h, w = 16, 16  # minimal: one rasterizer tile; VGG pools to 1px
    params, _, _ = trainer.init_state(h, w)
    rng = np.random.default_rng(0)
    eye = np.eye(4, dtype=np.float32)[None]
    batch = {
        "img1": jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32),
        "img2": jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32),
        "context_pose": jnp.asarray(eye),
        "target_pose": jnp.asarray(eye[:, None]),
        "target_K": jnp.asarray(
            np.array([[[40.0, 0, w / 2], [0, 40.0, h / 2],
                       [0, 0, 1]]], np.float32)[:, None]),
        "target_img": jnp.asarray(rng.uniform(0, 1, (1, 1, h, w, 3)),
                                  jnp.float32),
    }
    import jax

    loss, metrics = jax.jit(trainer.loss_fn)(params, batch)
    assert np.isfinite(float(metrics["lpips"]))
    assert np.isfinite(float(loss))

    ev = trainer.make_eval_step()
    m, _ = ev(params, batch)
    assert np.isfinite(float(m["lpips"]))
