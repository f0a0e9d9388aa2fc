"""Numerical parity of flax layers vs torch primitives.

These tests pin the weight-conversion conventions (transposes, padding,
align-corners resampling, pixel shuffle, GELU flavor) against torch ops —
the same primitives the reference model is built from — so that a converted
checkpoint is bit-faithful up to fp32 rounding.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import flax.linen as fnn  # noqa: E402

from splatt3r_slam_tpu.models import checkpoint as ckpt  # noqa: E402
from splatt3r_slam_tpu.models.layers import (  # noqa: E402
    bilinear_resize_ac,
    pixel_shuffle,
)


def _np(t):
    return t.detach().numpy()


def _sd(mod):
    return {k: _np(v) for k, v in mod.state_dict().items()}


def test_dense_matches_linear(rng):
    lin = torch.nn.Linear(12, 7)
    x = rng.normal(size=(3, 12)).astype(np.float32)
    want = _np(lin(torch.from_numpy(x)))
    dense = fnn.Dense(7)
    p = ckpt._lin(_sd(lin))
    got = dense.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_layernorm_matches(rng):
    ln = torch.nn.LayerNorm(16, eps=1e-6)
    with torch.no_grad():
        ln.weight.copy_(torch.rand(16))
        ln.bias.copy_(torch.rand(16))
    x = rng.normal(size=(4, 16)).astype(np.float32)
    want = _np(ln(torch.from_numpy(x)))
    got = fnn.LayerNorm(epsilon=1e-6).apply(
        {"params": ckpt._ln(_sd(ln))}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.parametrize("stride,pad", [(1, 1), (2, 1), (16, 0)])
def test_conv_matches(rng, stride, pad):
    k = 3 if pad == 1 else 16
    conv = torch.nn.Conv2d(5, 8, k, stride=stride, padding=pad)
    x = rng.normal(size=(2, 5, 32, 32)).astype(np.float32)
    want = _np(conv(torch.from_numpy(x))).transpose(0, 2, 3, 1)
    fc = fnn.Conv(8, (k, k), strides=(stride, stride),
                  padding="VALID" if pad == 0 else pad)
    got = fc.apply({"params": ckpt._conv(_sd(conv))},
                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("k,s", [(4, 4), (2, 2)])
def test_conv_transpose_matches(rng, k, s):
    convt = torch.nn.ConvTranspose2d(6, 9, k, stride=s)
    x = rng.normal(size=(2, 6, 8, 10)).astype(np.float32)
    want = _np(convt(torch.from_numpy(x))).transpose(0, 2, 3, 1)
    fc = fnn.ConvTranspose(9, (k, k), strides=(s, s), padding="VALID",
                           transpose_kernel=True)
    got = fc.apply({"params": ckpt._convT(_sd(convt))},
                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_pixel_shuffle_matches(rng):
    r = 4
    x = rng.normal(size=(2, 3 * r * r, 5, 7)).astype(np.float32)
    want = _np(torch.pixel_shuffle(torch.from_numpy(x), r)).transpose(0, 2, 3, 1)
    got = pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), r)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


@pytest.mark.parametrize("shape_out", [(16, 20), (17, 23), (32, 32)])
def test_bilinear_align_corners_matches(rng, shape_out):
    x = rng.normal(size=(2, 3, 8, 10)).astype(np.float32)
    want = _np(
        torch.nn.functional.interpolate(
            torch.from_numpy(x), size=shape_out, mode="bilinear",
            align_corners=True,
        )
    ).transpose(0, 2, 3, 1)
    got = bilinear_resize_ac(jnp.asarray(x.transpose(0, 2, 3, 1)), shape_out)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gelu_matches(rng):
    x = rng.normal(size=(100,)).astype(np.float32)
    want = _np(torch.nn.functional.gelu(torch.from_numpy(x)))
    got = fnn.gelu(jnp.asarray(x), approximate=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_rope2d_matches_reference_formula(rng):
    """RoPE2D vs an independent torch implementation of the published
    rotate-half formula (pos_embed.py:110-159 semantics)."""
    from splatt3r_slam_tpu.models.layers import apply_rope2d, rope_cos_sin

    B, N, H, D = 2, 12, 3, 16
    tokens = rng.normal(size=(B, H, N, D)).astype(np.float32)
    pos = rng.integers(0, 9, size=(B, N, 2))

    # torch oracle
    t = torch.from_numpy(tokens)
    base = 100.0
    Dh = D // 2
    inv_freq = 1.0 / (base ** (torch.arange(0, Dh, 2).float() / Dh))
    tt = torch.arange(16).float()
    freqs = torch.einsum("i,j->ij", tt, inv_freq)
    freqs = torch.cat((freqs, freqs), dim=-1)
    cos_t, sin_t = freqs.cos(), freqs.sin()

    def rot_half(x):
        x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2 :]
        return torch.cat((-x2, x1), dim=-1)

    def rope1d(tok, pos1d):
        c = torch.nn.functional.embedding(pos1d, cos_t)[:, None, :, :]
        s = torch.nn.functional.embedding(pos1d, sin_t)[:, None, :, :]
        return tok * c + rot_half(tok) * s

    y, x_ = t.chunk(2, dim=-1)
    ptorch = torch.from_numpy(pos)
    y = rope1d(y, ptorch[:, :, 0])
    x_ = rope1d(x_, ptorch[:, :, 1])
    want = torch.cat((y, x_), dim=-1).numpy()  # (B, H, N, D)

    cos, sin = rope_cos_sin(jnp.asarray(pos), Dh)
    got = apply_rope2d(
        jnp.asarray(tokens.transpose(0, 2, 1, 3)), cos, sin
    )  # ours: (B, N, H, D)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1, 3), want, atol=1e-5
    )
