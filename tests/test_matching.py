"""Tests for iterative-projection matching and descriptor refinement.

Oracle: synthetic ray images with known correspondence (identity, pure
pixel shifts) and descriptor fields with a planted argmax.
"""

import pytest

import jax.numpy as jnp
import numpy as np

from splatt3r_slam_tpu.ops.image import img_gradient
from splatt3r_slam_tpu.ops.matching import (

    iter_proj,
    lin_to_pixel,
    match,
    pixel_to_lin,
    prep_rays_with_grad,
    refine_matches,
)

pytestmark = pytest.mark.smoke


def _synthetic_pointmap(h, w, fx=100.0, seed=0):
    """Smooth positive-depth pointmap resembling a backprojected depth map."""
    rng = np.random.default_rng(seed)
    u, v = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    z = 2.0 + 0.5 * np.sin(u / 17.0) * np.cos(v / 13.0)
    x = (u - w / 2) / fx * z
    y = (v - h / 2) / fx * z
    X = np.stack([x, y, z], axis=-1).astype(np.float32)
    return X


def test_img_gradient_linear_ramp():
    h, w = 16, 24
    u = np.arange(w, dtype=np.float32)[None, :].repeat(h, 0)
    img = jnp.asarray(u[None, :, :, None])
    gx, gy = img_gradient(img)
    # interior gradient of a unit ramp in x is 1 (kernel normalized by /32)
    np.testing.assert_allclose(np.asarray(gx[0, 4:-4, 4:-4, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy[0, 4:-4, 4:-4, 0]), 0.0, atol=1e-5)


def test_iter_proj_identity():
    h, w = 32, 48
    X = _synthetic_pointmap(h, w)
    rays_img = prep_rays_with_grad(jnp.asarray(X[None]))
    pts = X.reshape(1, -1, 3)
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    idx = np.arange(h * w, dtype=np.int32)[None]
    p_init = np.stack([idx[0] % w, idx[0] // w], axis=-1)[None].astype(np.float32)
    p, conv = iter_proj(rays_img, jnp.asarray(pts), jnp.asarray(p_init))
    p = np.asarray(p)
    # identity initialization at the optimum: no motion (interior pixels)
    interior = (p_init[0, :, 0] > 2) & (p_init[0, :, 0] < w - 3) & \
               (p_init[0, :, 1] > 2) & (p_init[0, :, 1] < h - 3)
    np.testing.assert_allclose(p[0][interior], p_init[0][interior], atol=0.35)
    assert np.asarray(conv)[0][interior].mean() > 0.95


def test_iter_proj_recovers_shift():
    """Query rays shifted by 3 px in u should converge ~3 px away."""
    h, w = 32, 48
    X = _synthetic_pointmap(h, w)
    rays_img = prep_rays_with_grad(jnp.asarray(X[None]))
    shift = 3
    Xq = np.roll(X, -shift, axis=1)  # query pixel (u) corresponds to u+shift
    pts = Xq.reshape(1, -1, 3)
    pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    u0, v0 = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    p_init = np.stack([u0, v0], axis=-1).reshape(1, -1, 2).astype(np.float32)
    p, conv = iter_proj(rays_img, jnp.asarray(pts), jnp.asarray(p_init),
                        max_iter=20)
    p = np.asarray(p).reshape(h, w, 2)
    interior = np.zeros((h, w), bool)
    interior[5:-5, 8 : w - 8 - shift] = True
    err = np.abs(p[..., 0] - (u0 + shift))[interior]
    assert np.median(err) < 0.5, np.median(err)


def test_refine_matches_finds_planted_peak(rng):
    b, h, w, f = 1, 24, 32, 8
    target = rng.normal(size=(f,)).astype(np.float32)
    target /= np.linalg.norm(target)
    # smooth unimodal score field peaked at (u=20, v=10): the coarse-to-fine
    # dilation walk provably ascends it (this is the real-data regime)
    u, v = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    g = np.exp(-((u - 20.0) ** 2 + (v - 10.0) ** 2) / 50.0).astype(np.float32)
    D11 = (g[..., None] * target)[None]  # (1, h, w, f)
    D21 = target[None, None].repeat(1, axis=0)  # (1, 1, f)
    p1 = np.array([[[14, 7]]], dtype=np.int32)  # within radius*dilation reach
    p_new = refine_matches(
        jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p1), radius=3,
        dilation_max=5
    )
    assert tuple(np.asarray(p_new)[0, 0]) == (20, 10)


def test_pixel_lin_roundtrip(rng):
    w = 37
    idx = jnp.asarray(rng.integers(0, w * 20, size=(4, 100)))
    p = lin_to_pixel(idx, w)
    np.testing.assert_array_equal(np.asarray(pixel_to_lin(p, w)), np.asarray(idx))


def test_match_end_to_end_identity():
    h, w = 24, 32
    X = _synthetic_pointmap(h, w)
    rng = np.random.default_rng(1)
    # smooth distinctive descriptors
    D = rng.normal(size=(h, w, 8)).astype(np.float32)
    D = D / np.linalg.norm(D, axis=-1, keepdims=True)
    idx, valid = match(
        jnp.asarray(X[None]),
        jnp.asarray(X[None]),
        jnp.asarray(D[None]),
        jnp.asarray(D[None]),
        None,
        radius=1,
        dilation_max=1,
    )
    idx = np.asarray(idx).reshape(h, w)
    want = np.arange(h * w).reshape(h, w)
    interior = np.zeros((h, w), bool)
    interior[3:-3, 3:-3] = True
    agree = (idx == want)[interior].mean()
    assert agree > 0.9, agree
    assert np.asarray(valid).mean() > 0.8
