"""Pallas tile-compositing kernel vs the XLA rasterizer (interpret mode).

On CPU the kernel runs through the Pallas interpreter; on TPU the same
code compiles through Mosaic. Output must match the XLA tile renderer.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from splatt3r_slam_tpu.splat.gaussians import build_covariance, cov_to_triu
from splatt3r_slam_tpu.splat.pallas_rasterizer import render_tiles_pallas
from splatt3r_slam_tpu.splat.rasterizer import render_bruteforce, render_tiles

K = jnp.array([[80.0, 0, 32], [0, 80, 32], [0, 0, 1]])
VIEW = jnp.eye(4)
HW = (64, 64)


def _scene(rng, G=180):
    means = rng.normal(size=(G, 3)).astype(np.float32) * 2.0
    means[:, 2] = np.abs(means[:, 2]) + 4.0
    scales = (0.05 + 0.1 * rng.random((G, 3))).astype(np.float32)
    q = rng.normal(size=(G, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    covt = cov_to_triu(build_covariance(jnp.asarray(scales), jnp.asarray(q)))
    colors = rng.random((G, 3)).astype(np.float32)
    opa = (0.3 + 0.7 * rng.random(G)).astype(np.float32)
    return jnp.asarray(means), covt, jnp.asarray(colors), jnp.asarray(opa)


def test_pallas_matches_xla(rng):
    means, covt, colors, opa = _scene(rng)
    a = np.asarray(
        render_tiles_pallas(means, covt, colors, opa, VIEW, K, HW,
                            interpret=True)
    )
    b = np.asarray(render_tiles(means, covt, colors, opa, VIEW, K, HW,
                                k_max=512))
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_pallas_matches_bruteforce(rng):
    means, covt, colors, opa = _scene(rng, G=120)
    a = np.asarray(
        render_tiles_pallas(means, covt, colors, opa, VIEW, K, HW,
                            interpret=True)
    )
    b = np.asarray(render_bruteforce(means, covt, colors, opa, VIEW, K, HW))
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_pallas_background(rng):
    means = jnp.zeros((1, 3)).at[0, 2].set(-1.0)
    covt = cov_to_triu(jnp.eye(3)[None] * 0.01)
    img = np.asarray(
        render_tiles_pallas(means, covt, jnp.ones((1, 3)), jnp.ones(1),
                            VIEW, K, HW, bg=jnp.array([0.1, 0.2, 0.3]),
                            interpret=True)
    )
    np.testing.assert_allclose(
        img, np.broadcast_to([0.1, 0.2, 0.3], img.shape), atol=1e-5
    )


def test_pallas_many_gaussians_one_tile(rng):
    """Segment longer than one DMA chunk exercises the chunk loop."""
    G = 400
    means = np.zeros((G, 3), np.float32)
    means[:, 0] = rng.normal(size=G) * 0.02
    means[:, 1] = rng.normal(size=G) * 0.02
    means[:, 2] = np.linspace(2.0, 6.0, G)
    covt = cov_to_triu(jnp.broadcast_to(jnp.eye(3) * 1e-4, (G, 3, 3)))
    colors = jnp.asarray(rng.random((G, 3)), jnp.float32)
    opa = jnp.full((G,), 0.05)
    a = np.asarray(
        render_tiles_pallas(jnp.asarray(means), covt, colors, opa, VIEW, K,
                            HW, interpret=True)
    )
    b = np.asarray(render_tiles(jnp.asarray(means), covt, colors, opa, VIEW,
                                K, HW, k_max=512))
    np.testing.assert_allclose(a, b, atol=3e-3)
