"""Jacobian/finite-difference tests for projective geometry and robust ops."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from splatt3r_slam_tpu.geometry import (

    backproject,
    check_convergence,
    constrain_points_to_ray,
    get_pixel_coords,
    huber,
    point_to_ray_dist,
    project_calib,
    tukey,
)

pytestmark = pytest.mark.smoke


def test_point_to_ray_dist_jacobian(rng):
    X = jnp.asarray(rng.normal(size=(10, 3)) + 3.0, dtype=jnp.float32)
    rd, J = point_to_ray_dist(X, jacobian=True)
    J_auto = jax.vmap(jax.jacfwd(lambda p: point_to_ray_dist(p)))(X)
    np.testing.assert_allclose(J, J_auto, atol=1e-5)
    np.testing.assert_allclose(
        rd[:, 3], np.linalg.norm(np.asarray(X), axis=-1), rtol=1e-5
    )


def test_project_calib_jacobian(rng):
    K = jnp.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]])
    P = jnp.asarray(rng.normal(size=(20, 3)), dtype=jnp.float32)
    P = P.at[:, 2].set(jnp.abs(P[:, 2]) + 0.5)
    pz, J, valid = project_calib(P, K, (240, 320), jacobian=True)
    J_auto = jax.vmap(
        jax.jacfwd(lambda p: project_calib(p, K, (240, 320))[0])
    )(P)
    np.testing.assert_allclose(J, J_auto, atol=1e-3, rtol=1e-4)


def test_project_invalid_z():
    K = jnp.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]])
    P = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 2.0]])
    pz, valid = project_calib(P, K, (240, 320))
    assert not bool(valid[0, 0])
    assert bool(valid[1, 0])
    assert np.isfinite(np.asarray(pz)).all()
    np.testing.assert_allclose(pz[0, 2], 0.0)  # masked logz


def test_backproject_project_roundtrip(rng):
    K = jnp.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]])
    uv = jnp.asarray(rng.uniform(10, 200, size=(15, 2)), dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(0.5, 5.0, size=(15, 1)), dtype=jnp.float32)
    P = backproject(uv, z, K)
    pz, valid = project_calib(P, K, (240, 320))
    np.testing.assert_allclose(pz[:, :2], uv, atol=1e-3)
    np.testing.assert_allclose(pz[:, 2], np.log(np.asarray(z[:, 0])), atol=1e-4)


def test_constrain_points_to_ray(rng):
    K = jnp.array([[100.0, 0, 32], [0, 100, 24], [0, 0, 1]])
    h, w = 48, 64
    X = jnp.asarray(rng.normal(size=(1, h * w, 3)), dtype=jnp.float32)
    X = X.at[..., 2].set(jnp.abs(X[..., 2]) + 1.0)
    Xc = constrain_points_to_ray((h, w), X, K)
    # depth preserved
    np.testing.assert_allclose(Xc[..., 2], X[..., 2], atol=1e-6)
    # lies on pixel ray
    uv = get_pixel_coords(1, (h, w)).reshape(1, h * w, 2)
    pz, _ = project_calib(Xc, K, (h, w), border=-1e9)
    np.testing.assert_allclose(pz[..., :2], uv, atol=1e-2)


def test_huber_tukey():
    r = jnp.array([0.0, 1.0, 2.0, -5.0])
    w = huber(r, k=1.345)
    np.testing.assert_allclose(w[0], 1.0)
    np.testing.assert_allclose(w[2], 1.345 / 2.0, rtol=1e-6)
    np.testing.assert_allclose(w[3], 1.345 / 5.0, rtol=1e-6)
    wt = tukey(r, t=4.6851)
    assert wt[3] == 0.0
    np.testing.assert_allclose(wt[0], 1.0)


def test_check_convergence():
    assert bool(check_convergence(1e-3, 1e-3, 100.0, 99.99, jnp.ones(7)))
    assert not bool(check_convergence(1e-3, 1e-3, 100.0, 50.0, jnp.ones(7)))
    assert bool(check_convergence(1e-3, 1e-3, 100.0, 50.0, jnp.zeros(7)))
