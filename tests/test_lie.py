"""Golden-value and property tests for the pure-JAX Sim(3) library.

Oracles: closed forms (Rodrigues), group axioms, finite differences; the
reference's CUDA Sim3 algebra (gn_kernels.cu:177-452) is the behavioral spec.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatt3r_slam_tpu.lie import sim3



pytestmark = pytest.mark.smoke
def random_sim3(rng, batch=()):
    q = rng.normal(size=batch + (4,))
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=batch + (3,))
    s = np.exp(rng.normal(size=batch + (1,)) * 0.3)
    return jnp.asarray(np.concatenate([t, q, s], axis=-1), dtype=jnp.float64)


def test_identity_act(rng):
    T = sim3.identity()
    x = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(sim3.act(T, x), x, atol=1e-6)


def test_inverse_roundtrip(rng):
    T = random_sim3(rng, (7,))
    x = jnp.asarray(rng.normal(size=(7, 3)), dtype=jnp.float32)
    y = sim3.act(T, x)
    x2 = sim3.act(sim3.inverse(T), y)
    np.testing.assert_allclose(x2, x, atol=1e-4)
    TI = sim3.multiply(T, sim3.inverse(T))
    np.testing.assert_allclose(TI, np.broadcast_to(sim3.identity(), TI.shape),
                               atol=1e-5)


def test_compose_matches_matrix(rng):
    Ta = random_sim3(rng, (4,))
    Tb = random_sim3(rng, (4,))
    Mab = np.asarray(sim3.matrix(sim3.multiply(Ta, Tb)))
    Mref = np.einsum(
        "bij,bjk->bik", np.asarray(sim3.matrix(Ta)), np.asarray(sim3.matrix(Tb))
    )
    np.testing.assert_allclose(Mab, Mref, atol=1e-4)


def test_act_matches_matrix(rng):
    T = random_sim3(rng, (4,))
    x = jnp.asarray(rng.normal(size=(4, 3)), dtype=jnp.float32)
    y = np.asarray(sim3.act(T, x))
    xh = np.concatenate([np.asarray(x), np.ones((4, 1), np.float32)], axis=-1)
    yh = np.einsum("bij,bj->bi", np.asarray(sim3.matrix(T)), xh)
    np.testing.assert_allclose(y, yh[:, :3], atol=1e-4)


def test_exp_pure_translation():
    xi = jnp.array([1.0, -2.0, 3.0, 0, 0, 0, 0])
    T = sim3.exp(xi)
    np.testing.assert_allclose(T[:3], [1, -2, 3], atol=1e-6)
    np.testing.assert_allclose(T[3:7], [0, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(T[7], 1.0, atol=1e-6)


def test_exp_pure_rotation_rodrigues(rng):
    phi = np.array([0.3, -0.5, 0.7], dtype=np.float32)
    theta = np.linalg.norm(phi)
    axis = phi / theta
    T = sim3.exp(jnp.concatenate([jnp.zeros(3), jnp.asarray(phi), jnp.zeros(1)]))
    R = np.asarray(sim3.quat_to_matrix(T[3:7]))
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    R_ref = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_exp_pure_scale():
    T = sim3.exp(jnp.array([0, 0, 0, 0, 0, 0, 0.7]))
    np.testing.assert_allclose(T[7], np.exp(0.7), rtol=1e-5)
    np.testing.assert_allclose(T[:3], 0.0, atol=1e-7)


@pytest.mark.parametrize("scale_xi", [0.0, 0.4, 1e-8])
@pytest.mark.parametrize("rot_mag", [0.0, 1e-8, 0.5, 2.5])
def test_exp_consistency_with_ode(scale_xi, rot_mag):
    """exp(xi) acting on a point equals integrating the twist ODE.

    dx/dt = omega x x + sigma x + tau; integrated with small steps.
    """
    rng = np.random.default_rng(3)
    tau = rng.normal(size=3).astype(np.float32)
    omega = rng.normal(size=3).astype(np.float32)
    if np.linalg.norm(omega) > 0:
        omega = omega / np.linalg.norm(omega) * rot_mag
    xi = np.concatenate([tau, omega, [scale_xi]]).astype(np.float32)
    x0 = rng.normal(size=3).astype(np.float32)

    T = sim3.exp(jnp.asarray(xi))
    y = np.asarray(sim3.act(T, jnp.asarray(x0)))

    # integrate dx/dt = omega×x + sigma·x + tau
    n = 1000
    x = x0.astype(np.float64).copy()
    dt = 1.0 / n
    for _ in range(n):
        k = lambda p: np.cross(omega, p) + scale_xi * p + tau
        k1 = k(x)
        k2 = k(x + 0.5 * dt * k1)
        k3 = k(x + 0.5 * dt * k2)
        k4 = k(x + dt * k3)
        x = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    np.testing.assert_allclose(y, x, atol=2e-4)


def test_retr_is_left_compose(rng):
    T = random_sim3(rng)
    xi = jnp.asarray(rng.normal(size=7) * 0.1, dtype=jnp.float32)
    np.testing.assert_allclose(
        sim3.retr(T, xi), sim3.multiply(sim3.exp(xi), T), atol=1e-6
    )


def test_rel(rng):
    Ti = random_sim3(rng)
    Tj = random_sim3(rng)
    Tij = sim3.rel(Ti, Tj)
    np.testing.assert_allclose(sim3.multiply(Ti, Tij), Tj, atol=1e-5)


def test_act_jacobian_autodiff(rng):
    """Analytic [I | −[pW]ₓ | pW] vs jacfwd of ξ ↦ act(retr(T, ξ), x).

    Autodiff is the oracle (this XLA CPU build's exp/sin approximations are
    only ~1e-8 accurate, which breaks finite differences at small eps).
    """
    T = random_sim3(rng)
    x = jnp.asarray(rng.normal(size=3), dtype=jnp.float64)
    pW = sim3.act(T, x)
    J = np.asarray(sim3.act_jacobian(pW))  # (3, 7)
    J_ad = np.asarray(
        jax.jacfwd(lambda xi: sim3.act(sim3.retr(T, xi), x))(jnp.zeros(7))
    )
    np.testing.assert_allclose(J, J_ad, atol=1e-9)


def test_adj_inv_apply_row_numeric(rng):
    """Row × Adj(T)⁻¹ vs numeric adjoint built from conjugation.

    Adj(T⁻¹) e_k ≈ log(T⁻¹ exp(ε e_k) T)/ε; for small ε, log is read off
    the embedding to first order: tau≈t, phi≈2 q_xyz, sigma≈log s.
    """
    T = random_sim3(rng)
    Tinv = sim3.inverse(T)
    eps = 1e-4
    A = np.zeros((7, 7))
    for k in range(7):
        xi = np.zeros(7, dtype=np.float64)
        xi[k] = eps
        G = np.asarray(
            sim3.multiply(sim3.multiply(Tinv, sim3.exp(jnp.asarray(xi))), T),
            dtype=np.float64,
        )
        eta = np.concatenate([G[:3], 2 * G[3:6], [np.log(G[7])]]) / eps
        A[:, k] = eta  # column k of Adj(T⁻¹)
    x = rng.normal(size=7)
    want = x @ A  # row-vector times Adj(T)⁻¹ = Adj(T⁻¹)
    got = np.asarray(sim3.adj_inv_apply_row(T, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_jit_and_vmap(rng):
    T = random_sim3(rng, (6,))
    x = jnp.asarray(rng.normal(size=(6, 3)), dtype=jnp.float32)
    f = jax.jit(jax.vmap(sim3.act))
    np.testing.assert_allclose(f(T, x), sim3.act(T, x), atol=1e-6)
