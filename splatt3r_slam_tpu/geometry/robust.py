"""Robust NLLS helpers (Huber / Tukey weights, convergence test).

Spec: reference `splatt3r_slam/nonlinear_optimizer.py:5-42`. The convergence
check returns a traced boolean so it composes with `lax.while_loop`.
"""

from __future__ import annotations

import jax.numpy as jnp


def huber(r: jnp.ndarray, k: float = 1.345) -> jnp.ndarray:
    """Huber IRLS weight: 1 for |r|<k else k/|r| (nonlinear_optimizer.py:28-33)."""
    r_abs = jnp.abs(r)
    r_safe = jnp.where(r_abs < k, 1.0, r_abs)
    return jnp.where(r_abs < k, 1.0, k / r_safe)


def tukey(r: jnp.ndarray, t: float = 4.6851) -> jnp.ndarray:
    """Tukey biweight (nonlinear_optimizer.py:36-42)."""
    r_abs = jnp.abs(r)
    tmp = 1.0 - jnp.square(r_abs / t)
    return jnp.where(r_abs < t, tmp * tmp, 0.0)


def check_convergence(
    rel_error_threshold: float,
    delta_norm_threshold: float,
    old_cost: jnp.ndarray,
    new_cost: jnp.ndarray,
    delta: jnp.ndarray,
) -> jnp.ndarray:
    """Relative-cost-decrease OR small-step test (nonlinear_optimizer.py:5-25)."""
    rel_dec = jnp.abs((old_cost - new_cost) / old_cost)
    delta_norm = jnp.linalg.norm(delta)
    return (rel_dec < rel_error_threshold) | (delta_norm < delta_norm_threshold)
