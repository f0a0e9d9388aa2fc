"""Pixel correspondence by iterative projection + descriptor refinement.

TPU-native re-design of the reference's two CUDA matching kernels
(`splatt3r_slam/backend/src/matching_kernels.cu`):

- `iter_proj` (spec: matching_kernels.cu:118-274): per-pixel 2-DoF
  Levenberg-Marquardt solve that projects a unit ray onto a ray-image by
  descending the ray-alignment cost with bilinear interpolation of the
  ray + gradient channels. Here: fully vectorized over all pixels with a
  `lax.fori_loop` over a *static* iteration count (lambda up/down keeps
  per-pixel state; no data-dependent control flow).
- `refine_matches` (spec: matching_kernels.cu:24-80): windowed descriptor
  dot-product argmax with iterated dilation (coarse-to-fine). Here: the
  window scores become one batched (49 x D) x (D,) matvec per dilation —
  MXU work instead of scalar loops; the dilation loop is a static Python
  loop of `dilation_max` steps.

The driver `match()` mirrors `splatt3r_slam/matching.py:8-90` including the
occlusion distance check.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from splatt3r_slam_tpu.ops.image import img_gradient


class MatchingConfig(NamedTuple):
    """Static matching parameters (reference config/base.yaml `matching:`)."""

    max_iter: int = 10
    lambda_init: float = 1e-8
    convergence_thresh: float = 1e-6
    dist_thresh: float = 1e-1
    radius: int = 3
    dilation_max: int = 5


def prep_rays_with_grad(X11: jnp.ndarray) -> jnp.ndarray:
    """Normalized ray image + gradients, (b, h, w, 9) NHWC.

    Spec: `splatt3r_slam/matching.py:25-36` (rays, gx, gy channel order).
    """
    rays = X11 / jnp.linalg.norm(X11, axis=-1, keepdims=True)
    gx, gy = img_gradient(rays)
    return jnp.concatenate([rays, gx, gy], axis=-1)


def _bilinear_gather(img_flat: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, w: int):
    """Bilinear sample of (h*w, c) flattened image at float (u, v).

    Callers guarantee u ∈ [1, w-2], v ∈ [1, h-2] so all four neighbors are
    in-bounds (matching the CUDA kernel's clamp-then-sample contract,
    matching_kernels.cu:141-143).
    Returns (n, c).
    """
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[:, None]
    dv = (v - v0)[:, None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    base = v0i * w + u0i
    i00 = jnp.take(img_flat, base, axis=0)  # (v0, u0)
    i01 = jnp.take(img_flat, base + 1, axis=0)  # (v0, u0+1)
    i10 = jnp.take(img_flat, base + w, axis=0)  # (v0+1, u0)
    i11 = jnp.take(img_flat, base + w + 1, axis=0)  # (v0+1, u0+1)

    return (
        (1 - du) * (1 - dv) * i00
        + du * (1 - dv) * i01
        + (1 - du) * dv * i10
        + du * dv * i11
    )


def _ray_cost(rays_flat, u, v, w, target):
    """Sampled-normalized-ray vs target-ray squared error (n,)."""
    r = _bilinear_gather(rays_flat[:, :3], u, v, w)
    r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    err = r - target
    return jnp.sum(err * err, axis=-1), err


@functools.partial(jax.jit, static_argnames=("h", "w", "max_iter"))
def _iter_proj_single(
    rays_with_grad: jnp.ndarray,  # (h*w, 9)
    pts3d_norm: jnp.ndarray,  # (n, 3)
    p_init: jnp.ndarray,  # (n, 2) float
    h: int,
    w: int,
    max_iter: int,
    lambda_init: float,
    cost_thresh: float,
):
    n = pts3d_norm.shape[0]
    u = jnp.clip(p_init[:, 0], 1.0, w - 2.0)
    v = jnp.clip(p_init[:, 1], 1.0, h - 2.0)
    lam = jnp.full((n,), lambda_init, dtype=jnp.float32)
    conv = jnp.zeros((n,), dtype=bool)

    # One bilinear evaluation per iteration: the accepted/rejected sample
    # is carried in the loop state, so each step only evaluates the trial
    # point (the CUDA kernel re-samples the base point each iteration —
    # same values, twice the gathers, matching_kernels.cu:152-269).
    samp = _bilinear_gather(rays_with_grad, u, v, w)  # (n, 9)

    def _cost_of(samp):
        r = samp[:, 0:3]
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        err = r - pts3d_norm
        return jnp.sum(err * err, axis=-1), err

    def body(_, state):
        u, v, lam, conv, samp = state
        gx = samp[:, 3:6]
        gy = samp[:, 6:9]
        cost, err = _cost_of(samp)

        # 2x2 normal equations with LM damping (matching_kernels.cu:198-215)
        A00 = jnp.sum(gx * gx, axis=-1) + lam
        A01 = jnp.sum(gx * gy, axis=-1)
        A11 = jnp.sum(gy * gy, axis=-1) + lam
        b0 = -jnp.sum(err * gx, axis=-1)
        b1 = -jnp.sum(err * gy, axis=-1)
        det_inv = 1.0 / (A00 * A11 - A01 * A01)
        du = det_inv * (A11 * b0 - A01 * b1)
        dv = det_inv * (-A01 * b0 + A00 * b1)

        u_new = jnp.clip(u + du, 1.0, w - 2.0)
        v_new = jnp.clip(v + dv, 1.0, h - 2.0)
        samp_new = _bilinear_gather(rays_with_grad, u_new, v_new, w)
        new_cost, _ = _cost_of(samp_new)

        accept = new_cost < cost
        acc = accept[:, None]
        u = jnp.where(accept, u_new, u)
        v = jnp.where(accept, v_new, v)
        samp = jnp.where(acc, samp_new, samp)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        conv = jnp.where(accept, new_cost < cost_thresh, cost < cost_thresh)
        return u, v, lam, conv, samp

    u, v, lam, conv, _ = jax.lax.fori_loop(
        0, max_iter, body, (u, v, lam, conv, samp)
    )
    return jnp.stack([u, v], axis=-1), conv


def iter_proj(
    rays_with_grad_img: jnp.ndarray,  # (b, h, w, 9)
    pts3d_norm: jnp.ndarray,  # (b, n, 3)
    p_init: jnp.ndarray,  # (b, n, 2)
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    cost_thresh: float = 1e-6,
):
    """Batched LM iterative projection. Returns (p (b,n,2) float, converged (b,n))."""
    b, h, w, _ = rays_with_grad_img.shape
    flat = rays_with_grad_img.reshape(b, h * w, 9)
    f = jax.vmap(
        lambda rf, pn, pi: _iter_proj_single(
            rf, pn, pi, h, w, max_iter, lambda_init, cost_thresh
        )
    )
    return f(flat, pts3d_norm, p_init)


def refine_matches(
    D11: jnp.ndarray,  # (b, h, w, fdim)
    D21: jnp.ndarray,  # (b, n, fdim)
    p1: jnp.ndarray,  # (b, n, 2) int
    radius: int = 3,
    dilation_max: int = 5,
    coarse_dim: int = 8,
):
    """Coarse-to-fine windowed descriptor argmax (matching_kernels.cu:24-80).

    For each dilation d = dilation_max..1, scores the (2r+1)² grid of pixels
    at spacing d around the current center and re-centers on the best.

    TPU adaptations (profile-guided, v5e):
    - scoring is a VPU multiply-sum in bf16 (beats the MXU path for these
      skinny K=49, F=24 contractions);
    - coarse dilations (d > 1) score a fixed `coarse_dim`-dimensional
      random projection of the descriptors — they only pick a cell to
      recenter on, the finest level rescoring with the full descriptor.
      This cuts the gather-dominated window cost ~2.5x; set coarse_dim=0
      for exact reference semantics at every level.
    """
    b, h, w, fdim = D11.shape
    n = p1.shape[1]
    side = 2 * radius + 1

    D11f = D11.reshape(b, h * w, fdim).astype(jnp.bfloat16)
    D21b = D21.astype(jnp.bfloat16)

    if coarse_dim and coarse_dim < fdim and dilation_max > 1:
        # fixed random projection shared by both views (JL-style sketch)
        key = jax.random.PRNGKey(0)
        P = (jax.random.normal(key, (fdim, coarse_dim), jnp.float32)
             / np.sqrt(coarse_dim)).astype(jnp.bfloat16)
        D11c = jnp.einsum("bnf,fc->bnc", D11f, P)
        D21c = jnp.einsum("bnf,fc->bnc", D21b, P)
    else:
        D11c, D21c = D11f, D21b

    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-radius, radius + 1),
            jnp.arange(-radius, radius + 1),
            indexing="xy",
        ),
        axis=-1,
    ).reshape(-1, 2)  # (side², 2) in (du, dv), v-major scan order

    u = p1[..., 0].astype(jnp.int32)
    v = p1[..., 1].astype(jnp.int32)

    def one_dilation(u, v, d, Dimg, Dq):
        f = Dimg.shape[-1]
        du = offs[:, 0] * d  # (k,)
        dv = offs[:, 1] * d
        uu = u[..., None] + du  # (b, n, k)
        vv = v[..., None] + dv
        inside = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        lin = jnp.clip(vv, 0, h - 1) * w + jnp.clip(uu, 0, w - 1)
        Dwin = jax.vmap(lambda Df, l: jnp.take(Df, l, axis=0))(
            Dimg, lin.reshape(b, -1)
        ).reshape(b, n, side * side, f)
        scores = (Dwin * Dq[:, :, None, :]).astype(jnp.float32).sum(-1)
        scores = jnp.where(inside, scores, -jnp.inf)
        best = jnp.argmax(scores, axis=-1)  # (b, n)
        u = jnp.take_along_axis(uu, best[..., None], axis=-1)[..., 0]
        v = jnp.take_along_axis(vv, best[..., None], axis=-1)[..., 0]
        return u, v

    for d in range(dilation_max, 0, -1):
        if d > 1:
            u, v = one_dilation(u, v, d, D11c, D21c)
        else:
            u, v = one_dilation(u, v, d, D11f, D21b)

    return jnp.stack([u, v], axis=-1)


def pixel_to_lin(p: jnp.ndarray, w: int) -> jnp.ndarray:
    """(u, v) → v*w + u (spec: matching.py:13-15)."""
    return p[..., 0] + w * p[..., 1]


def lin_to_pixel(idx: jnp.ndarray, w: int) -> jnp.ndarray:
    """v*w + u → (u, v) (spec: matching.py:18-21)."""
    return jnp.stack([idx % w, idx // w], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iter",
        "lambda_init",
        "convergence_thresh",
        "dist_thresh",
        "radius",
        "dilation_max",
    ),
)
def match(
    X11: jnp.ndarray,  # (b, h, w, 3) canonical points of view 1 in frame 1
    X21: jnp.ndarray,  # (b, h, w, 3) points of view 2 in frame 1
    D11: jnp.ndarray,  # (b, h, w, fdim)
    D21: jnp.ndarray,  # (b, h, w, fdim)
    idx_1_to_2_init: jnp.ndarray | None = None,  # (b, h*w) int or None
    *,
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    convergence_thresh: float = 1e-6,
    dist_thresh: float = 1e-1,
    radius: int = 3,
    dilation_max: int = 5,
):
    """Full correspondence pipeline (spec: matching.py:52-90).

    Returns (idx_1_to_2 (b, h*w) int32, valid (b, h*w, 1) bool).
    """
    b, h, w, _ = X11.shape
    n = h * w

    rays_img = prep_rays_with_grad(X11)
    pts3d_norm = X21.reshape(b, n, 3)
    pts3d_norm = pts3d_norm / jnp.linalg.norm(pts3d_norm, axis=-1, keepdims=True)

    if idx_1_to_2_init is None:
        idx_1_to_2_init = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    p_init = lin_to_pixel(idx_1_to_2_init, w).astype(jnp.float32)

    p1, valid_proj = iter_proj(
        rays_img, pts3d_norm, p_init, max_iter, lambda_init, convergence_thresh
    )
    p1 = p1.astype(jnp.int32)  # truncation matches reference .long()

    # occlusion check: |X11[p1] − X21| < dist_thresh (matching.py:71-76)
    lin = pixel_to_lin(p1, w)
    X11f = X11.reshape(b, n, 3)
    X11_at = jax.vmap(lambda Xf, l: jnp.take(Xf, l, axis=0))(X11f, lin)
    dists = jnp.linalg.norm(X11_at - X21.reshape(b, n, 3), axis=-1)
    valid = valid_proj & (dists < dist_thresh)

    if radius > 0:
        p1 = refine_matches(D11, D21.reshape(b, n, -1), p1, radius, dilation_max)

    idx_1_to_2 = pixel_to_lin(p1, w).astype(jnp.int32)
    return idx_1_to_2, valid[..., None]
