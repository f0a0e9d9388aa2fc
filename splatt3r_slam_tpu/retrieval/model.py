"""Retrieval feature head: whitening + projector + attention top-k.

Spec: reference `mast3r/retrieval/model.py:55-135` — Whitener (center +
PCA matrix, optional L2 norm), MLP projector (Linear[/LN/GELU]* chain,
optional residual), attention = per-token L2 norm, `how_select_local`
top-k token selection (nfeat 300), post-whitening.

All ops are device matmuls jitted into a single `prep_features` unit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def init_retrieval_params(dim: int = 1024, hdims=(1024,), seed: int = 0,
                          residual: bool = False) -> dict:
    """Random-init params with the reference layout (for tests / no-ckpt)."""
    rng = np.random.default_rng(seed)
    params = {
        "prewhiten": {"m": np.zeros((1, dim), np.float32),
                      "p": np.eye(dim, dtype=np.float32)},
        "postwhiten": {"m": np.zeros((1, hdims[-1]), np.float32),
                       "p": np.eye(hdims[-1], dtype=np.float32)},
        "projector": [],
        "residual": residual,
    }
    d = dim
    for i, hd in enumerate(hdims):
        w = rng.standard_normal((d, hd)).astype(np.float32) / np.sqrt(d)
        b = np.zeros(hd, np.float32)
        layer = {"w": w, "b": b}
        if i < len(hdims) - 1:
            layer["ln_scale"] = np.ones(hd, np.float32)
            layer["ln_bias"] = np.zeros(hd, np.float32)
        params["projector"].append(layer)
        d = hd
    return params


def load_retrieval_checkpoint(path: str) -> dict:
    """Convert the reference retrieval `.pth` (RetrievalModel state dict,
    `retrieval/processor.py:65-85`) to our params dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().float().numpy() for k, v in ckpt["model"].items()}
    args = ckpt.get("args")
    hdims = []
    if args is not None and getattr(args, "hdims", ""):
        hdims = list(map(int, args.hdims.split("_")))
    params = {
        "prewhiten": {"m": sd["prewhiten.m"], "p": sd["prewhiten.p"]},
        "postwhiten": {"m": sd["postwhiten.m"], "p": sd["postwhiten.p"]},
        "projector": [],
        "residual": bool(getattr(args, "residual", False)) if args else False,
    }
    i = 0
    layers = []
    while f"projector.{i}.weight" in sd:
        w = sd[f"projector.{i}.weight"]
        if w.ndim == 2:  # Linear
            layers.append({"w": w.T, "b": sd[f"projector.{i}.bias"]})
        else:  # LayerNorm folded into previous layer entry
            layers[-1]["ln_scale"] = w
            layers[-1]["ln_bias"] = sd[f"projector.{i}.bias"]
        i += 1
    params["projector"] = layers
    params["nfeat"] = int(getattr(args, "nfeat", 300)) if args else 300
    return params


def _whiten(x, m, p, l2norm=None):
    y = (x - m) @ p
    if l2norm is not None:
        y = y / jnp.linalg.norm(y, axis=l2norm, keepdims=True)
    return y


@functools.partial(jax.jit, static_argnames=("nfeat", "residual"))
def prep_features(params, backbone_feat, nfeat: int = 300,
                  residual: bool = False):
    """(B, N, C) encoder tokens → (B, nfeat, D) retrieval descriptors.

    Mirrors RetrievalDatabase.prep_features (retrieval_database.py:25-41).
    """
    x = _whiten(backbone_feat, jnp.asarray(params["prewhiten"]["m"]),
                jnp.asarray(params["prewhiten"]["p"]))
    h = x
    n_layers = len(params["projector"])
    for i, layer in enumerate(params["projector"]):
        h = h @ jnp.asarray(layer["w"]) + jnp.asarray(layer["b"])
        if i < n_layers - 1:
            mu = h.mean(-1, keepdims=True)
            var = h.var(-1, keepdims=True)
            h = (h - mu) / jnp.sqrt(var + 1e-5)
            h = h * jnp.asarray(layer["ln_scale"]) + jnp.asarray(
                layer["ln_bias"]
            )
            h = jax.nn.gelu(h, approximate=False)
    proj = h + (x if residual else 0.0)

    attention = jnp.linalg.norm(proj, axis=-1)  # (B, N)
    whitened = _whiten(proj, jnp.asarray(params["postwhiten"]["m"]),
                       jnp.asarray(params["postwhiten"]["p"]))

    k = min(nfeat, attention.shape[1])
    _, idx = jax.lax.top_k(attention, k)
    topk = jnp.take_along_axis(whitened, idx[..., None], axis=1)
    return topk
