"""Microbenchmark: einsum-softmax attention vs Pallas flash attention.

The two-view ViT runs ~72 attention ops per tracked frame (24 encoder +
2x12 decoder blocks x (self + cross)); the einsum path round-trips the
fp32 (B, H, N, N) score tensor through HBM (XLA cannot fuse
matmul->softmax->matmul into one kernel). This measures whether
`jax.experimental.pallas.ops.tpu.flash_attention` wins at our shapes
(N=768 tokens at 512x384, head dim 64) before wiring it into
models/layers.py.

Usage: python scripts/bench_attention.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention,
)


def attend_einsum(q, k, v, scale):
    # exactly models/layers.py::_attend — (B, N, H, D) layout
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    )
    w = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", w.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def attend_flash(q, k, v, scale=1.0, block=None):
    # flash kernel wants (B, H, N, D)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    bs = None
    if block:
        bs = BlockSizes(block_q=block, block_k_major=block, block_k=block,
                        block_b=1)
    out = flash_attention(qt, kt, vt, causal=False, sm_scale=scale,
                          block_sizes=bs)
    return out.transpose(0, 2, 1, 3).astype(v.dtype)


def sync(x):
    np.asarray(jnp.ravel(x)[:1])


def timeit(fn, args, iters=30, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    sync(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    results = {}
    # (label, B, N_q, N_kv, H, Dh): encoder self-attn (two views batched),
    # decoder self + cross (two streams batched)
    shapes = [
        ("enc_self B2 N768 H16", 2, 768, 768, 16, 64),
        ("dec_self B2 N768 H12", 2, 768, 768, 12, 64),
        ("dec_cross B2 N768 H12", 2, 768, 768, 12, 64),
    ]
    for label, b, nq, nk, h, dh in shapes:
        q = jnp.asarray(rng.standard_normal((b, nq, h, dh)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, nk, h, dh)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, nk, h, dh)), jnp.bfloat16)
        scale = dh ** -0.5
        row = {"einsum_ms": round(timeit(
            lambda q, k, v: attend_einsum(q, k, v, scale), (q, k, v)), 4)}
        for blk in (None, 256, 384):
            try:
                key = f"flash_ms_b{blk or 'def'}"
                # sm_scale/BlockSizes are static to the kernel: close over
                # them instead of passing through jit as traced args
                fn = functools.partial(attend_flash, scale=scale, block=blk)
                row[key] = round(
                    timeit(lambda q, k, v: fn(q, k, v), (q, k, v)), 4)
            except Exception as e:  # pragma: no cover
                row[key] = f"FAIL {type(e).__name__}: {e}"[:120]
        # numerical agreement
        a = attend_einsum(q, k, v, scale)
        try:
            f = attend_flash(q, k, v, scale)
            row["max_abs_diff"] = float(
                jnp.max(jnp.abs(a.astype(jnp.float32)
                                - f.astype(jnp.float32))))
        except Exception as e:
            row["max_abs_diff"] = f"FAIL {e}"[:80]
        results[label] = row
        print(label, row, flush=True)
    print(json.dumps({"platform": jax.default_backend(), "results": results}))


if __name__ == "__main__":
    main()
