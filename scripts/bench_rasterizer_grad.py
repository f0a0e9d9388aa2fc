"""Validate + time the Pallas rasterizer BACKWARD on real TPU hardware.

VERDICT r04 item 2: the custom-VJP compositor (bc9dede) had only run in
Mosaic interpret mode on CPU, yet `DecoderSplatting` defaults to the
Pallas path on TPU for training. This script compiles the backward on
the actual chip at production caps (k_max=512, 384x512, 400k gaussians),
checks the gradients against XLA autodiff through the reference-parity
XLA rasterizer (`splat/rasterizer.py`), and times a render-loss
value_and_grad step (the trainer's photometric term) Pallas-vs-XLA.

Run:  python scripts/bench_rasterizer_grad.py > logs/bench_rasterizer_grad_tpu_v5e.json
Spec: diff-gaussian-rasterization differentiability contract,
`cuda_splatting.py:100-128`.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from splatt3r_slam_tpu.splat.rasterizer import render_tiles  # noqa: E402
from splatt3r_slam_tpu.splat.pallas_rasterizer import (  # noqa: E402
    render_tiles_pallas,
)
from bench_rasterizer import HW, make_scene  # noqa: E402

K_MAX = 512
G = 400_000


def sync(x):
    np.asarray(jnp.ravel(x)[:1])  # only reliable barrier on axon


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    sync(jax.tree.leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    means, cov, colors, opa, view, K = make_scene(G)
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.random((*HW, 3)), jnp.float32)

    def loss_with(render):
        def loss(means, cov, colors, opa):
            img = render(means, cov, colors, opa, view, K, HW,
                         tpg_side=4, k_max=K_MAX)
            return jnp.mean((img - target) ** 2)

        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))

    vg_xla = loss_with(render_tiles)
    vg_pal = loss_with(render_tiles_pallas)

    out = {"gaussians": G, "hw": list(HW), "k_max": K_MAX,
           "device": str(jax.devices()[0])}

    ms_x, (lx, gx) = timeit(vg_xla, means, cov, colors, opa)
    ms_p, (lp, gp) = timeit(vg_pal, means, cov, colors, opa)
    out["value_and_grad_ms"] = {"xla": round(ms_x, 2),
                                "pallas": round(ms_p, 2)}
    out["loss"] = {"xla": float(lx), "pallas": float(lp),
                   "rel_diff": float(abs(lx - lp) / (abs(lx) + 1e-12))}

    names = ["means", "cov_triu", "colors", "opacities"]
    grads = {}
    for name, a, b in zip(names, gp, gx):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.abs(b).max() + 1e-30
        diff = np.abs(a - b)
        grads[name] = {
            "max_abs_xla": float(np.abs(b).max()),
            "max_abs_diff": float(diff.max()),
            "max_rel_diff_vs_peak": float(diff.max() / scale),
            "finite": bool(np.isfinite(a).all()),
        }
    out["grad_vs_xla_autodiff"] = grads

    # forward-only refresher at the same scale (updates the stale r2 row)
    f_x = jax.jit(lambda: render_tiles(means, cov, colors, opa, view, K,
                                       HW, tpg_side=4, k_max=K_MAX))
    f_p = jax.jit(lambda: render_tiles_pallas(means, cov, colors, opa,
                                              view, K, HW, tpg_side=4,
                                              k_max=K_MAX))
    msf_x, _ = timeit(f_x)
    msf_p, _ = timeit(f_p)
    out["forward_ms"] = {"xla": round(msf_x, 2), "pallas": round(msf_p, 2)}

    # Finite-difference probe of the PALLAS path alone: the XLA-autodiff
    # comparison above conflates two different forward precisions (the
    # XLA compositor's bf16 MXU transmittance vs the Pallas kernel's
    # fp32 accumulation) — central differences through the Pallas
    # forward validate the custom VJP directly on hardware.
    loss_only = jax.jit(lambda m, c, col, o: vg_pal(m, c, col, o)[0])
    arrays = [means, cov, colors, opa]
    fd_rows = []
    for pi, name in enumerate(names):
        g_np = np.asarray(gp[pi])
        flat_idx = int(np.abs(g_np).argmax())
        coord = np.unravel_index(flat_idx, g_np.shape)
        x0 = float(np.asarray(arrays[pi][coord]))
        # per-param step: small vs the value's scale (cov entries are
        # ~1e-4 and must stay PSD) yet large vs fp32 loss roundoff
        eps = {"cov_triu": 1e-5}.get(name, 1e-3)

        def at(v):
            a = list(arrays)
            a[pi] = arrays[pi].at[coord].set(v)
            return float(loss_only(*a))

        fd = (at(x0 + eps) - at(x0 - eps)) / (2 * eps)
        an = float(g_np[coord])
        fd_rows.append({
            "param": name, "coord": [int(c) for c in coord],
            "fd": fd, "analytic": an,
            "rel_err": abs(fd - an) / (abs(fd) + 1e-12),
        })
    out["fd_probe_pallas"] = fd_rows

    # Validation gate: two INDEPENDENT analytic implementations (Pallas
    # custom VJP vs XLA autodiff through the XLA compositor) agreeing at
    # sub-percent of grad peak is the strong check — a wrong VJP term
    # produces O(1) relative errors. The FD probes are a sign/scale
    # sanity bound: central differences through the alpha-compositing
    # chain carry percent-level truncation error at fp32-resolvable eps.
    ok = (
        all(g["finite"] for g in grads.values())
        and all(g["max_rel_diff_vs_peak"] < 0.01 for g in grads.values())
        and all(r["rel_err"] < 0.10 for r in fd_rows)
    )
    out["backward_validated_on_hardware"] = bool(ok)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
