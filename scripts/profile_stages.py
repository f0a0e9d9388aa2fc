"""Per-stage timing of the TRACKING critical path on the current backend.

Times each fused-step stage in isolation (encoder / decoder / heads /
matching / GN) plus the full fused step, with block_until_ready around
jitted sub-programs, and prints a JSON breakdown. This is the measurement
tool VERDICT r1 item 2 asks for: attack the measured top cost, don't guess.

Usage: python scripts/profile_stages.py [--tiny] [--iters N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# persistent compile cache: env vars do NOT take effect in this image
# (sitecustomize initializes jax first) — config.update does
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(out):
    """Force completion with a tiny D2H pull (block_until_ready is a no-op
    on some remote platforms — the axon tunnel returns immediately)."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from splatt3r_slam_tpu import config as cfgmod

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgmod.load_config(os.path.join(root, "config", "base.yaml"))

    from splatt3r_slam_tpu.models import Splatt3RModel, TwoViewConfig
    from splatt3r_slam_tpu.ops import matching
    from splatt3r_slam_tpu.runtime.fused import (
        KFState, MatchingParams, make_fused_track_step,
    )
    from splatt3r_slam_tpu.tracking import TrackingConfig
    from splatt3r_slam_tpu.tracking.tracker import opt_pose_ray_dist_sim3
    from splatt3r_slam_tpu.lie import sim3

    if args.tiny:
        cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
        h, w = 48, 64
    else:
        cfg = TwoViewConfig()
        h, w = 384, 512
    n = h * w

    model = Splatt3RModel(cfg)
    img0 = jnp.zeros((1, h, w, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img0, img0)
    )["params"]
    rng = np.random.default_rng(0)

    def fill(path, s):
        name = getattr(path[-1], "key", "")
        if name == "scale":
            return jnp.ones(s.shape, s.dtype)
        if name == "bias":
            return jnp.zeros(s.shape, s.dtype)
        fan_in = int(np.prod(s.shape[:-1])) or 1
        return jnp.asarray(
            rng.standard_normal(s.shape, dtype=np.float32) / np.sqrt(fan_in),
            s.dtype)

    params = jax.device_put(jax.tree_util.tree_map_with_path(fill, shapes))
    img = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)

    # ---- stage programs ----
    @jax.jit
    def f_encode(params, img):
        return model.apply({"params": params}, img, method=model.encode)

    feat, pos = jax.block_until_ready(f_encode(params, img))

    @jax.jit
    def f_decode(params, feat, pos):
        return model.apply({"params": params}, feat, pos, feat, pos,
                           method=model.decode)

    d1, d2 = jax.block_until_ready(f_decode(params, feat, pos))

    # production head mode: the per-frame path skips the gaussian DPTs
    # (fused.py head_mode="tracking"); Gaussians are materialized lazily
    @jax.jit
    def f_head1(params, d1):
        return model.apply({"params": params}, 1, d1, (h, w), "tracking",
                           method=model.apply_head)

    @jax.jit
    def f_head2(params, d2):
        return model.apply({"params": params}, 2, d2, (h, w), "tracking",
                           method=model.apply_head)

    res11 = jax.block_until_ready(f_head1(params, d1))
    res21 = jax.block_until_ready(f_head2(params, d2))

    mcfg = MatchingParams.from_config(cfgmod.config)
    s = max(1, int(mcfg.match_stride))

    def sub(a):
        return a[:, ::s, ::s] if s > 1 else a

    @jax.jit
    def f_match(X11, X21, D11, D21):
        # production subgrid matching (fused.py sub_grid semantics)
        return matching.match(
            sub(X11), sub(X21), sub(D11), sub(D21), None,
            max_iter=mcfg.max_iter, lambda_init=mcfg.lambda_init,
            convergence_thresh=mcfg.convergence_thresh,
            dist_thresh=mcfg.dist_thresh, radius=mcfg.radius,
            dilation_max=mcfg.dilation_max,
            closed_form_init=mcfg.closed_form_init,
            polish_iters=mcfg.polish_iters,
            refine_schedule=mcfg.refine_schedule,
            refine_quantize=mcfg.refine_quantize)

    idxb, validb = jax.block_until_ready(f_match(
        res11["pts3d"], res21["pts3d"], res11["desc"], res21["desc"]))

    tcfg = TrackingConfig()
    ns = (h // s) * (w // s)
    idx = idxb[0]
    valid = validb[0]
    Xff = sub(res11["pts3d"])[0].reshape(ns, 3)
    Xkf = sub(res21["pts3d"])[0].reshape(ns, 3)
    Qk = jnp.sqrt(sub(res11["desc_conf"])[0].reshape(ns, 1)[idx]
                  * sub(res21["desc_conf"])[0].reshape(ns, 1))
    T_id = sim3.identity()

    @jax.jit
    def f_gn(Xf, Xk, Qk, valid):
        return opt_pose_ray_dist_sim3(Xf, Xk, T_id, T_id, Qk, valid, tcfg)

    jax.block_until_ready(f_gn(Xff[idx], Xkf, Qk, valid))

    # fused step (the production program)
    step = make_fused_track_step(model, h, w, tcfg, mcfg)
    kf = KFState(feat=feat, pos=pos,
                 X=res21["pts3d"][0].reshape(n, 3),
                 C=jnp.ones((n, 1)),
                 N_fused=jnp.asarray(1.0), T_WC=T_id)
    out, flags = step(params, img, kf, T_id, None)
    jax.block_until_ready(flags)

    it = args.iters
    times = {
        "encode_ms": timeit(f_encode, params, img, iters=it),
        "decode_ms": timeit(f_decode, params, feat, pos, iters=it),
        "head1_ms": timeit(f_head1, params, d1, iters=it),
        "head2_ms": timeit(f_head2, params, d2, iters=it),
        "match_ms": timeit(
            f_match, res11["pts3d"], res21["pts3d"],
            res11["desc"], res21["desc"], iters=it),
        "gn_ms": timeit(f_gn, Xff[idx], Xkf, Qk, valid, iters=it),
        "fused_step_ms": timeit(
            lambda: step(params, img, kf, T_id, None)[1], iters=it),
    }
    times["sum_stages_ms"] = sum(
        v for k, v in times.items()
        if k.endswith("_ms") and k not in ("fused_step_ms", "sum_stages_ms"))
    # dispatch/fusion gap: fused single program vs isolated stage sum
    times["fusion_gain_ms"] = times["sum_stages_ms"] - times["fused_step_ms"]
    times = {k: round(v, 2) for k, v in times.items()}

    # ---- FLOPs + MFU accounting (VERDICT r04 item 3) ----
    # XLA's own cost model on the compiled fused program; v5e peak is
    # 197 TFLOP/s bf16 (394 TOPS int8). MFU = flops / time / peak.
    try:
        compiled = step.lower(params, img, kf, T_id, None, None).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan")))
        times["fused_step_gflop"] = round(flops / 1e9, 1)
        peak = 197e12 if jax.default_backend() != "cpu" else float("nan")
        tsec = times["fused_step_ms"] / 1e3
        times["achieved_tflops"] = round(flops / tsec / 1e12, 2)
        times["mfu_pct_vs_v5e_bf16_peak"] = round(
            100.0 * flops / tsec / peak, 1)
        times["bytes_accessed_gb"] = round(
            float(ca.get("bytes accessed", float("nan"))) / 1e9, 2)
    except Exception as e:  # cost model availability varies per backend
        times["cost_analysis_error"] = repr(e)

    times["match_stride"] = s
    times["backend"] = jax.default_backend()
    times["hw"] = f"{h}x{w}"
    print(json.dumps(times, indent=1))


if __name__ == "__main__":
    main()
