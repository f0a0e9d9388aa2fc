"""Full-loss sharded train-step dryrun, shared by the driver entry point
(`__graft_entry__.dryrun_multichip`) and the CI suite.

Validates that ONE training step of the FULL reference loss (photometric
MSE + SSIM + LPIPS on rendered target views, gradients through the
rasterizer, plus the confidence-weighted Regr3D term — spec:
`/root/reference/splatt3r_core/main.py:148-262`) compiles and executes
under a (dp, fsdp, tp) mesh with real parameter/batch shardings.

This is a sharding-correctness check, not a throughput benchmark, so the
shapes are deliberately tiny: the virtual 8-device CPU mesh timeshares a
single host core, and XLA's CPU in-process collective rendezvous aborts
the whole process if any device thread takes too long between
collectives (`xla::cpu::TerminateTimeout`, default 40 s — raised via
XLA_FLAGS; per-jit compiler_options do NOT reach it because the timeout
is a function-local static read from the env-parsed flags on first use).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Appended to XLA_FLAGS *before* backend init by every caller — the
# terminate deadline kills the process when exceeded, and needs headroom
# on a 1-core host where 8 device threads timeshare. (The companion
# warn_stuck option exists in DebugOptions but is NOT registered in this
# build's XLA_FLAGS parser — passing it is a fatal "Unknown flag".)
COLLECTIVE_TIMEOUT_FLAGS = (
    "--xla_cpu_collective_call_terminate_timeout_seconds=1200"
)


def ensure_collective_timeout_env(env: dict) -> dict:
    """Add the CPU-collective timeout flags to env['XLA_FLAGS'] (idempotent)."""
    flags = env.get("XLA_FLAGS", "")
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        env["XLA_FLAGS"] = (flags + " " + COLLECTIVE_TIMEOUT_FLAGS).strip()
    return env


def pick_mesh_shape(n_devices: int) -> tuple[int, int]:
    """(fsdp, tp) exercising all three axes when the count allows."""
    if n_devices % 8 == 0:
        return 2, 2
    if n_devices % 2 == 0 and n_devices > 1:
        return 2, 1
    return 1, 1


def full_loss_train_step(n_devices: int, *, h: int = 32, w: int = 48,
                         v_targets: int = 1, k_max: int = 32,
                         lpips_channel_scale: int = 16):
    """Build the mesh + trainer, run ONE full-loss sharded step.

    Returns the metrics dict (host floats). v_targets=1 / k_max=32 /
    a shrunken LPIPS tree keep the inter-collective compute gaps small
    enough that no device thread starves past the rendezvous deadline on
    an oversubscribed host; the sharding/collective structure being
    validated (grad psum over dp, fsdp all-gather/reduce-scatter, tp
    collective-permute in the Megatron backward) is unchanged.
    """
    from splatt3r_slam_tpu.models import TwoViewConfig
    from splatt3r_slam_tpu.parallel import TrainConfig, Trainer
    from splatt3r_slam_tpu.parallel.mesh import batch_sharding, make_mesh
    from splatt3r_slam_tpu.utils.lpips import random_params as lpips_random

    fsdp, tp = pick_mesh_shape(n_devices)
    mesh = make_mesh(n_devices, fsdp=fsdp, tp=tp)

    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    tcfg = TrainConfig(train_gaussian_heads_only=False,
                       render_loss=True, ssim_weight=0.1,
                       lpips_weight=0.25, mast3r_loss_weight=0.1,
                       k_max=k_max)
    trainer = Trainer(cfg, tcfg, mesh=mesh,
                      lpips_params=lpips_random(
                          channel_scale=lpips_channel_scale))

    params, opt_state, pshard = trainer.init_state(h, w)
    step = trainer.make_train_step(pshard)

    B = n_devices  # one sample per device
    V = v_targets
    rng = np.random.default_rng(0)
    eye = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    K = jnp.broadcast_to(
        jnp.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1.0]]),
        (B, V, 3, 3),
    )
    batch = {
        "img1": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "img2": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "gt1_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "gt2_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "valid1": jnp.ones((B, h, w), bool),
        "valid2": jnp.ones((B, h, w), bool),
        "context_pose": eye,
        "target_pose": jnp.broadcast_to(eye[:, None], (B, V, 4, 4)),
        "target_K": K,
        "target_img": jnp.asarray(rng.random((B, V, h, w, 3)), jnp.float32),
    }
    batch = jax.device_put(batch, batch_sharding(mesh))
    params, opt_state, metrics = step(params, opt_state, batch)
    jax.block_until_ready(metrics)
    out = {k: float(v) for k, v in metrics.items()}
    out["mesh"] = dict(mesh.shape)
    return out
