"""Sharded-trainer tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatt3r_slam_tpu.models import TwoViewConfig
from splatt3r_slam_tpu.parallel import TrainConfig, Trainer
from splatt3r_slam_tpu.parallel.mesh import batch_sharding, make_mesh


@pytest.mark.slow  # the driver's dryrun_multichip exercises this same
# sharded train step every round; keep the CI line under 5 min
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_train_step_dp_fsdp():
    mesh = make_mesh(8, fsdp=2)
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    trainer = Trainer(cfg, TrainConfig(train_gaussian_heads_only=False),
                      mesh=mesh)
    h, w = 16, 32
    params, opt_state, pshard = trainer.init_state(h, w)
    step = trainer.make_train_step(pshard)

    rng = np.random.default_rng(0)
    B = 8
    batch = {
        "img1": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "img2": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "gt1_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "gt2_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "valid1": jnp.ones((B, h, w), bool),
        "valid2": jnp.ones((B, h, w), bool),
    }
    batch = jax.device_put(batch, batch_sharding(mesh))
    p0 = jax.tree.leaves(params)[0].copy()
    params, opt_state, m1 = step(params, opt_state, batch)
    params, opt_state, m2 = step(params, opt_state, batch)
    assert np.isfinite(float(m1["regr3d"]))
    # loss decreases on repeated identical batch
    assert float(m2["regr3d"]) < float(m1["regr3d"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gaussian_only_freezing():
    """Frozen (non-gaussian-dpt) params must not change."""
    mesh = make_mesh(8, fsdp=1)
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    trainer = Trainer(cfg, TrainConfig(train_gaussian_heads_only=True),
                      mesh=mesh)
    h, w = 16, 32
    params, opt_state, pshard = trainer.init_state(h, w)
    step = trainer.make_train_step(pshard)
    rng = np.random.default_rng(1)
    B = 8
    batch = {
        "img1": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "img2": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "gt1_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "gt2_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "valid1": jnp.ones((B, h, w), bool),
        "valid2": jnp.ones((B, h, w), bool),
    }
    batch = jax.device_put(batch, batch_sharding(mesh))
    # head1.dpt (pts3d head) receives gradients from the regr3d loss but is
    # frozen under gaussian-only finetuning; the encoder is frozen too.
    # (The gaussian DPTs only get gradients once the render loss is active.)
    enc_before = np.asarray(params["enc_blocks"]["block"]["attn"]["qkv"]["kernel"])
    dpt_before = np.asarray(params["head1"]["dpt"]["head_4"]["kernel"])
    params, _, m = step(params, opt_state, batch)
    assert np.isfinite(float(m["regr3d"]))
    np.testing.assert_array_equal(
        np.asarray(params["enc_blocks"]["block"]["attn"]["qkv"]["kernel"]), enc_before
    )
    np.testing.assert_array_equal(
        np.asarray(params["head1"]["dpt"]["head_4"]["kernel"]), dpt_before
    )


def test_tp_param_sharding_rules():
    """Megatron split rules: qkv/fc1 column-parallel, proj/fc2
    row-parallel, depth axis of scanned blocks untouched (no compile —
    validates the PartitionSpecs only)."""
    from jax.sharding import PartitionSpec as P

    from splatt3r_slam_tpu.parallel.mesh import param_sharding

    mesh = make_mesh(8, fsdp=2, tp=2)
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    from splatt3r_slam_tpu.models import init_model

    _, params = init_model(cfg, 32, 48)
    shard = param_sharding(mesh, params)

    qkv = shard["enc_blocks"]["block"]["attn"]["qkv"]["kernel"].spec
    assert qkv[-1] == "tp", f"qkv should be column-parallel, got {qkv}"
    proj = shard["enc_blocks"]["block"]["attn"]["proj"]["kernel"].spec
    assert proj[-2] == "tp", f"proj should be row-parallel, got {proj}"
    fc1 = shard["enc_blocks"]["block"]["mlp"]["fc1"]["kernel"].spec
    assert fc1[-1] == "tp"
    fc2 = shard["enc_blocks"]["block"]["mlp"]["fc2"]["kernel"].spec
    assert fc2[-2] == "tp"
    # a LayerNorm scale stays replicated
    patch = shard["patch_embed"]["proj"]["kernel"].spec
    assert "tp" not in tuple(patch)


@pytest.mark.slow  # new compile of the tp-sharded step (~1 min on CPU)
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_train_step_dp_fsdp_tp():
    """One step on the full (dp, fsdp, tp) mesh produces finite metrics
    matching the replicated-weights semantics (GSPMD equivalence)."""
    mesh = make_mesh(8, fsdp=2, tp=2)
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    trainer = Trainer(cfg, TrainConfig(train_gaussian_heads_only=False),
                      mesh=mesh)
    h, w = 16, 32
    params, opt_state, pshard = trainer.init_state(h, w)
    step = trainer.make_train_step(pshard)
    rng = np.random.default_rng(0)
    B = 4
    batch = {
        "img1": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "img2": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "gt1_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "gt2_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "valid1": jnp.ones((B, h, w), bool),
        "valid2": jnp.ones((B, h, w), bool),
    }
    batch = jax.device_put(batch, batch_sharding(mesh))
    params, opt_state, m = step(params, opt_state, batch)
    assert np.isfinite(float(m["regr3d"]))


def test_fit_loop_csv_logging(tmp_path):
    """Trainer.fit writes a CSV metrics file with step/wall_time/metric
    columns and runs eval rows (reference CSV-logger semantics,
    splatt3r_core/main.py:292-310). Runs on a 1-device mesh to stay
    fast."""
    import csv

    mesh = make_mesh(1)
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    trainer = Trainer(cfg, TrainConfig(train_gaussian_heads_only=False),
                      mesh=mesh)
    h, w = 16, 32
    params, opt_state, pshard = trainer.init_state(h, w)

    rng = np.random.default_rng(0)

    eye = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    Km = jnp.broadcast_to(
        jnp.array([[40.0, 0, w / 2], [0, 40, h / 2], [0, 0, 1]]),
        (1, 1, 3, 3))

    def mk_batch():
        return {
            "img1": jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32),
            "img2": jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32),
            "gt1_pts": jnp.asarray(rng.normal(size=(1, h, w, 3)),
                                   jnp.float32),
            "gt2_pts": jnp.asarray(rng.normal(size=(1, h, w, 3)),
                                   jnp.float32),
            "valid1": jnp.ones((1, h, w), bool),
            "valid2": jnp.ones((1, h, w), bool),
            # eval-step render keys (reference val/test protocol)
            "context_pose": eye,
            "target_pose": eye[:, None],
            "target_K": Km,
            "target_img": jnp.asarray(rng.random((1, 1, h, w, 3)),
                                      jnp.float32),
        }

    batches = [mk_batch() for _ in range(3)]
    params, opt_state, csv_path = trainer.fit(
        params, opt_state, pshard, batches, run_dir=tmp_path,
        eval_every=3, eval_batches=[mk_batch()],
    )
    rows = list(csv.DictReader(open(csv_path)))
    assert len(rows) == 4  # 3 train rows + 1 eval row
    assert "regr3d" in rows[0] and float(rows[0]["regr3d"]) > 0
    assert "wall_time_s" in rows[0]
    val_rows = [r for r in rows if r.get("val_psnr", "")]
    assert len(val_rows) == 1
    assert (tmp_path / "train_meta.json").exists()


def test_grad_clip_global_norm():
    """Gradient clipping parity with Lightning's gradient_clip_val
    (reference `splatt3r_core/main.py:382`): the optimizer chain rescales
    gradients to the global-norm ceiling BEFORE Adam sees them. Adam's
    first-step update is scale-invariant, so assert on the first moment
    (mu = (1-b1)·g_effective) accumulated in the optimizer state: with
    clipping, its global norm is (1-b1)·clip; without, (1-b1)·‖g‖.
    """
    mesh = make_mesh(1)
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()

    def mu_norm(clip):
        trainer = Trainer(
            cfg,
            TrainConfig(train_gaussian_heads_only=False,
                        grad_clip_norm=clip),
            mesh=mesh,
        )
        params = {"w": jnp.zeros(4), "b": jnp.zeros(2)}
        grads = {"w": jnp.array([3.0, 0, 0, 4.0]),
                 "b": jnp.array([0.0, 12.0])}  # global norm 13
        state = trainer.tx.init(params)
        _, state = trainer.tx.update(grads, state, params)
        mu_sq = 0.0
        for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
            if any(getattr(k, "name", "") == "mu" for k in path):
                mu_sq += float(jnp.sum(leaf ** 2))
        return float(np.sqrt(mu_sq))

    np.testing.assert_allclose(mu_norm(clip=0.5), 0.1 * 0.5, rtol=1e-5)
    np.testing.assert_allclose(mu_norm(clip=0.0), 0.1 * 13.0, rtol=1e-5)


def _tiny_batch(h, w, B, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "img1": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "img2": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "gt1_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "gt2_pts": jnp.asarray(rng.normal(size=(B, h, w, 3)), jnp.float32),
        "valid1": jnp.ones((B, h, w), bool),
        "valid2": jnp.ones((B, h, w), bool),
    }


def test_grad_accum_matches_single_step():
    """accum_steps=k on k identical microbatches == one plain step on
    that microbatch (mean of k equal grads is the grad), and params must
    not move before the k-th microbatch (optax.MultiSteps semantics =
    Lightning accumulate_grad_batches)."""
    h, w, B = 16, 32, 2
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    batch = _tiny_batch(h, w, B)

    t1 = Trainer(cfg, TrainConfig(train_gaussian_heads_only=False),
                 n_devices=1)
    p1, s1, sh1 = t1.init_state(h, w)
    p1, _, _ = t1.make_train_step(sh1)(p1, s1, batch)

    t2 = Trainer(cfg, TrainConfig(train_gaussian_heads_only=False,
                                  accum_steps=2), n_devices=1)
    p2, s2, sh2 = t2.init_state(h, w)
    step2 = t2.make_train_step(sh2)
    p2_ref = jax.tree.map(np.asarray, p2)
    p2, s2, _ = step2(p2, s2, batch)
    # first microbatch only accumulates: params unchanged
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p2_ref)):
        np.testing.assert_array_equal(np.asarray(a), b)
    p2, s2, _ = step2(p2, s2, batch)

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_remat_forward_and_grads_match():
    """cfg.remat rematerializes the scanned blocks: identical outputs
    and gradients, params tree unchanged (checkpoint compatibility)."""
    from splatt3r_slam_tpu.models import Splatt3RModel

    h, w = 16, 32
    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    cfg_r = cfg._replace(remat=True)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(1, h, w, 3)),
                      jnp.float32)

    m, mr = Splatt3RModel(cfg), Splatt3RModel(cfg_r)
    params = m.init(jax.random.PRNGKey(0), img, img)["params"]
    params_r = mr.init(jax.random.PRNGKey(0), img, img)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_r))

    def loss(mod):
        def f(p):
            r1, r2 = mod.apply({"params": p}, img, img)
            return jnp.sum(r1["pts3d"] ** 2) + jnp.sum(r2["conf"])
        return f

    l0, g0 = jax.value_and_grad(loss(m))(params)
    l1, g1 = jax.value_and_grad(loss(mr))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multichip_full_loss_dryrun_8dev():
    """The driver's round-gating check, in CI: ONE full-loss (MSE + SSIM
    + LPIPS through the rasterizer + Regr3D) sharded train step on the
    8-device (dp=2, fsdp=2, tp=2) mesh must compile and execute.

    Regression guard for the round-3 collective-permute rendezvous abort
    (MULTICHIP_r03.json rc=134): conftest raises the XLA:CPU rendezvous
    terminate timeout via XLA_FLAGS, and the dryrun shapes keep the
    inter-collective compute gaps small (see parallel/dryrun.py).
    """
    from splatt3r_slam_tpu.parallel.dryrun import full_loss_train_step

    m = full_loss_train_step(8)
    assert m["mesh"] == {"dp": 2, "fsdp": 2, "tp": 2}
    for k in ("loss", "mse", "ssim", "lpips", "regr3d"):
        assert np.isfinite(m[k]), (k, m)
    # every term is actually live in the total
    assert m["loss"] != m["regr3d"]
