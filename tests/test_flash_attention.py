"""Flash-attention path: selection heuristic + TPU numerics.

The Pallas flash kernel regressed the fused tracking step 44% at the
production 768-token shape (round-2 driver bench 26.2 -> 18.5 FPS), so
"auto" now engages it only above a measured crossover
(`layers._FLASH_AUTO_MIN_SCORES`). CPU-safe tests pin the heuristic;
the `tpu`-marked test (RUN_TPU_TESTS=1, run in a subprocess WITHOUT the
conftest CPU forcing) asserts forward AND gradient agreement between the
flash and einsum paths — the advisor's round-2 medium finding: gradients
flow through `_attend` in the trainer (parallel/trainer.py), so flash
numerics must be covered under `jax.grad`, not just forward.
"""

import os
import subprocess
import sys
import textwrap

import pytest

from splatt3r_slam_tpu.models import layers as L


class TestFlashHeuristic:
    def teardown_method(self):
        L.set_flash_attention("auto")

    def test_auto_rejects_tracking_shape(self):
        # production tracking shape: 768 q/kv tokens, head dim 64 —
        # einsum measured 44% faster end to end; auto must NOT pick flash
        L.set_flash_attention("auto")
        assert not L._flash_wanted(768, 768, 64)

    def test_auto_accepts_huge_shape_on_tpu_only(self):
        L.set_flash_attention("auto")
        import jax

        want = L._flash_wanted(4096, 4096, 64)
        if jax.default_backend() in ("cpu", "gpu"):
            assert not want
        else:
            assert want

    def test_on_requires_tileable_shape(self):
        L.set_flash_attention("on")
        assert L._flash_wanted(768, 768, 64)
        assert not L._flash_wanted(100, 768, 64)  # n_q % 256 != 0
        assert not L._flash_wanted(768, 768, 48)  # dh % 64 != 0

    def test_off_wins(self):
        L.set_flash_attention("off")
        assert not L._flash_wanted(4096, 4096, 64)

    def test_bad_mode_rejected(self):
        with pytest.raises(AssertionError):
            L.set_flash_attention("fast")


_TPU_NUMERICS = textwrap.dedent("""
    import numpy as np
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    import sys; sys.path.insert(0, %(root)r)
    from splatt3r_slam_tpu.models import layers as L

    assert jax.default_backend() not in ("cpu",), jax.default_backend()
    rng = np.random.default_rng(0)
    B, N, H, D = 1, 768, 12, 64
    q = jnp.asarray(rng.standard_normal((B, N, H, D), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, N, H, D), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((B, N, H, D), dtype=np.float32))
    scale = D ** -0.5

    def loss(fn, q, k, v):
        return (fn(q, k, v, scale).astype(jnp.float32) ** 2).sum()

    # forward agreement
    L.set_flash_attention("off")
    ref = jax.jit(lambda q, k, v: L._attend(q, k, v, scale))(q, k, v)
    ref = np.asarray(ref, np.float32)
    got = jax.jit(lambda q, k, v: L._attend_flash(q, k, v, scale))(q, k, v)
    got = np.asarray(got, np.float32)
    fwd_err = np.abs(ref - got).max()

    # gradient agreement (flash VJP vs einsum VJP), fp32 inputs
    g_ref = jax.jit(jax.grad(lambda q: loss(L._attend, q, k, v)))(q)
    g_fl = jax.jit(jax.grad(lambda q: loss(
        lambda a, b, c, s: L._attend_flash(a, b, c, s), q, k, v)))(q)
    g_err = np.abs(np.asarray(g_ref) - np.asarray(g_fl)).max()
    g_scale = np.abs(np.asarray(g_ref)).max()

    print(f"FWD_ERR {fwd_err:.3e} GRAD_ERR {g_err:.3e} GSCALE {g_scale:.3e}")
    assert fwd_err < 5e-3, fwd_err                  # fp32 softmax both paths
    assert g_err < 5e-3 * max(g_scale, 1.0), (g_err, g_scale)
    print("TPU_FLASH_PARITY_OK")
""")


@pytest.mark.tpu
@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("RUN_TPU_TESTS"),
    reason="needs real TPU (set RUN_TPU_TESTS=1)",
)
def test_flash_matches_einsum_fwd_and_grad_on_tpu():
    """Run flash-vs-einsum fwd+grad parity on the real TPU.

    Subprocess: the suite conftest pins JAX_PLATFORMS=cpu process-wide.
    """
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", _TPU_NUMERICS % {"root": root}],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert "TPU_FLASH_PARITY_OK" in r.stdout, (r.stdout, r.stderr)
