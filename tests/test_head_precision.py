"""bf16 DPT-trunk precision gate (production real-time profile).

The real-time profile runs the DPT head trunks in bfloat16 with an fp32
residual/fusion signal path and fp32 final projection (models/dpt.py
precision note); the reference computes its heads in fp32
(`splatt3r_slam/mast3r_utils.py:37-40`), which `head_dtype="float32"`
restores and the eval configs pin. This test bounds the bf16 deviation
at production head widths so a future change can't silently degrade it:

- raw head output: per-op rounding only (~0.7% of signal scale), i.e.
  the fp32 residual stream prevents error COMPOUNDING through the
  refinenet cascade (compounding bf16 residuals measured ~5x worse).
- after the expm1 depth activation (heads.py:27-30): mean depth
  relative error well under 2% — unbiased rounding noise, small against
  the network's own correlated few-percent geometric error, and the
  tracking GN averages it over thousands of residual rows
  (PARITY.md noise-averaging sweep).

Measured on this harness (96x128, seed 0): raw err mean 0.0042 / max
0.028 on scale 0.64; depth relerr mean 0.0073; direction err mean 0.42
degrees. Thresholds leave ~2-3x headroom for backend/jax drift.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatt3r_slam_tpu.models.dpt import DPT


@pytest.mark.slow
def test_bf16_dpt_trunk_precision_bounds():
    H, W, p = 96, 128, 16
    N = (H // p) * (W // p)
    rng = np.random.default_rng(0)
    hooks = [
        jnp.asarray(rng.normal(size=(1, N, c)).astype(np.float32))
        for c in (1024, 768, 768, 768)
    ]

    def run(dt):
        m = DPT(num_channels=4, dtype=dt)
        params = m.init(jax.random.PRNGKey(0), hooks, (H, W))
        return np.asarray(m.apply(params, hooks, (H, W)), np.float64)

    a = run(jnp.float32)
    b = run(jnp.bfloat16)

    # identical parameter trees: only the compute dtype differs
    d = np.abs(a - b)
    scale = np.abs(a).mean()
    assert d.mean() < 0.02 * scale, (d.mean(), scale)
    assert d.max() < 0.15 * scale, (d.max(), scale)

    # depth (expm1-activated norm) and ray direction, as consumed by
    # matching + the pose GN
    xyz_a, xyz_b = a[..., :3], b[..., :3]
    na = np.linalg.norm(xyz_a, axis=-1)
    nb = np.linalg.norm(xyz_b, axis=-1)
    depth_a, depth_b = np.expm1(na), np.expm1(nb)
    rel_depth = np.abs(depth_a - depth_b) / (depth_a + 1e-6)
    cos = (xyz_a * xyz_b).sum(-1) / np.maximum(na * nb, 1e-12)
    ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    assert rel_depth.mean() < 0.02, rel_depth.mean()
    assert ang.mean() < 1.5, ang.mean()
