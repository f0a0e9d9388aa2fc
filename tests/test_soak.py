"""Long-horizon soak (scaled for CI): buffers stay bounded, FPS stays
flat, and the keyframe buffer degrades gracefully past its capacity.

Spec: reference eviction semantics — gaussian drop-oldest-half
(frame.py:421-434) and the edge window the reference reads but never
enforces (global_opt.py:26,89-96; we enforce `local_opt.max_edges`) —
plus the 512-KF capacity (frame.py:248) that must not kill a long run.
The full-scale TPU soak is `scripts/soak.py` (logs/soak_tpu_v5e.json).
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_soak_bounded_buffers_flat_fps():
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    r = subprocess.run(
        [sys.executable, "scripts/soak.py", "--tiny",
         "--frames", "240", "--kf-every", "4",
         "--kf-capacity", "24", "--max-edges", "16",
         "--max-gaussians", "4096"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )

    # graceful past-capacity behavior: the run CONTINUED beyond 24
    # keyframes (the reference hard-fails at its 512 equivalent)
    assert out["keyframes_final"] > 24
    assert out["over_capacity_frames"] > 0

    # sliding-window edge eviction held the cap
    assert out["edges_final"] <= 16

    # gaussian pool: FIFO half-eviction fired and the cap held
    assert out["pool_evictions"] >= 1
    assert out["gaussians_final"] <= 4096

    # FPS flat across thirds (generous 3x band: 1-core shared host)
    fps = [t["fps"] for t in out["thirds"]]
    assert len(fps) == 3
    assert fps[2] > fps[0] / 3.0, f"FPS collapsed across thirds: {fps}"

    # no unbounded growth in tracked structures between thirds
    edges = [t["edges"] for t in out["thirds"]]
    gauss = [t["gaussians"] for t in out["thirds"]]
    assert max(edges) <= 16
    assert max(gauss) <= 4096
