"""Profiling: device-synced stopwatch, per-tag Benchmarker, XLA traces.

Parity targets:
- `splatt3r_slam/tictoc.py:4-30` (CUDA-event tic/toc) → host stopwatch
  with `jax.block_until_ready` sync;
- `splatt3r_core/src/pixelsplat_src/benchmarker.py:12-42` (tag → time
  list, JSON dump, summarize);
- the reference's optional PyTorchProfiler (`splatt3r_core/main.py:313-328`)
  → `trace()` context manager around `jax.profiler` (TensorBoard/XProf
  trace directory).
"""

from __future__ import annotations

import contextlib
import json
import pathlib
import time
from collections import defaultdict

import jax
import numpy as np


class Timer:
    """tic/toc stopwatch; optionally syncs on device values."""

    def __init__(self):
        self.t0 = None

    def tic(self):
        self.t0 = time.perf_counter()

    def toc(self, sync_on=None, verbose=False, tag=""):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self.t0
        if verbose:
            print(f"[timer] {tag}: {dt * 1e3:.2f} ms")
        return dt


_global_timer = Timer()


def tic():
    _global_timer.tic()


def toc(sync_on=None, verbose=True, tag=""):
    return _global_timer.toc(sync_on, verbose, tag)


class Benchmarker:
    """Per-tag wall-clock accumulation + JSON dump (benchmarker.py parity)."""

    def __init__(self):
        self.execution_times = defaultdict(list)

    @contextlib.contextmanager
    def time(self, tag: str, num_calls: int = 1):
        start = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - start) / num_calls
            self.execution_times[tag].extend([dt] * num_calls)

    def dump(self, path):
        path = pathlib.Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        with open(path, "w") as f:
            json.dump(dict(self.execution_times), f)

    def dump_memory(self, path):
        """Device memory stats (replaces torch.cuda peak-memory dump)."""
        path = pathlib.Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        stats = {}
        for d in jax.devices():
            try:
                s = d.memory_stats() or {}
                stats[str(d)] = {k: int(v) for k, v in s.items()}
            except Exception:
                stats[str(d)] = {}
        with open(path, "w") as f:
            json.dump(stats, f)

    def summarize(self) -> dict:
        return {
            tag: {"mean_s": float(np.mean(v)), "n": len(v)}
            for tag, v in self.execution_times.items()
        }


@contextlib.contextmanager
def trace(logdir: str):
    """XLA profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
