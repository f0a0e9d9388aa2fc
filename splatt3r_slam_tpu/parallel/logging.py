"""Training observability: CSV metrics logger + profiler trace window.

Spec: the reference wires Lightning CSV/W&B loggers and an optional
PyTorchProfiler with chrome-trace export into its trainer
(`splatt3r_core/main.py:292-328`). TPU equivalents: a dependency-free
CSV logger with the same metric-dict semantics, and a `jax.profiler`
trace window (chrome-trace/TensorBoard-viewable) around a chosen step
range.
"""

from __future__ import annotations

import csv
import json
import pathlib
import time


class MetricsLogger:
    """Append-style CSV metrics file per run (+ metadata JSON).

    Columns grow with the union of metric keys seen — rows written
    before a key appears hold ''. `log(step, metrics)` accepts scalars,
    0-d arrays, or anything float()-able.
    """

    def __init__(self, run_dir, run_name: str = "train", meta: dict = None):
        self.dir = pathlib.Path(run_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / f"{run_name}_metrics.csv"
        self.path.unlink(missing_ok=True)
        self._keys = []
        self._t0 = time.time()
        if meta:
            (self.dir / f"{run_name}_meta.json").write_text(
                json.dumps(meta, indent=1, default=str)
            )

    def log(self, step: int, metrics: dict):
        row = {"step": int(step),
               "wall_time_s": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = str(v)
        new_keys = [k for k in row if k not in self._keys]
        if new_keys:
            # header grows (e.g. val_* metrics appearing): rewrite the
            # file once under the widened header. Rare — bounded by the
            # number of distinct key sets, so logging stays O(n) overall
            # (a steady-state log() is a single appended line).
            old = []
            if self._keys and self.path.exists():
                with open(self.path, newline="") as f:
                    old = list(csv.DictReader(f))
            self._keys.extend(new_keys)
            with open(self.path, "w", newline="") as f:
                wr = csv.DictWriter(f, fieldnames=self._keys, restval="")
                wr.writeheader()
                wr.writerows(old)
                wr.writerow(row)
            return
        with open(self.path, "a", newline="") as f:
            csv.DictWriter(f, fieldnames=self._keys, restval="").writerow(row)


class TraceWindow:
    """`jax.profiler` trace around steps [start, stop) — the reference's
    PyTorchProfiler schedule equivalent. Call `.step(i)` once per train
    step; trace files land under `logdir` (TensorBoard / xprof)."""

    def __init__(self, logdir, start: int, stop: int):
        self.logdir = str(logdir)
        self.start, self.stop = int(start), int(stop)
        self._active = False

    def step(self, i: int):
        import jax

        if not self._active and self.start <= i < self.stop:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif self._active and i >= self.stop:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
