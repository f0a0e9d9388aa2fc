"""Atomic writes for jax's persistent compilation cache.

jax's ``LRUCache.put`` (jax/_src/lru_cache.py) writes cache entries with
a bare ``cache_path.write_bytes(val)`` — directly to the final path. In
the no-eviction mode (``max_size == -1``, our default) there is no file
lock either, so a concurrent reader — another process sharing the cache
dir, or another thread (threaded backend worker compiling while the
frontend compiles) — can ``read_bytes`` a HALF-WRITTEN entry. The
deserializer then crashes the process with SIGSEGV inside
``compilation_cache.get_executable_and_time``. (Note: the deterministic
suite-tail segfault at that same line turned out to be mmap-count
exhaustion, fixed in ``tests/conftest.py::_mmap_guard`` — this patch
closes the separate torn-write window, which remains real for
concurrent multi-process cache sharing.)

Fix: write to a temp file in the same directory, then ``os.replace``
(atomic POSIX rename) — readers only ever see complete entries. The
eviction-enabled mode already serializes get/put under a file lock, so
it is delegated to the original implementation unchanged.

Installed from ``splatt3r_slam_tpu/__init__.py`` so every entry point
(main.py, bench.py, scripts, tests) gets it.
"""

import os
import threading


def install_atomic_cache_writes() -> None:
    """Monkeypatch ``jax._src.lru_cache.LRUCache.put`` with an atomic
    temp-file + rename write. Idempotent; a no-op if jax internals moved."""
    try:
        from jax._src import lru_cache as _lru
    except Exception:  # pragma: no cover - jax layout changed
        return
    if getattr(_lru.LRUCache.put, "_atomic_write", False):
        return
    orig_put = _lru.LRUCache.put
    suffix = getattr(_lru, "_CACHE_SUFFIX", "-cache")

    def put(self, key, val):
        # eviction mode serializes under a file lock (and so do its
        # readers) — keep the stock behavior there; empty keys raise in
        # the original too.
        if not key or getattr(self, "eviction_enabled", True):
            return orig_put(self, key, val)
        cache_path = self.path / f"{key}{suffix}"
        if cache_path.exists():
            return
        tmp = self.path / (
            f".{key}.tmp-{os.getpid()}-{threading.get_ident()}"
        )
        try:
            tmp.write_bytes(val)
            os.replace(str(tmp), str(cache_path))
        except OSError:
            try:
                tmp.unlink()
            except OSError:
                pass

    put._atomic_write = True
    _lru.LRUCache.put = put
