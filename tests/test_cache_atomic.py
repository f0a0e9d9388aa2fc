"""Atomic persistent-compile-cache writes (utils/cache_atomic.py).

jax's stock ``LRUCache.put`` writes entries in place; a concurrent
reader (second process sharing the cache dir, or a threaded-backend
worker compiling alongside the frontend) can observe a half-written
file and SIGSEGV in ``backend.deserialize_executable``. The package
installs a temp+rename patch at import; these tests pin its semantics.
"""

import os
import threading

import pytest

import splatt3r_slam_tpu  # noqa: F401 - installs the patch



pytestmark = pytest.mark.smoke
@pytest.fixture()
def cache(tmp_path):
    from jax._src import lru_cache

    return lru_cache.LRUCache(str(tmp_path), max_size=-1), tmp_path


def test_patch_installed():
    from jax._src import lru_cache

    assert getattr(lru_cache.LRUCache.put, "_atomic_write", False)


def test_put_get_roundtrip_and_no_temp_leftovers(cache):
    c, path = cache
    val = os.urandom(1 << 16)
    c.put("k1", val)
    assert c.get("k1") == val
    # no temp files left behind, only the entry itself
    names = [p.name for p in path.iterdir()]
    assert names == ["k1-cache"]


def test_put_is_first_writer_wins(cache):
    c, _ = cache
    c.put("k", b"first")
    c.put("k", b"second")  # stock semantics: existing entries are kept
    assert c.get("k") == b"first"


def test_concurrent_readers_never_see_partial_entries(cache):
    """Hammer one key with a large write while readers poll: every
    successful read must be the COMPLETE value (rename is atomic), and
    the writer must never expose the final path before the content is
    fully on disk. With the stock in-place write this flakes."""
    c, _ = cache
    val = os.urandom(8 << 20)
    seen = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            got = c.get("big")
            if got is not None:
                seen.append(len(got))
                return

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    c.put("big", val)
    stop.set()
    for t in threads:
        t.join()
    assert all(n == len(val) for n in seen)
    assert c.get("big") == val
