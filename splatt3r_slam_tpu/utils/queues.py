"""Queue helpers for the viewer channel.

Parity: `splatt3r_slam/multiprocess_utils.py:1-29` (new_queue /
try_get_msg / FakeQueue). Single-process design → plain queue.Queue; the
FakeQueue keeps headless mode allocation-free.
"""

from __future__ import annotations

import queue


def new_queue(use_fake: bool = False):
    return FakeQueue() if use_fake else queue.Queue()


def try_get_msg(q):
    try:
        return q.get_nowait()
    except Exception:
        return None


class FakeQueue:
    def put(self, arg, **kwargs):
        del arg

    def get_nowait(self):
        raise queue.Empty

    def get(self, **kwargs):
        raise queue.Empty

    def qsize(self):
        return 0

    def empty(self):
        return True
