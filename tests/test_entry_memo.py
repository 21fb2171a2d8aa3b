"""__spark_entry__ memo helpers under the concurrent sweep harness:
fills must be compute-once per key (tools/oracle_check.py runs faces
from a thread pool; a double-computed training chain would waste the
parallel gain and double-cache plans)."""

from __future__ import annotations

import threading
import time


def test_memo_fill_is_compute_once():
    import __spark_entry__ as ent

    calls = []

    def slow_make():
        calls.append(1)
        time.sleep(0.2)
        return object()

    key = ("test-app", "memo-race-key")
    try:
        results = []
        threads = [
            threading.Thread(
                target=lambda: results.append(ent._memo_fill(key, slow_make))
            )
            for _ in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(calls) == 1, "make() ran more than once under contention"
        assert len(set(map(id, results))) == 1, "threads saw different values"
    finally:
        ent._MEMO.pop(key, None)
        ent._MEMO_LOCKS.pop(key, None)
