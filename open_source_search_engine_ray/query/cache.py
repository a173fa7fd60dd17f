"""Bounded decoded-list cache for long-lived serving actors.

The reference bounds its per-host page cache (``RdbCache`` /
``Msg5``-side list cache) by a configured byte budget; the engine's
searcher and shard-server actors previously cached decoded
``TermPostings`` without limit, so an adversarial stream of distinct
terms would grow an actor's heap unboundedly.  ``LruBytesCache`` is the
byte-budgeted LRU replacement: entries are sized by their numpy/bytes
payloads at insert time, and least-recently-used entries are evicted
once the budget is exceeded.  Hot lists (stopwords hit by every other
query) stay resident through recency alone — no explicit pinning needed.

Sizing is an estimate taken at insert: lazily-attached fields (the
impact-order cache ``TermPostings.impact``) are not re-measured, which
under-counts by at most ~2× for a list that later serves the
impact-ordered path — the budget is a soft bound, which is all a page
cache needs.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict

import numpy as np

MISSING = object()


def approx_nbytes(obj) -> int:
    """Recursive payload size estimate (numpy arrays + byte blobs
    dominate; everything else counts a fixed overhead)."""
    if isinstance(obj, np.ndarray):
        return obj.nbytes + 64
    if isinstance(obj, (bytes, bytearray, memoryview)):
        return len(obj) + 64
    if isinstance(obj, (list, tuple)):
        return 64 + sum(approx_nbytes(x) for x in obj)
    if isinstance(obj, dict):
        return 64 + sum(approx_nbytes(v) for v in obj.values())
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return 64 + sum(approx_nbytes(v) for v in vars(obj).values())
    return 64


class LruBytesCache:
    """LRU keyed map bounded by estimated payload bytes.

    ``get`` returns ``default`` on miss — ``None`` is a legitimate cached
    value (an absent term), so callers distinguish misses with the
    :data:`MISSING` sentinel."""

    def __init__(self, max_bytes: int = 256 << 20):
        self._d: OrderedDict = OrderedDict()   # key -> (value, size)
        self._bytes = 0
        self.max_bytes = int(max_bytes)

    def __contains__(self, key) -> bool:
        return key in self._d

    def __len__(self) -> int:
        return len(self._d)

    @property
    def nbytes(self) -> int:
        return self._bytes

    def get(self, key, default=None):
        ent = self._d.get(key)
        if ent is None:
            return default
        self._d.move_to_end(key)
        return ent[0]

    def put(self, key, value, size: int | None = None) -> None:
        """Insert ``value``; ``size`` overrides the estimate when the
        stored object is a handle (e.g. a Ray ObjectRef) whose real
        payload lives elsewhere."""
        size = approx_nbytes(value) if size is None else int(size)
        old = self._d.pop(key, None)
        if old is not None:
            self._bytes -= old[1]
        self._d[key] = (value, size)
        self._bytes += size
        # keep at least the newest entry even if it alone busts the budget
        while self._bytes > self.max_bytes and len(self._d) > 1:
            _, (_, s) = self._d.popitem(last=False)
            self._bytes -= s
