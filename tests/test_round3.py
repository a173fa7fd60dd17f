"""Round-3 hardening: byte-bounded decoded-list caches (VERDICT r2
next-step #6) and hot-term layout persistence across resume (ADVICE r2
medium — resampling on resume could route hot terms to salted shards that
were never written)."""

import shutil

import numpy as np
import pytest

from open_source_search_engine_ray.query.cache import LruBytesCache, MISSING


def test_lru_bytes_cache_semantics():
    c = LruBytesCache(max_bytes=1000)
    a = np.zeros(50, dtype=np.int64)            # ~400 + 64 bytes
    c.put("a", a)
    c.put("b", np.zeros(50, dtype=np.int64))
    assert c.get("a") is a
    # inserting a third 464-byte entry busts 1000 → evict LRU ("b",
    # since "a" was touched last)
    c.put("c", np.zeros(50, dtype=np.int64))
    assert c.get("b", MISSING) is MISSING
    assert c.get("a") is a
    assert c.get("c") is not None
    # None is a legitimate cached value, distinct from a miss
    c.put("n", None)
    assert c.get("n", MISSING) is None
    # a single entry over budget is kept (never evict the newest)
    c.put("big", np.zeros(1000, dtype=np.int64))
    assert c.get("big") is not None
    assert len(c) >= 1


def test_searcher_cache_bounded(ray_session):
    """A distinct-term query stream through a capped searcher stays within
    the byte budget and returns the same results as an uncapped one."""
    from open_source_search_engine_ray.index.build import build_index
    from open_source_search_engine_ray.query.engine import IndexSearcher
    from open_source_search_engine_ray.sources.transcripts import (
        transcripts_dataset)

    idx = "/tmp/osse_cache_idx"
    shutil.rmtree(idx, ignore_errors=True)
    build_index(lambda: transcripts_dataset(150), idx,
                input_token="synthetic:n=150")
    cap = 150_000
    capped = IndexSearcher(idx, cache_bytes=cap)
    full = IndexSearcher(idx)
    hits = 0
    for i in range(250):
        q = f"w{i:04d}"
        d1, s1 = capped.search(q, 5)
        d2, s2 = full.search(q, 5)
        assert list(d1) == list(d2) and list(s1) == list(s2), q
        hits += len(d1) > 0
    assert hits > 50                      # the stream actually hit terms
    # soft bound: at most the budget + one oversized newest entry
    assert capped._cache.nbytes <= cap * 2
    assert len(capped._cache) < len(full._cache)
    shutil.rmtree(idx, ignore_errors=True)


def test_hot_terms_persisted_for_resume(ray_session, monkeypatch):
    """Resume must reuse the hot-term set the existing shards were salted
    under — never resample (the sample depends on block structure and
    sampler version, neither captured by the fingerprint)."""
    from open_source_search_engine_ray.index import build as B
    from open_source_search_engine_ray.sources.transcripts import (
        transcripts_dataset)

    idx = "/tmp/osse_hotresume_idx"
    shutil.rmtree(idx, ignore_errors=True)
    meta1 = B.build_index(lambda: transcripts_dataset(150), idx,
                          input_token="synthetic:n=150")
    calls = []

    def poisoned_sample(*a, **k):
        calls.append(1)
        return np.asarray([0xDEAD], dtype=np.uint64)

    monkeypatch.setattr(B, "estimate_hot_terms", poisoned_sample)
    meta2 = B.build_index(lambda: transcripts_dataset(150), idx,
                          input_token="synthetic:n=150", resume=True)
    assert calls == [], "resume resampled hot terms"
    assert meta2["hot_terms"] == meta1["hot_terms"]
    shutil.rmtree(idx, ignore_errors=True)
