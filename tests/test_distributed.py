"""Distributed shard-server query path must be bit-identical to the local
searcher (same kernel, same merged lists; only the fetch topology differs)."""

import pytest

from open_source_search_engine_ray.query.distributed import (
    DistributedSearcher)
from open_source_search_engine_ray.query.engine import IndexSearcher
from open_source_search_engine_ray.sources.queryset import query_set

IDX = "/tmp/osse_test_idx"  # built by test_build_query's module fixture


@pytest.fixture(scope="module")
def both(ray_session):
    import os
    if not os.path.exists(f"{IDX}/index_meta.json"):
        import shutil
        from open_source_search_engine_ray.index.build import build_index
        from open_source_search_engine_ray.sources.transcripts import (
            transcripts_dataset)
        shutil.rmtree(IDX, ignore_errors=True)
        build_index(lambda: transcripts_dataset(300), IDX,
                    input_token="synthetic:n=300")
    return IndexSearcher(IDX), DistributedSearcher(IDX, n_servers=3)


def test_distributed_equals_local(both):
    local, dist = both
    for qid, q, k in query_set():
        d1, s1 = local.search(q, k)
        d2, s2 = dist.search(q, k)
        assert list(d1) == list(d2), (qid, q)
        assert list(s1) == list(s2), (qid, q)


def test_distributed_cache_warm(both):
    _, dist = both
    d1, s1 = dist.search("w0002 w0042", 10)
    d2, s2 = dist.search("w0002 w0042", 10)  # cached lists
    assert list(d1) == list(d2) and list(s1) == list(s2)


def test_search_parallel_equals_local(both):
    """The docId-range-split exact path (Msg39.cpp:411-466 analogue) must
    reproduce search() rank- and score-identically for every query class,
    at several range counts (including ranges ≫ matching docs)."""
    local, _ = both
    for n_ranges in (2, 4, 7):
        for qid, q, k in query_set():
            d1, s1 = local.search(q, k)
            d2, s2 = local.search_parallel(q, k, n_ranges=n_ranges)
            assert list(d1) == list(d2), (qid, q, n_ranges)
            assert list(s1) == list(s2), (qid, q, n_ranges)


def test_distributed_search_parallel_equals_local(both):
    """The distributed coordinator's range-split path must also reproduce
    the local searcher exactly (shared parallel_evaluate helper over its
    fetched+merged lists)."""
    local, dist = both
    for qid, q, k in query_set():
        d1, s1 = local.search(q, k)
        d2, s2 = dist.search_parallel(q, k, n_ranges=3)
        assert list(d1) == list(d2), (qid, q)
        assert list(s1) == list(s2), (qid, q)


def test_search_parallel_auto_small_query_stays_local(both):
    """Auto range sizing must fall back to the single-process kernel for
    small queries (n_ranges computed from total postings)."""
    local, _ = both
    d1, s1 = local.search("w0042", 10)
    d2, s2 = local.search_parallel("w0042", 10)   # n_ranges=None
    assert list(d1) == list(d2) and list(s1) == list(s2)
