"""Round-4 query features: doc-prior multiplier (PosdbTable SiteRank
multiplier analogue) and query budget (Msg39 deadline / PosdbTable
termlist-cap analogues)."""

import shutil
import time

import numpy as np
import pytest

IDX = "/tmp/idx_bp_test"
N_CONV = 300


@pytest.fixture(scope="module")
def bp_index(ray_session):
    from open_source_search_engine_ray.index.build import build_index
    from open_source_search_engine_ray.sources.transcripts import (
        transcripts_dataset)

    shutil.rmtree(IDX, ignore_errors=True)
    build_index(lambda: transcripts_dataset(N_CONV), IDX,
                input_token=f"synthetic:n={N_CONV}")
    yield IDX
    shutil.rmtree(IDX, ignore_errors=True)


def _searcher(idx):
    from open_source_search_engine_ray.query.engine import IndexSearcher

    return IndexSearcher(idx)


def _oracle():
    from open_source_search_engine_ray.query.oracle import OracleIndex
    from open_source_search_engine_ray.sources.transcripts import (
        transcripts_table)

    return OracleIndex(transcripts_table(N_CONV))


def test_doc_prior_flips_order_and_matches_oracle(bp_index):
    """A planted prior must (a) demote the unboosted #1 below a boosted
    lower-ranked doc and (b) produce IDENTICAL ranks+scores in engine and
    oracle (shared kernel)."""
    se, orc = _searcher(bp_index), _oracle()
    base_docs, base_scores = se.search("w0042", 5)
    assert len(base_docs) >= 3

    # boost the 3rd-ranked doc hard, demote the 1st
    prior_ids = np.sort(np.array([base_docs[0], base_docs[2]],
                                 dtype=np.uint64))
    mult = np.where(prior_ids == base_docs[2], 10.0, 0.1)
    prior = (prior_ids, mult.astype(np.float64))

    d1, s1 = se.search("w0042", 5, doc_prior=prior)
    d2, s2 = orc.search("w0042", 5, doc_prior=prior)
    assert list(d1) == list(d2) and list(s1) == list(s2)
    assert d1[0] == base_docs[2]                    # boost flipped the top
    assert base_docs[0] not in d1[:2]               # demotion pushed #1 down

    # no prior entries -> identical to unbudgeted search
    empty = (np.array([], dtype=np.uint64), np.array([], dtype=np.float64))
    d3, s3 = se.search("w0042", 5, doc_prior=empty)
    assert list(d3) == list(base_docs) and list(s3) == list(base_scores)


def test_budget_unbudgeted_identical(bp_index):
    se = _searcher(bp_index)
    d0, s0 = se.search("w0042 w0007", 10)
    d1, s1, partial = se.search_budgeted("w0042 w0007", 10,
                                         timeout_ms=60_000)
    assert not partial
    assert list(d0) == list(d1) and list(s0) == list(s1)


def test_budget_deadline_partial(bp_index):
    """An already-expired deadline returns immediately with the partial
    flag — no list is fetched."""
    se = _searcher(bp_index)
    t0 = time.monotonic()
    docs, scores, partial = se.search_budgeted("w0042 w0007", 10,
                                               timeout_ms=0)
    assert partial
    assert time.monotonic() - t0 < 1.0
    assert len(docs) == 0


def test_budget_list_cap_partial_and_bounded(bp_index):
    """A tiny per-term byte cap truncates the hot list: partial=True and
    every result doc comes from the truncated (docId-order) prefix."""
    from open_source_search_engine_ray.query.engine import (
        _truncate_postings)
    from open_source_search_engine_ray.query.parse import parse_query

    se = _searcher(bp_index)
    tid = parse_query("the", 0.0).terms[0].term_id
    full = se.get_postings(tid)
    assert full is not None and full.df > 64
    cap = 64 * 24
    trunc, was_cut = _truncate_postings(full, cap)
    assert was_cut and len(trunc.doc_ids) < len(full.doc_ids)
    assert trunc.df == full.df     # read cap never rewrites corpus df
    docs, scores, partial = se.search_budgeted("the", 10,
                                               max_list_bytes=cap)
    assert partial
    prefix = set(int(d) for d in trunc.doc_ids)
    assert len(docs) > 0
    assert all(int(d) in prefix for d in docs)


def test_distributed_budgeted_matches_driver(bp_index):
    """DistributedSearcher.search_budgeted must equal the driver-side
    budgeted search for the same byte cap, and equal unbudgeted search
    under a generous deadline."""
    from open_source_search_engine_ray.query.distributed import (
        DistributedSearcher)

    se = _searcher(bp_index)
    ds = DistributedSearcher(bp_index, n_servers=2)

    d0, s0 = se.search("w0042 w0007", 10)
    d1, s1, p1 = ds.search_budgeted("w0042 w0007", 10, timeout_ms=60_000)
    assert not p1
    assert list(d0) == list(d1) and list(s0) == list(s1)

    cap = 64 * 24
    da, sa, pa_ = se.search_budgeted("the", 10, max_list_bytes=cap)
    db, sb, pb = ds.search_budgeted("the", 10, max_list_bytes=cap)
    assert pa_ and pb
    assert list(da) == list(db) and list(sa) == list(sb)
