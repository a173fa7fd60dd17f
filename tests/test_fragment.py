"""Intra-turn repeated-fragment suppression (getFragVec analogue,
XmlDoc.cpp:20286-20304): mask unit semantics, engine/oracle rank identity
with the flag on, and the no-inflation property — repeated boilerplate
inside one conversation stops boosting its score."""

import shutil

import numpy as np
import pyarrow as pa
import pytest

from open_source_search_engine_ray.config import IndexConfig
from open_source_search_engine_ray.functions.tokenizer import (
    TokenHashCache, fragment_mask, terms_for_texts)
from open_source_search_engine_ray.index.build import build_index
from open_source_search_engine_ray.query.engine import IndexSearcher
from open_source_search_engine_ray.query.oracle import OracleIndex
from open_source_search_engine_ray.sources.queryset import query_set
from open_source_search_engine_ray.sources.transcripts import (
    transcripts_dataset, transcripts_table)

IDX = "/tmp/osse_test_idx_frag"
N_CONV = 200


def _mask(texts, n):
    cache = TokenHashCache()
    toks, rows = [], []
    for r, t in enumerate(texts):
        from open_source_search_engine_ray.functions.tokenizer import tokenize
        tt = tokenize(t)[0]
        toks.extend(tt)
        rows.extend([r] * len(tt))
    wids = cache.lookup(toks)
    return fragment_mask(wids, np.asarray(rows, dtype=np.int64), n), toks


class TestMaskUnit:
    def test_exact_repeat_masked_first_kept(self):
        text = "alpha beta gamma delta epsilon x alpha beta gamma delta epsilon"
        m, toks = _mask([text], 5)
        # first occurrence (tokens 0-4) kept, separator kept, copy masked
        assert not m[:6].any()
        assert m[6:].all()

    def test_long_fragment_fully_masked(self):
        frag = "one two three four five six seven"
        m, toks = _mask([f"{frag} filler {frag}"], 5)
        # all 7 words of the second copy masked (coverage, not just starts)
        assert not m[:8].any()
        assert m[8:].all()

    def test_no_cross_row_match(self):
        frag = "alpha beta gamma delta epsilon"
        m, _ = _mask([frag, frag], 5)  # same fragment, different turns
        assert not m.any()

    def test_short_window_no_mask(self):
        m, _ = _mask(["a b c a b c"], 5)  # repeats shorter than n
        assert not m.any()

    def test_disabled(self):
        m, _ = _mask(["x y z x y z x y z x y z"], 0)
        assert not m.any()

    def test_all_same_token(self):
        m, toks = _mask(["q " * 12], 5)
        # windows 1..7 repeat window 0 → tokens 1..11 masked
        assert not m[0] and m[1:].all()


class TestTermsFiltered:
    def test_postings_and_counts_drop_masked(self):
        frag = "alpha beta gamma delta epsilon"
        text = f"{frag} zz {frag}"
        cache = TokenHashCache()
        r0, t0, p0, b0 = terms_for_texts([text], cache)
        r1, t1, p1, b1 = terms_for_texts([text], cache, fragment_suppress=5)
        # 6 unigrams survive (first copy + zz); no bigram touches the copy
        assert int((~b1).sum()) == 6
        assert int((~b0).sum()) == 11
        # surviving positions are the original ordinals 0..5
        assert sorted(p1[~b1].tolist()) == [0, 1, 2, 3, 4, 5]
        # bigrams: only within the unmasked prefix (5 adjacent pairs)
        assert int(b1.sum()) == 5
        surviving = set(t1.tolist())
        assert surviving <= set(t0.tolist())


@pytest.fixture(scope="module")
def frag_config():
    return IndexConfig(fragment_suppress=5)


@pytest.fixture(scope="module")
def built(ray_session, frag_config):
    shutil.rmtree(IDX, ignore_errors=True)
    return build_index(lambda: transcripts_dataset(N_CONV), IDX,
                       config=frag_config,
                       input_token=f"synthetic:n={N_CONV}:frag")


@pytest.fixture(scope="module")
def oracle(frag_config):
    return OracleIndex(transcripts_table(N_CONV), config=frag_config)


def test_rank_identity_with_suppression(built, oracle):
    se = IndexSearcher(IDX)
    n_nonempty = 0
    for qid, q, k in query_set():
        d1, s1 = se.search(q, k)
        d2, s2 = oracle.search(q, k)
        assert list(d1) == list(d2), (qid, q)
        assert list(s1) == list(s2), (qid, q)
        n_nonempty += bool(len(d1))
    assert n_nonempty >= 8


def test_boilerplate_stops_inflating(ray_session):
    """A doc that repeats a fragment 8× in one turn must not out-score a
    doc containing it once, after suppression (equal tf, near-equal dl)."""
    frag = "quokka wombat numbat bilby dunnart stack trace overflow"
    rows = {
        "conv_id": ["spam", "clean"],
        "turn_idx": [0, 0],
        "role": ["user", "user"],
        "text": [" ".join([frag] * 8), frag + " extra words here"],
        "tool": [None, None],
    }
    tbl = pa.table(rows)
    with_sup = OracleIndex(tbl, config=IndexConfig(fragment_suppress=5))
    no_sup = OracleIndex(tbl, config=IndexConfig())
    d0, s0 = no_sup.search("quokka", 2)
    d1, s1 = with_sup.search("quokka", 2)
    spam_id = [d for d, c in with_sup.doc_to_conv.items() if c == "spam"][0]
    # without suppression the spammy doc wins on tf
    assert d0[0] == spam_id and s0[0] > s0[1]
    # with suppression its tf collapses to 1 — scores match the shape of
    # tf=1 docs (spam doc keeps exactly the first fragment's tokens)
    from open_source_search_engine_ray.query.parse import parse_query

    tid = parse_query("quokka", 0.8).terms[0].term_id
    tp = with_sup.get_postings(tid)
    assert tp is not None and int(tp.tfs.sum()) == 2  # tf=1 per doc
    tp0 = no_sup.get_postings(tid)
    assert int(tp0.tfs.sum()) == 9  # 8 + 1 without suppression
    assert s1[0] <= s0[0]
