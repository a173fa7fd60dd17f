"""Monotone intra-turn position semantics (position_mode="monotone" —
the getWordPosVec cursor, XmlDoc.cpp:20056-20142): cursor unit goldens,
punctuation-aware quoted phrases, sentence-aware proximity, and engine ==
oracle rank identity with the mode on."""

import shutil

import pyarrow as pa
import pytest

from open_source_search_engine_ray.config import IndexConfig
from open_source_search_engine_ray.functions.tokenizer import (
    SENT_GAP, tokenize_pos)
from open_source_search_engine_ray.index.build import build_index
from open_source_search_engine_ray.query.engine import IndexSearcher
from open_source_search_engine_ray.query.oracle import OracleIndex
from open_source_search_engine_ray.sources.queryset import query_set
from open_source_search_engine_ray.sources.transcripts import (
    transcripts_dataset, transcripts_table)

IDX = "/tmp/osse_test_idx_mono"
N_CONV = 150


def mono(s):
    return tokenize_pos(s)[3]


class TestCursor:
    def test_space_gap(self):
        # word takes the cursor then +1; a space gap adds +1
        assert mono("a b c") == [0, 2, 4]

    def test_adjacent_no_gap_unicode(self):
        # script-change split: no punct between tokens → consecutive
        assert mono("abcдef") == [0, 1]

    def test_comma_gap(self):
        assert mono("a, b") == [0, 3]          # punct run ", " → +2

    def test_hyphen_gap(self):
        assert mono("cd-rom") == [0, 2]        # lone '-' → +1, like space

    def test_sentence_gap(self):
        p = mono("one two. three")
        assert p[0] == 0 and p[1] == 2
        assert p[2] == 2 + 1 + SENT_GAP        # ". " → +30

    def test_leading_punct(self):
        assert mono("  a") == [1]
        assert mono("(a)") == [2]

    def test_question_exclaim(self):
        assert mono("a? b")[1] - mono("a? b")[0] == 1 + SENT_GAP
        assert mono("a! b")[1] - mono("a! b")[0] == 1 + SENT_GAP


@pytest.fixture(scope="module")
def mono_config():
    return IndexConfig(position_mode="monotone")


@pytest.fixture(scope="module")
def built(ray_session, mono_config):
    shutil.rmtree(IDX, ignore_errors=True)
    return build_index(lambda: transcripts_dataset(N_CONV), IDX,
                       config=mono_config,
                       input_token=f"synthetic:n={N_CONV}:mono")


@pytest.fixture(scope="module")
def oracle(mono_config):
    return OracleIndex(transcripts_table(N_CONV), config=mono_config)


def test_rank_identity_monotone(built, oracle):
    se = IndexSearcher(IDX)
    assert se.config.position_mode == "monotone"
    n_nonempty = 0
    for qid, q, k in query_set():
        d1, s1 = se.search(q, k)
        d2, s2 = oracle.search(q, k)
        assert list(d1) == list(d2), (qid, q)
        assert list(s1) == list(s2), (qid, q)
        n_nonempty += bool(len(d1))
    assert n_nonempty >= 8


def test_rank_identity_monotone_proximity(built, oracle):
    se = IndexSearcher(IDX)
    for qid, q, k in query_set():
        d1, s1 = se.search(q, k, rerank="proximity")
        d2, s2 = oracle.search(q, k, rerank="proximity")
        assert list(d1) == list(d2) and list(s1) == list(s2), (qid, q)


def _mk_oracle(texts, mode):
    tbl = pa.table({
        "conv_id": [f"c{i}" for i in range(len(texts))],
        "turn_idx": [0] * len(texts),
        "role": ["user"] * len(texts),
        "text": texts,
        "tool": [None] * len(texts),
    })
    return OracleIndex(tbl, config=IndexConfig(position_mode=mode))


def test_phrase_respects_punctuation():
    """In monotone mode a quoted phrase must reproduce the query's own
    spacing: 'wombat, quokka' (comma) no longer matches the quoted query
    \"wombat quokka\" (space) — in ordinal mode punctuation is invisible
    and both match."""
    texts = ["the wombat quokka pair", "the wombat, quokka pair"]
    o_mono = _mk_oracle(texts, "monotone")
    o_ord = _mk_oracle(texts, "ordinal")
    d_ord, _ = o_ord.search('"wombat quokka"', 10)
    d_mono, _ = o_mono.search('"wombat quokka"', 10)
    assert len(d_ord) == 2
    assert len(d_mono) == 1
    assert o_mono.doc_to_conv[int(d_mono[0])] == "c0"
    # and a comma'd QUERY matches the comma'd doc (same cursor both sides)
    d_c, _ = o_mono.search('"wombat, quokka"', 10)
    assert {o_mono.doc_to_conv[int(d)] for d in d_c} == {"c1"}


def test_proximity_is_sentence_aware():
    """Same-sentence term pairs out-boost cross-sentence pairs under
    monotone positions (the SENT_UNITS cross-sentence penalty)."""
    texts = [
        "alpacazz bravozz together here today fine",   # same sentence
        "alpacazz ends. bravozz starts here today",    # sentence break
    ]
    o = _mk_oracle(texts, "monotone")
    docs, scores = o.search("alpacazz bravozz", 2, rerank="proximity")
    assert o.doc_to_conv[int(docs[0])] == "c0"
    assert scores[0] > scores[1]
