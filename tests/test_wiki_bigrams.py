"""Wiki-phrase bigram boost (functions/wiki_phrases.py): the
``WIKI_BIGRAM_WEIGHT²`` rule (``PosdbTable.h:22``, ``PosdbTable.cpp:436``)
as a query-side phrase-dictionary weight on bigram boost terms."""

import shutil

import pyarrow as pa
import pytest

from open_source_search_engine_ray.functions.ghash import doc_id_for_conv
from open_source_search_engine_ray.functions.wiki_phrases import (
    DEFAULT_WIKI_BIGRAMS, WIKI_BIGRAM_BOOST, load_wiki_bigrams)
from open_source_search_engine_ray.query.oracle import OracleIndex
from open_source_search_engine_ray.query.parse import parse_query


def _mk(rows):
    conv_id, turn_idx, role, text, tool, ts = [], [], [], [], [], []
    for c, t, r, x in rows:
        conv_id.append(c)
        turn_idx.append(t)
        role.append(r)
        text.append(x)
        tool.append(None)
        ts.append(0)
    return pa.table({
        "conv_id": pa.array(conv_id),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(role), "text": pa.array(text),
        "tool": pa.array(tool, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def test_parse_weight_boost():
    pq0 = parse_query("machine learning")
    pq1 = parse_query("machine learning", wiki_bigrams=DEFAULT_WIKI_BIGRAMS)
    bg0 = [t for t in pq0.terms if t.is_bigram]
    bg1 = [t for t in pq1.terms if t.is_bigram]
    assert len(bg0) == len(bg1) == 1
    assert bg0[0].term_id == bg1[0].term_id      # same termid — same index
    assert bg0[0].weight == 0.5
    assert bg1[0].weight == pytest.approx(0.5 * WIKI_BIGRAM_BOOST)
    # non-dictionary pair stays at bigram_weight
    pq2 = parse_query("machine tractor", wiki_bigrams=DEFAULT_WIKI_BIGRAMS)
    bg2 = [t for t in pq2.terms if t.is_bigram]
    assert bg2[0].weight == 0.5


def test_wiki_boost_lifts_only_dictionary_pair_doc():
    """Two docs, same unigram profile; one has the dictionary phrase
    adjacent, the other scattered.  The wiki boost multiplies only the
    bigram contribution of the adjacent doc."""
    adj = "machine learning w1 w2 w3"
    far = "machine v1 v2 v3 learning"
    o = OracleIndex(_mk([("adj", 0, "user", adj), ("far", 0, "user", far)]))
    d0, s0 = o.search("machine learning", 2)
    d1, s1 = o.search("machine learning", 2,
                      wiki_bigrams=DEFAULT_WIKI_BIGRAMS)
    assert list(d0) == list(d1)                  # adjacent already first
    a = doc_id_for_conv("adj")
    i = list(d0).index(a)
    j = 1 - i
    assert s1[i] > s0[i]                         # bigram part got 1.96×
    assert s1[j] == s0[j]                        # scattered doc unchanged


def test_engine_oracle_rank_identity_with_wiki(ray_session, tmp_path):
    from open_source_search_engine_ray.index.build import build_index
    from open_source_search_engine_ray.query.engine import IndexSearcher
    from open_source_search_engine_ray.sources.transcripts import (
        transcripts_dataset, transcripts_table)
    import ray.data  # noqa: F401

    idx = str(tmp_path / "idx_wiki")
    shutil.rmtree(idx, ignore_errors=True)
    build_index(lambda: transcripts_dataset(120), idx,
                input_token="synthetic:n=120")
    se = IndexSearcher(idx)
    o = OracleIndex(transcripts_table(120))
    for q in ("machine learning", "new york error", "the source code",
              '"open source" license'):
        d1, s1 = se.search(q, 10, wiki_bigrams="default")
        d2, s2 = o.search(q, 10, wiki_bigrams="default")
        assert list(d1) == list(d2), q
        assert list(s1) == list(s2), q


def test_load_wiki_bigrams(tmp_path):
    p = tmp_path / "titles.txt"
    p.write_text("Machine Learning\nNew   York\nsingle\nthree word title\n")
    s = load_wiki_bigrams(str(p))
    assert s == frozenset({"machine learning", "new york"})
