"""Round-4 regression tests: NULL-text curation parity, empty-corpus
resumable writer, empty-events quantiles, curated-set cache reuse."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _pd(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def test_curate_corpus_null_vs_empty_text(ray_session, tmp_path):
    """A corpus holding BOTH a NULL-text and an empty-text doc must dedup
    identically in the engine and the oracle: the engine coalesces None
    to '' (md5('') group) and the SQL now COALESCEs too, so the two docs
    share one md5 group and only the min doc_id survives."""
    import duckdb

    from open_source_search_engine_ray.pipelines import curation

    # ids 0,2,4,5,7,10,12 all pass the en sampling gate (knuth < 0.5)
    texts = {
        0: None,                                       # NULL text
        2: "",                                         # empty text
        4: "zephyr quixotic bramble ostensible juniper marigold",
        5: "verbatim duplicated paragraph alpha bravo charlie delta",
        7: "verbatim duplicated paragraph alpha bravo charlie delta",
        10: "completely distinct content about orbital mechanics today",
        12: "final standalone document covering rhubarb cultivation",
    }
    ids = sorted(texts)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": pa.array(["en"] * len(ids)),
        "text": pa.array([texts[i] for i in ids], pa.string()),
    })
    sf = str(tmp_path)
    pq.write_table(tbl, f"{sf}/documents.parquet")

    got = (_pd(curation.curate_corpus(sf))
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(curation.curate_corpus_sql()).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    kept = set(got["doc_id"])
    assert 0 in kept and 2 not in kept     # NULL + '' collapse to one keeper
    assert 5 in kept and 7 not in kept     # verbatim pair deduped


def test_curate_and_write_empty_corpus(ray_session, tmp_path):
    """A corpus curating down to ZERO rows (here: zero input docs, where
    Ray drops the dataset schema entirely) must still commit every shard
    as a zero-row parquet with the declared schema — no KeyError."""
    from open_source_search_engine_ray.pipelines import curation

    sf = str(tmp_path / "corpus")
    os.makedirs(sf)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "lang": pa.array([], pa.string()),
                      "text": pa.array([], pa.string())})
    pq.write_table(empty, f"{sf}/documents.parquet")

    out = str(tmp_path / "curated")
    r = curation.curate_and_write(sf, out)
    assert len(r["written"]) == curation.N_OUT_PARTS
    for p in range(curation.N_OUT_PARTS):
        t = pq.read_table(os.path.join(out, f"part={p}", "data.parquet"))
        assert t.num_rows == 0
        assert t.schema.names == ["doc_id", "lang", "n_tokens"]


def test_events_value_quantiles_empty(ray_session, tmp_path):
    """Zero-row events table: the quantile pipeline returns an empty
    (quantile, value) frame instead of IndexError-ing on the empty
    histogram — matching the oracle's empty JOIN result."""
    from open_source_search_engine_ray.pipelines import relational

    sf = str(tmp_path)
    empty = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
    })
    pq.write_table(empty, f"{sf}/events.parquet")
    out = _pd(relational.events_value_quantiles(sf))
    assert list(out.columns) == ["quantile", "value"]
    assert len(out) == 0


def test_curated_cache_reuse(ray_session):
    """curation_report must reuse the materialized curated set instead of
    re-running the Jaccard join: same object back from the cache."""
    from open_source_search_engine_ray.pipelines import curation

    a = curation.curate_corpus(SF)
    b = curation.curate_corpus(SF)
    assert a is b
    rep = _pd(curation.curation_report(SF))
    assert {"lang", "n_docs", "sum_tokens"} <= set(rep.columns)


def test_small_build_fast_path_rank_identical(ray_session, tmp_path):
    """The single-task small-generation build must be rank-identical to
    the distributed build AND the oracle (same artifacts contract)."""
    from open_source_search_engine_ray.index.build import build_index
    from open_source_search_engine_ray.query.engine import IndexSearcher
    from open_source_search_engine_ray.query.oracle import OracleIndex
    from open_source_search_engine_ray.sources.queryset import query_set
    from open_source_search_engine_ray.sources.transcripts import (
        transcripts_dataset, transcripts_table)

    fast = str(tmp_path / "fast")
    build_index(lambda: transcripts_dataset(150), fast,
                input_token="synthetic:n=150",
                small_input_max_rows=100_000)
    se = IndexSearcher(fast)
    orc = OracleIndex(transcripts_table(150))
    for qid, q, k in query_set():
        d1, s1 = se.search(q, k)
        d2, s2 = orc.search(q, k)
        assert list(d1) == list(d2) and list(s1) == list(s2), (qid, q)


def test_dl_broadcast_ceiling_raises(ray_session, tmp_path):
    """Above dl_broadcast_max_docs the default build mode must FAIL
    LOUDLY pointing at salt_all_terms, not ship the broadcast."""
    from open_source_search_engine_ray.config import IndexConfig
    from open_source_search_engine_ray.index.build import build_index
    from open_source_search_engine_ray.sources.transcripts import (
        transcripts_dataset)

    with pytest.raises(ValueError, match="salt_all_terms"):
        build_index(lambda: transcripts_dataset(50),
                    str(tmp_path / "idx"),
                    IndexConfig(dl_broadcast_max_docs=10),
                    input_token="synthetic:n=50")


def test_label_propagation_paths_identical(ray_session, tmp_path,
                                           monkeypatch):
    """Driver fast path vs distributed label propagation must produce
    the same components (same doc_id -> cluster_id mapping)."""
    from open_source_search_engine_ray.pipelines import dedup

    texts = {
        0: "verbatim duplicated paragraph alpha bravo charlie delta",
        1: "verbatim duplicated paragraph alpha bravo charlie delta",
        2: "verbatim duplicated paragraph alpha bravo charlie echo",
        3: "completely unrelated rhubarb cultivation notes herein",
        4: "second pair of twins sharing every single shingle here",
        5: "second pair of twins sharing every single shingle here",
    }
    tbl = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "lang": pa.array(["en"] * len(texts)),
        "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
    })
    sf = str(tmp_path)
    pq.write_table(tbl, f"{sf}/documents.parquet")

    fast = (dedup.dedup_clusters(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    monkeypatch.setattr(dedup, "LP_DRIVER_MAX_EDGES", 0)
    dist = (dedup.dedup_clusters(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, dist)
    assert set(fast["cluster_id"]) >= {0, 4}     # two planted components


def test_repeated_ngram_spans_planted(ray_session, tmp_path):
    """Exact repeated-span detection (Lee et al. exact-substring signal):
    engine == DuckDB oracle on a corpus with one long shared span."""
    import duckdb

    from open_source_search_engine_ray.pipelines import dedup

    boiler = " ".join(f"shared{i:02d}" for i in range(15))
    texts = [f"{boiler} unique tail alpha",
             f"prefix here {boiler} suffix",
             "no repeats in this document at all whatsoever truly none",
             None]
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "lang": pa.array(["en"] * 4),
        "text": pa.array(texts, pa.string()),
    }), f"{sf}/documents.parquet")

    got = dedup.repeated_ngram_spans(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(dedup.repeated_ngram_spans_sql()).df()
    cols = sorted(want.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the 15-token boiler yields 6 shared 10-grams in each of docs 0,1
    assert len(got) == 12


def test_add_documents_empty_generation(ray_session, tmp_path):
    """A zero-row incremental feed commits an empty generation instead of
    crashing, and queries are unchanged."""
    from open_source_search_engine_ray.index.build import build_index
    from open_source_search_engine_ray.index.merge import add_documents
    from open_source_search_engine_ray.query.engine import IndexSearcher
    from open_source_search_engine_ray.sources.transcripts import (
        transcripts_dataset, transcripts_dataset_range)

    idx = str(tmp_path / "idx")
    build_index(lambda: transcripts_dataset(100), idx,
                input_token="synthetic:n=100")
    before = IndexSearcher(idx).search("w0042", 5)

    add_documents(idx, lambda: transcripts_dataset_range(100, 100),
                  input_token="empty-gen")
    after = IndexSearcher(idx).search("w0042", 5)
    assert list(before[0]) == list(after[0])
    assert list(before[1]) == list(after[1])


def test_small_build_salt_all_rank_identical_and_empty_gen(ray_session,
                                                           tmp_path):
    """The small-generation fast path must also serve salt_all_terms
    layouts (full P*S shard fan, dl attached in-memory) rank-identically,
    and an EMPTY generation into a salt_all index must commit."""
    from open_source_search_engine_ray.config import IndexConfig
    from open_source_search_engine_ray.index.build import build_index
    from open_source_search_engine_ray.index.merge import add_documents
    from open_source_search_engine_ray.query.engine import IndexSearcher
    from open_source_search_engine_ray.query.oracle import OracleIndex
    from open_source_search_engine_ray.sources.queryset import query_set
    from open_source_search_engine_ray.sources.transcripts import (
        transcripts_dataset, transcripts_dataset_range, transcripts_table)

    idx = str(tmp_path / "sa")
    build_index(lambda: transcripts_dataset(120), idx,
                IndexConfig(salt_all_terms=True),
                input_token="synthetic:n=120",
                small_input_max_rows=100_000)
    se = IndexSearcher(idx)
    orc = OracleIndex(transcripts_table(120))
    for qid, q, k in query_set()[:8]:
        d1, s1 = se.search(q, k)
        d2, s2 = orc.search(q, k)
        assert list(d1) == list(d2) and list(s1) == list(s2), (qid, q)

    before = se.search("w0042", 5)
    add_documents(idx, lambda: transcripts_dataset_range(120, 120),
                  input_token="empty-gen-saltall")
    after = IndexSearcher(idx).search("w0042", 5)
    assert list(before[0]) == list(after[0])
    assert list(before[1]) == list(after[1])


def test_langid_zh_with_katakana_trace_stays_zh():
    """A Chinese document quoting a short katakana name must NOT flip to
    Japanese; kanji-heavy Japanese (real kana share) must stay ja."""
    from open_source_search_engine_ray.functions.langid import classify

    zh_with_brand = ("实验结果发表在期刊上并且表明该方法对于大型输入效果良好"
                     "研究人员使用了トヨタ公司的数据进行了验证分析"
                     "总体而言这一方法在实际应用中表现出色值得推广")
    assert classify(zh_with_brand)[0] == "zh"
    formal_ja = ("経済産業省は本日、半導体産業支援策を発表した。"
                 "政府関係者によると予算規模は過去最大となる。")
    assert classify(formal_ja)[0] == "ja"


def test_remove_repeated_spans_planted(ray_session, tmp_path):
    """Span-removal transform: non-first occurrences of a repeated
    10-gram are cut; first occurrence, clean docs and NULL docs match
    the DuckDB oracle exactly."""
    import duckdb

    from open_source_search_engine_ray.pipelines import dedup

    boiler = " ".join(f"shared{i:02d}" for i in range(15))
    texts = [f"{boiler} unique tail alpha",
             f"prefix here {boiler} suffix",
             "clean document",
             None,
             f"third copy {boiler} also here"]
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "lang": pa.array(["en"] * 5),
        "text": pa.array(texts, pa.string()),
    }), f"{sf}/documents.parquet")

    got = dedup.remove_repeated_spans(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(dedup.remove_repeated_spans_sql()).df()
    cols = sorted(want.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    by_id = dict(zip(got["doc_id"], got["text_dedup"]))
    assert by_id[0].startswith("shared00")       # first occurrence kept
    assert "shared00" not in by_id[1]            # later occurrence cut
    assert by_id[1].startswith("prefix here")    # surroundings survive
    assert by_id[2] == "clean document"
    assert by_id[3] == ""
