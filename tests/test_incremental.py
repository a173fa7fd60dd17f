"""Incremental maintenance invariants: a multi-generation index with
appends, tombstone deletes, revivals and compaction scores exactly like a
fresh build / oracle over the live corpus."""

import shutil

import numpy as np
import pyarrow as pa
import pytest

from open_source_search_engine_ray.functions.ghash import doc_ids_for_convs
from open_source_search_engine_ray.index.build import build_index
from open_source_search_engine_ray.index.merge import (
    add_documents, compact, delete_convs, read_generations)
from open_source_search_engine_ray.query.engine import IndexSearcher
from open_source_search_engine_ray.query.oracle import OracleIndex
from open_source_search_engine_ray.sources.queryset import query_set
from open_source_search_engine_ray.sources.transcripts import (
    generate_conv_rows, transcripts_dataset, transcripts_dataset_range)

IDX = "/tmp/osse_incr_idx"
BASE = 200
EXTRA = 100
DELETED = [f"conv-{i:08d}" for i in list(range(10, 30)) + [205, 211]]
REVIVED = ["conv-00000015"]


def _live_table() -> pa.Table:
    dead = set(DELETED) - set(REVIVED)
    idx = [i for i in range(BASE + EXTRA)
           if f"conv-{i:08d}" not in dead]
    return generate_conv_rows(np.asarray(idx))


@pytest.fixture(scope="module")
def incr_index(ray_session):
    shutil.rmtree(IDX, ignore_errors=True)
    build_index(lambda: transcripts_dataset(BASE), IDX,
                input_token=f"incr:base:{BASE}")
    # generation 1: append new conversations
    add_documents(IDX, lambda: transcripts_dataset_range(BASE, BASE + EXTRA),
                  input_token=f"incr:add:{BASE}-{BASE + EXTRA}")
    # tombstone deletes across both generations
    delete_convs(IDX, DELETED)
    # revival: re-add one deleted conversation in a new generation
    revived_idx = [int(c.split("-")[1]) for c in REVIVED]
    add_documents(
        IDX,
        lambda: transcripts_dataset_range(revived_idx[0], revived_idx[0] + 1),
        input_token="incr:revive")
    return IDX


@pytest.fixture(scope="module")
def live_oracle():
    return OracleIndex(_live_table())


def test_generations_recorded(incr_index):
    gens = read_generations(incr_index)
    assert [g["gen"] for g in gens["generations"]] == [0, 1, 2]
    assert gens["live_stats"]["n_docs"] == BASE + EXTRA - len(DELETED) + 1


def test_incremental_rank_identity(incr_index, live_oracle):
    se = IndexSearcher(incr_index)
    assert se.n_docs == live_oracle.n_docs
    assert se.avgdl == live_oracle.avgdl
    for qid, q, k in query_set():
        d1, s1 = se.search(q, k)
        d2, s2 = live_oracle.search(q, k)
        assert list(d1) == list(d2), (qid, q)
        assert list(s1) == list(s2), (qid, q)


def test_deleted_docs_absent(incr_index):
    se = IndexSearcher(incr_index)
    dead_ids = set(
        int(d) for d in doc_ids_for_convs(
            [c for c in DELETED if c not in REVIVED]))
    d, _ = se.search("the", 200)
    assert not (set(int(x) for x in d) & dead_ids)


def test_compaction_preserves_results(incr_index, live_oracle, ray_session):
    idx2 = IDX + "_compact"
    shutil.rmtree(idx2, ignore_errors=True)
    shutil.copytree(IDX, idx2)
    compact(idx2)
    gens = read_generations(idx2)
    assert [g["gen"] for g in gens["generations"]] == [0]
    se = IndexSearcher(idx2)
    for qid, q, k in query_set():
        d1, s1 = se.search(q, k)
        d2, s2 = live_oracle.search(q, k)
        assert list(d1) == list(d2), (qid, q)
        assert list(s1) == list(s2), (qid, q)
    shutil.rmtree(idx2, ignore_errors=True)


def test_segment_merge_compaction(incr_index, live_oracle, ray_session):
    """Segment-level compaction (posdbMerge analogue): same results as the
    live-corpus oracle, single generation, no re-tokenization."""
    from open_source_search_engine_ray.index.merge import compact_merge

    idx5 = IDX + "_segmerge"
    shutil.rmtree(idx5, ignore_errors=True)
    shutil.copytree(IDX, idx5)
    meta = compact_merge(idx5)
    assert meta["compacted_from"] == [0, 1, 2]
    gens = read_generations(idx5)
    assert [g["gen"] for g in gens["generations"]] == [0]
    se = IndexSearcher(idx5)
    assert se.n_docs == live_oracle.n_docs
    assert se.avgdl == live_oracle.avgdl
    for qid, q, k in query_set():
        d1, s1 = se.search(q, k)
        d2, s2 = live_oracle.search(q, k)
        assert list(d1) == list(d2), (qid, q)
        assert list(s1) == list(s2), (qid, q)
    shutil.rmtree(idx5, ignore_errors=True)


def test_update_documents(ray_session):
    """update = tombstone + readd: the updated corpus scores like a fresh
    build over it (respider/annihilation analogue)."""
    from open_source_search_engine_ray.index.build import build_index
    from open_source_search_engine_ray.index.merge import update_documents

    idx6 = IDX + "_upd"
    shutil.rmtree(idx6, ignore_errors=True)
    build_index(lambda: transcripts_dataset(100), idx6,
                input_token="upd:base")
    # "re-crawl" convs 10..19 (same deterministic content → revival path)
    update_documents(
        idx6, lambda: transcripts_dataset_range(10, 20),
        input_token="upd:delta")
    oracle = OracleIndex(generate_conv_rows(np.arange(100)))
    se = IndexSearcher(idx6)
    assert se.n_docs == oracle.n_docs and se.avgdl == oracle.avgdl
    for qid, q, k in query_set():
        d1, s1 = se.search(q, k)
        d2, s2 = oracle.search(q, k)
        assert list(d1) == list(d2) and list(s1) == list(s2), qid
    shutil.rmtree(idx6, ignore_errors=True)


def test_mismatched_partitioning_rejected(incr_index):
    """add_documents must refuse a generation whose partition layout
    differs from the base index (compact_merge merges same-numbered
    shards; ADVICE r1 regression)."""
    from open_source_search_engine_ray.config import IndexConfig

    with pytest.raises(ValueError, match="partitioning must match"):
        add_documents(
            incr_index, lambda: transcripts_dataset_range(900, 905),
            input_token="incr:badcfg",
            config=IndexConfig(num_partitions=7))


def test_export_snippets_multi_generation(incr_index):
    """Distributed snippet export applies newest-generation-wins over the
    multi-generation doc store (same pages as the driver-side path, which
    resolves generations via _docstore_rows)."""
    from open_source_search_engine_ray.query.snippets import (
        export_snippets, search_with_snippets)

    dist = (export_snippets(incr_index, [("q1", "w0042", 5)])
            .to_pandas().sort_values("rank").reset_index(drop=True))
    want = search_with_snippets(incr_index, "w0042", 5).to_pandas()
    assert dist["doc_id"].astype(int).tolist() == \
        want["doc_id"].astype(int).tolist()
    assert dist["snippet"].tolist() == want["snippet"].tolist()


def test_salt_all_incremental_lifecycle(ray_session):
    """Doc-partitioned mode (salt_all_terms) through the full lifecycle:
    append generation, tombstone, revive — rank-identical to the oracle
    over the live corpus (multi-gen salted merge + per-gen filtering)."""
    from open_source_search_engine_ray.config import IndexConfig

    idx = IDX + "_sainc"
    shutil.rmtree(idx, ignore_errors=True)
    cfg = IndexConfig(salt_all_terms=True, num_salts=4)
    build_index(lambda: transcripts_dataset(150), idx, cfg,
                input_token="sainc:base")
    add_documents(idx, lambda: transcripts_dataset_range(150, 200),
                  input_token="sainc:add")
    dead = [f"conv-{i:08d}" for i in range(5, 15)]
    delete_convs(idx, dead)
    add_documents(idx, lambda: transcripts_dataset_range(7, 8),
                  input_token="sainc:revive")   # revive conv 7
    live_idx = [i for i in range(200) if not (5 <= i < 15) or i == 7]
    oracle = OracleIndex(generate_conv_rows(np.asarray(live_idx)),
                         config=cfg)
    se = IndexSearcher(idx)
    assert se.n_docs == oracle.n_docs and se.avgdl == oracle.avgdl
    for qid, q, k in query_set():
        d1, s1 = se.search(q, k)
        d2, s2 = oracle.search(q, k)
        assert list(d1) == list(d2) and list(s1) == list(s2), qid
    shutil.rmtree(idx, ignore_errors=True)


def test_delete_by_query_then_revive(ray_session):
    """PageReindex analogue: delete every doc matching a query, then
    revive one by re-adding its conversation — scores must equal a fresh
    build over the corresponding live corpus at each step."""
    from open_source_search_engine_ray.functions.ghash import (
        doc_id_for_conv)
    from open_source_search_engine_ray.index.build import build_index
    from open_source_search_engine_ray.index.merge import delete_by_query

    idx7 = IDX + "_dbq"
    shutil.rmtree(idx7, ignore_errors=True)
    build_index(lambda: transcripts_dataset(80), idx7,
                input_token="dbq:base")
    se0 = IndexSearcher(idx7)
    victims, _ = se0.search("w0042", se0.n_docs)
    victim_set = {int(v) for v in victims}
    assert len(victims) >= 2
    assert delete_by_query(idx7, "w0042") == len(victims)

    se1 = IndexSearcher(idx7)
    d, _ = se1.search("w0042", 10)
    assert len(d) == 0                       # all matches tombstoned
    # every query behaves like a fresh build over the survivors
    live_idx = [i for i in range(80)
                if doc_id_for_conv(f"conv-{i:08d}") not in victim_set]
    oracle = OracleIndex(generate_conv_rows(np.array(live_idx)))
    assert se1.n_docs == oracle.n_docs
    for qid, q, k in query_set():
        d1, s1 = se1.search(q, k)
        d2, s2 = oracle.search(q, k)
        assert list(d1) == list(d2) and list(s1) == list(s2), (qid, q)

    # revive ONE victim by re-adding its conversation
    ri = next(i for i in range(80)
              if doc_id_for_conv(f"conv-{i:08d}") in victim_set)
    add_documents(idx7, lambda: transcripts_dataset_range(ri, ri + 1),
                  input_token="dbq:revive")
    se2 = IndexSearcher(idx7)
    d, _ = se2.search("w0042", 10)
    assert doc_id_for_conv(f"conv-{ri:08d}") in {int(x) for x in d}
    oracle2 = OracleIndex(generate_conv_rows(
        np.array(sorted(live_idx + [ri]))))
    for qid, q, k in query_set():
        d1, s1 = se2.search(q, k)
        d2, s2 = oracle2.search(q, k)
        assert list(d1) == list(d2) and list(s1) == list(s2), (qid, q)
    shutil.rmtree(idx7, ignore_errors=True)
