"""Snippet/highlight assembly (Msg20/Summary/Highlight analogue)."""

import shutil

import pytest

from open_source_search_engine_ray.index.build import build_index
from open_source_search_engine_ray.query.snippets import search_with_snippets
from open_source_search_engine_ray.sources.transcripts import (
    transcripts_dataset)

IDX = "/tmp/osse_snip_idx"


@pytest.fixture(scope="module")
def snip_index(ray_session):
    shutil.rmtree(IDX, ignore_errors=True)
    build_index(lambda: transcripts_dataset(200), IDX,
                input_token="snip:n=200")
    return IDX


def test_snippets_highlight_query_terms(snip_index):
    res = search_with_snippets(snip_index, "w0002", k=5).to_pylist()
    assert len(res) == 5
    for r in res:
        assert r["conv_id"].startswith("conv-")
        assert "<b>w0002</b>" in r["snippet"]
        assert r["snippet_role"] in ("user", "assistant", "tool", "system")


def test_snippets_marker_term_role(snip_index):
    res = search_with_snippets(snip_index, "roleonlyterm_assistant",
                               k=3).to_pylist()
    assert len(res) >= 1
    for r in res:
        # the marker is only planted in assistant turns; underscore is
        # punctuation (Words.cpp semantics) so it tokenizes as two terms
        assert r["snippet_role"] == "assistant"
        assert "<b>roleonlyterm</b>" in r["snippet"]


def test_snippets_empty_query(snip_index):
    assert search_with_snippets(snip_index, "zzqqxoov", k=5).num_rows == 0


DUP_IDX = "/tmp/osse_dedup_idx"


@pytest.fixture(scope="module")
def dup_index(ray_session):
    """Corpus with planted near-identical conversations: 5 exact dupes of
    one answer, 3 half-similar variants, 2 distinct docs."""
    import pyarrow as pa
    import ray.data

    rows = []
    for i in range(5):   # exact dupes (summary similarity 100%)
        rows.append((f"dup-{i}", "the widget answer is exactly this text"))
    for i in range(3):   # same first half, distinct second half (~60%)
        rows.append((f"half-{i}", "widget setup guide part "
                     f"alpha{i} beta{i} gamma{i} delta{i}"))
    rows.append(("solo-1", "widget pricing for enterprise customers"))
    rows.append(("solo-2", "unrelated filler about kumquats widget"))
    tbl = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([0] * len(rows), pa.int32()),
        "role": pa.array(["assistant"] * len(rows)),
        "text": pa.array([r[1] for r in rows]),
        "tool": pa.array([None] * len(rows), pa.string()),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
    })
    shutil.rmtree(DUP_IDX, ignore_errors=True)
    build_index(lambda: ray.data.from_arrow(tbl), DUP_IDX,
                input_token="dup:planted")
    return DUP_IDX


def test_result_page_dedup_and_cluster_cap(dup_index):
    """Msg40 percentSimilarSummary dedup + Msg3a ≤m-per-cluster cap: the 5
    planted exact dupes collapse to ONE result, the 3 half-similar docs
    cap at 2 (same cluster), distinct docs survive."""
    raw = search_with_snippets(dup_index, "widget", k=10).to_pylist()
    assert len(raw) == 10   # without dedup every dupe occupies a slot
    res = search_with_snippets(dup_index, "widget", k=10,
                               dedup=True).to_pylist()
    convs = [r["conv_id"] for r in res]
    assert sum(c.startswith("dup-") for c in convs) == 1
    assert sum(c.startswith("half-") for c in convs) == 2
    assert "solo-1" in convs and "solo-2" in convs
    assert [r["rank"] for r in res] == list(range(1, len(res) + 1))


def test_export_snippets_distributed_matches_driver(snip_index):
    """The distributed batch snippet export (hash join + grouped snippet
    assembly in workers) produces exactly the driver-side result pages."""
    from open_source_search_engine_ray.query.snippets import export_snippets

    queries = [("qa", "w0002", 5), ("qb", "roleonlyterm_assistant", 3)]
    dist = export_snippets(snip_index, queries).to_pandas()
    for qid, q, k in queries:
        want = search_with_snippets(snip_index, q, k).to_pandas()
        got = (dist[dist.query_id == qid]
               .sort_values("rank").reset_index(drop=True))
        assert got["doc_id"].astype(int).tolist() == \
            want["doc_id"].astype(int).tolist(), qid
        assert got["snippet"].tolist() == want["snippet"].tolist(), qid
        assert got["snippet_role"].tolist() == \
            want["snippet_role"].tolist(), qid


def test_related_terms_gigabits(snip_index, ray_session, tmp_path):
    """Gigabits analogue (faq.html:333): related terms of a result page.
    Deterministic, query terms + stopwords excluded, and a PLANTED
    co-occurring topic must surface first on its query."""
    import pyarrow as pa
    import ray.data

    from open_source_search_engine_ray.index.build import build_index
    from open_source_search_engine_ray.query.engine import IndexSearcher
    from open_source_search_engine_ray.sources.transcripts import (
        TRANSCRIPTS_SCHEMA, transcripts_dataset)

    se = IndexSearcher(snip_index)
    rel = se.related_terms("w0002", k_terms=8)
    assert rel == se.related_terms("w0002", k_terms=8)   # deterministic
    terms = [t for t, _ in rel]
    assert "w0002" not in terms and "the" not in terms
    assert all(n >= 1 for _, n in rel)
    assert rel == sorted(rel, key=lambda p: (-p[1], p[0]))

    # planted topic: every doc matching 'zephyrq' also contains
    # 'quartzite' -> it must be the top related term
    idx = str(tmp_path / "rel_idx")
    rows = {"conv_id": [], "turn_idx": [], "role": [], "text": [],
            "tool": [], "ts": []}
    for i in range(12):
        rows["conv_id"].append(f"conv-rel-{i}")
        rows["turn_idx"].append(0)
        rows["role"].append("user")
        rows["text"].append(f"zephyrq quartzite filler{i} only{i}")
        rows["tool"].append(None)
        rows["ts"].append(0)
    tbl = pa.table({
        "conv_id": rows["conv_id"],
        "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
        "role": rows["role"], "text": rows["text"],
        "tool": pa.array(rows["tool"], pa.string()),
        "ts": pa.array(rows["ts"], pa.timestamp("us")),
    }).cast(TRANSCRIPTS_SCHEMA)
    base = transcripts_dataset(30).materialize()
    build_index(lambda: base.union(ray.data.from_arrow(tbl)), idx,
                input_token="rel:planted")
    se2 = IndexSearcher(idx)
    rel2 = se2.related_terms("zephyrq", k_terms=5)
    assert rel2[0] == ("quartzite", 12), rel2
