"""Result assembly: titles, snippets and term highlighting for top-k hits.

The reference fetches each result's stored document and generates a
summary around query-term matches (``Msg40::launchMsg20s``
``Msg40.cpp:507-534`` → ``Msg20`` → ``Summary::setSummary``
``Summary.cpp:181``, ``Highlight.cpp``, match windows ``Matches.cpp:248``).
Here: the top-k docIds are a broadcast-small side joined against the
doc-store Parquet (point lookups by doc_id), the best-matching turn is the
summary window, and matched tokens get ``<b>`` markers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..functions.ghash import TERMID_MASK, hash_tokens_lower
from ..functions.tokenizer import tokenize
from .engine import IndexSearcher
from .parse import parse_query


def _docstore_rows(index_dir: str, doc_ids: list[int]) -> pa.Table:
    from ..index.merge import gen_dir, read_generations

    gens = read_generations(index_dir)
    import os

    tables = []
    want = pa.array(np.asarray(doc_ids, dtype=np.uint64))
    for g in gens["generations"]:
        store = os.path.join(gen_dir(index_dir, g["gen"]), "docstore")
        ds = pads.dataset(store, format="parquet")
        t = ds.to_table(filter=pads.field("doc_id").isin(want))
        if t.num_rows:
            tables.append(t.append_column(
                "gen", pa.array([g["gen"]] * t.num_rows, pa.int32())))
    if not tables:
        return None
    t = pa.concat_tables(tables).to_pandas()
    # newest generation wins per doc (update semantics)
    newest = t.groupby("doc_id")["gen"].transform("max")
    t = t[t["gen"] == newest].drop(columns=["gen"])
    return pa.Table.from_pandas(t, preserve_index=False)


def _best_turn_snippet(turns: list[tuple[int, str, str]],
                       query_terms: set[int],
                       max_len: int = 240) -> tuple[str, str, int]:
    """Pick the turn with the most query-term matches (Summary window
    analogue) and highlight matches.  → (snippet, role, turn_idx)."""
    best = (-1, 0, "", "")  # (n_matches, -turn_idx, text, role)
    for turn_idx, role, text in turns:
        toks, _, _ = tokenize(text or "")
        if not toks:
            continue
        wids = hash_tokens_lower(toks) & TERMID_MASK
        n = int(np.isin(wids, np.asarray(list(query_terms),
                                         dtype=np.uint64)).sum())
        if n > best[0]:
            best = (n, turn_idx, text, role)
    n, turn_idx, text, role = best
    if not text:
        return "", "", -1
    # highlight: wrap matched alnum tokens (Highlight.cpp analogue)
    toks, _, _ = tokenize(text)
    wids = hash_tokens_lower(toks) & TERMID_MASK if toks else []
    matched = {t for t, w in zip(toks, wids) if int(w) in query_terms}
    out = text
    import re

    for m in sorted(matched, key=len, reverse=True):
        out = re.sub(
            rf"(?<![a-zA-Z0-9<]){re.escape(m)}(?![a-zA-Z0-9>])",
            f"<b>{m}</b>", out)
    if len(out) > max_len:
        # center the window on the first highlight
        pos = out.find("<b>")
        start = max(0, pos - max_len // 3)
        out = ("…" if start else "") + out[start:start + max_len] + "…"
    return out, role, turn_idx


def _summary_tokens(snippet: str) -> set:
    text = snippet.replace("<b>", "").replace("</b>", "")
    toks, _, _ = tokenize(text)
    return {t.lower() for t in toks}


def _percent_similar(a: set, b: set) -> float:
    if not a or not b:
        return 0.0
    return 200.0 * len(a & b) / (len(a) + len(b))


def dedup_result_page(tbl: pa.Table, k: int, max_per_cluster: int = 2,
                      similar_pct: float = 80.0,
                      cluster_pct: float = 50.0) -> pa.Table:
    """Result-page dedup + clustering caps (``Msg40.cpp:1322``
    ``percentSimilarSummary`` + the ≤2-per-site merge cap
    ``Msg3a.cpp:803-840``, with the near-dup CLUSTER playing the role of
    the site):

    - a result whose summary is ≥ ``similar_pct`` token-similar to a
      higher-ranked kept result is dropped (duplicate);
    - kept results ≥ ``cluster_pct`` similar join that result's cluster;
      each cluster keeps at most ``max_per_cluster`` results;
    - survivors are re-ranked 1..n and truncated to ``k``.
    """
    df = tbl.to_pandas()
    sets = [_summary_tokens(s) for s in df["snippet"]]
    kept: list[int] = []
    cluster_of: dict[int, int] = {}
    csize: dict[int, int] = {}
    for i in range(len(df)):
        dup = False
        cluster = None
        for j in kept:
            pct = _percent_similar(sets[i], sets[j])
            if pct >= similar_pct:
                dup = True
                break
            if pct >= cluster_pct and cluster is None:
                cluster = cluster_of[j]
        if dup:
            continue
        if cluster is None:
            cluster = i
        if csize.get(cluster, 0) >= max_per_cluster:
            continue
        cluster_of[i] = cluster
        csize[cluster] = csize.get(cluster, 0) + 1
        kept.append(i)
        if len(kept) >= k:
            break
    out = df.iloc[kept].reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
    return pa.Table.from_pandas(out, preserve_index=False).cast(tbl.schema)


def search_with_snippets(index_dir: str, query: str, k: int = 10,
                         searcher: IndexSearcher | None = None,
                         dedup: bool = False, max_per_cluster: int = 2,
                         similar_pct: float = 80.0,
                         oversample: int = 4) -> pa.Table:
    """→ (rank, doc_id, conv_id, score, snippet, snippet_role,
    snippet_turn_idx): the full result page (Msg40 → PageResults
    analogue).  ``dedup=True`` collapses near-identical summaries and caps
    results per similarity cluster (see :func:`dedup_result_page`),
    over-fetching ``oversample×k`` candidates so the page refills."""
    se = searcher or IndexSearcher(index_dir)
    docs, scores = se.search(query, k * oversample if dedup else k)
    pq_ = parse_query(query, se.config.bigram_weight)
    qterms = {t.term_id for t in pq_.terms if not t.negative}
    empty = pa.table({
        "rank": pa.array([], pa.int32()),
        "doc_id": pa.array([], pa.uint64()),
        "conv_id": pa.array([], pa.string()),
        "score": pa.array([], pa.float64()),
        "snippet": pa.array([], pa.string()),
        "snippet_role": pa.array([], pa.string()),
        "snippet_turn_idx": pa.array([], pa.int32()),
    })
    if len(docs) == 0:
        return empty
    store = _docstore_rows(index_dir, [int(d) for d in docs])
    if store is None:
        return empty
    sdf = store.to_pandas()
    out = {k2: [] for k2 in ("rank", "doc_id", "conv_id", "score",
                             "snippet", "snippet_role", "snippet_turn_idx")}
    for rank, (d, s) in enumerate(zip(docs, scores), start=1):
        rows = sdf[sdf["doc_id"] == int(d)].sort_values("turn_idx")
        if len(rows) == 0:
            continue
        turns = list(zip(rows["turn_idx"], rows["role"], rows["text"]))
        snippet, role, tix = _best_turn_snippet(turns, qterms)
        out["rank"].append(rank)
        out["doc_id"].append(int(d))
        out["conv_id"].append(rows["conv_id"].iloc[0])
        out["score"].append(float(s))
        out["snippet"].append(snippet)
        out["snippet_role"].append(role)
        out["snippet_turn_idx"].append(tix)
    res = pa.table({
        "rank": pa.array(out["rank"], pa.int32()),
        "doc_id": pa.array(out["doc_id"], pa.uint64()),
        "conv_id": pa.array(out["conv_id"], pa.string()),
        "score": pa.array(out["score"], pa.float64()),
        "snippet": pa.array(out["snippet"], pa.string()),
        "snippet_role": pa.array(out["snippet_role"], pa.string()),
        "snippet_turn_idx": pa.array(out["snippet_turn_idx"], pa.int32()),
    })
    if dedup:
        res = dedup_result_page(res, k, max_per_cluster, similar_pct)
    return res
