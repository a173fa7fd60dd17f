"""Query engine over a built index.

``IndexSearcher`` is the single-process search path (segment readers +
decoded-list cache, loaded once — the page-cache / ``Msg5`` analogue).  It
is used three ways:

- driver-side single-query latency (bench p50);
- inside a Ray actor pool for batch query evaluation
  (``queries_ds.map_batches(QueryEvalStage, concurrency=N)``) — the
  fan-out/merge analogue of ``Msg39``/``Msg3a`` for a *term-partitioned*
  index: a query only touches the shards owning its terms;
- by tests comparing against the oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import IndexConfig
from ..index.build import load_meta
from ..index.manifest import segment_path
from ..index.segments import SegmentReader, decode_posting_row
from .kernel import TermPostings, evaluate
from .parse import ParsedQuery, parse_query


class IndexSearcher:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.meta = load_meta(index_dir)
        cfg = dict(self.meta["config"])
        cfg["field_weights"] = tuple(cfg["field_weights"])
        self.config = IndexConfig(**cfg)
        self.n_docs = int(self.meta["n_docs"])
        self.avgdl = float(self.meta["avgdl"])
        self.p = int(self.meta["num_partitions"])
        self.s = int(self.meta["num_salts"])
        self.hot_terms = np.asarray(self.meta["hot_terms"], dtype=np.uint64)
        self._readers: dict[int, SegmentReader | None] = {}
        self._cache: dict[tuple[int, bool], TermPostings | None] = {}

    def _reader(self, shard: int) -> SegmentReader | None:
        r = self._readers.get(shard, False)
        if r is not False:
            return r
        path = segment_path(self.index_dir, shard,
                            self.meta.get("generation", 0))
        r = SegmentReader(path) if os.path.exists(path) else None
        self._readers[shard] = r
        return r

    def shards_for_term(self, term_id: int) -> list[int]:
        t = np.uint64(term_id)
        if len(self.hot_terms):
            i = int(np.searchsorted(self.hot_terms, t))
            if i < len(self.hot_terms) and self.hot_terms[i] == t:
                base = self.p + i * self.s
                return list(range(base, base + self.s))
        return [int(t % np.uint64(self.p))]

    def get_postings(self, term_id: int,
                     with_positions: bool = False) -> TermPostings | None:
        key = (term_id, with_positions)
        if key in self._cache:
            return self._cache[key]
        if (term_id, True) in self._cache:
            return self._cache[(term_id, True)]
        rows = []
        for shard in self.shards_for_term(term_id):
            rd = self._reader(shard)
            if rd is None:
                continue
            tbl = rd.read_terms([term_id])
            rows.extend(tbl.to_pylist())
        if not rows:
            self._cache[key] = None
            return None
        decoded = [decode_posting_row(r, with_positions) for r in rows]
        docs = np.concatenate([d["doc_ids"] for d in decoded])
        tfs = np.concatenate([d["tfs"] for d in decoded])
        dl = np.concatenate([d["dl"] for d in decoded])
        order = np.argsort(docs, kind="stable")
        tp = TermPostings(
            doc_ids=docs[order], tfs=tfs[order], dl=dl[order],
            df=int(sum(d["df"] for d in decoded)),
            positions=None,
            block_max=None if len(decoded) > 1 else decoded[0]["block_max"])
        if with_positions:
            pos = []
            for d in decoded:
                pos.extend(d["positions"])
            tp.positions = [pos[i] for i in order]
        self._cache[key] = tp
        return tp

    def _lists_for(self, pq_: ParsedQuery) -> dict[int, TermPostings | None]:
        phrase_terms = {t for chain in pq_.phrases for t in chain}
        lists: dict[int, TermPostings | None] = {}
        for t in pq_.terms:
            if t.term_id not in lists:
                lists[t.term_id] = self.get_postings(
                    t.term_id, with_positions=t.term_id in phrase_terms)
        return lists

    def search(self, query: str, k: int = 10):
        """→ (doc_ids, scores) exact BM25F top-k."""
        pq_ = parse_query(query, self.config.bigram_weight)
        lists = self._lists_for(pq_)
        return evaluate(pq_, lists, self.n_docs, self.avgdl, self.config, k)

    def search_table(self, query: str, k: int = 10) -> pa.Table:
        docs, scores = self.search(query, k)
        return pa.table({
            "rank": pa.array(np.arange(1, len(docs) + 1, dtype=np.int32)),
            "doc_id": pa.array(docs, pa.uint64()),
            "score": pa.array(scores, pa.float64()),
        })


class QueryEvalStage:
    """Actor-pool callable: batch of queries → top-k rows per query."""

    def __init__(self, index_dir: str):
        self.searcher = IndexSearcher(index_dir)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
        for qid, q, k in zip(batch["query_id"], batch["query"], batch["k"]):
            docs, scores = self.searcher.search(q, int(k))
            n = len(docs)
            out["query_id"].extend([qid] * n)
            out["rank"].extend(range(1, n + 1))
            out["doc_id"].extend(int(d) for d in docs)
            out["score"].extend(float(s) for s in scores)
        return pd.DataFrame(out)


def evaluate_queries_distributed(index_dir: str, queries: list[tuple[str, str, int]],
                                 concurrency: int = 4):
    """Batch query evaluation as a Dataset pipeline (bench path)."""
    import ray.data

    qds = ray.data.from_items(
        [{"query_id": qid, "query": q, "k": k} for qid, q, k in queries])
    return qds.map_batches(
        QueryEvalStage, fn_constructor_kwargs={"index_dir": index_dir},
        batch_format="pandas", batch_size=max(1, len(queries) // concurrency),
        concurrency=concurrency)
