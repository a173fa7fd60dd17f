"""Deduplication family over the ``documents`` table — first-class
training-data-pipeline operators.

The reference dedups at spider time by content hash
(``FIELD_GBCONTENTHASH`` ``Query.h:87``, no-split content-hash terms
``XmlDoc_Indexing.cpp:342-349``) and at query time by summary similarity
(``Msg40.cpp:1322``).  This module generalizes that to the standard
large-corpus menu:

- exact dedup (content-hash groupby; SQL-checkable via md5),
- exact n-gram Jaccard pairs (shared-shingle join — SQL-checkable),
- MinHash + LSH banding (approximate candidate generation + exact verify),
- SimHash fingerprints.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.ghash import hash64_batch
from ..functions.tokenizer import tokenize_simple

JACCARD_THRESHOLD = 0.5
SHINGLE_N = 3
MINHASH_PERMS = 64
LSH_BANDS = 16          # 16 bands × 4 rows
_MERS = np.uint64((1 << 61) - 1)


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=list(columns))


# ---------------------------------------------------------------------------
# exact dedup (content hash)
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str):
    """→ (text_hash, keeper_doc_id, n_dupes): md5 groups, keeper = min id.

    Hash-partitioned ``groupby`` + min — the scalable exact-dup pattern; at
    100 TB the md5 is computed map-side so only (hash, id) pairs shuffle.
    """
    import ray.data
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                  for t in batch["text"].to_pylist()]
        return pa.table({
            "text_hash": pa.array(hashes, pa.string()),
            "doc_id": batch["doc_id"],
        })

    ds = _read_docs(sf_dir).map_batches(add_hash, batch_format="pyarrow")
    return ds.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keeper_doc_id"),
        Count(alias_name="n_dupes"))


def exact_dedup_sql() -> str:
    return """
SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id,
       count(*) AS n_dupes
FROM documents GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# exact n-gram Jaccard near-dup pairs (shared-shingle join)
# ---------------------------------------------------------------------------

def _shingles(text: str) -> list[str]:
    toks = tokenize_simple(text or "")
    if len(toks) < SHINGLE_N:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + SHINGLE_N])
            for i in range(len(toks) - SHINGLE_N + 1)]


def ngram_jaccard_pairs(sf_dir: str):
    """→ (doc_a, doc_b, jaccard) for distinct-3-shingle Jaccard ≥ 0.5.

    Exact algorithm: candidate pairs via the shared-shingle equi-join
    (any pair with J>0 shares a shingle), intersection sizes from the join
    counts, set sizes broadcast.  The shingle join is the shuffle; hot
    shingles are the skew risk — bounded here by the distinct-shingle
    explode staying O(corpus tokens).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        docs, sh = [], []
        for d, t in zip(batch["doc_id"].to_numpy(),
                        batch["text"].to_pylist()):
            ss = set(_shingles(t))
            docs.extend([int(d)] * len(ss))
            sh.extend(ss)
        return pa.table({"doc_id": pa.array(docs, pa.int64()),
                         "shingle": pa.array(sh, pa.string())})

    exploded = _read_docs(sf_dir).map_batches(explode,
                                              batch_format="pyarrow")
    # |shingle set| per doc (broadcast small side)
    sizes_df = exploded.groupby("doc_id").aggregate(
        Count(alias_name="n")).to_pandas()
    sizes_sorted = sizes_df.sort_values("doc_id")
    size_ids = sizes_sorted["doc_id"].to_numpy()
    size_vals = sizes_sorted["n"].to_numpy()
    size_ref = ray.put((size_ids, size_vals))

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        docs = np.sort(group["doc_id"].to_numpy())
        if len(docs) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = np.triu_indices(len(docs), k=1)
        return pd.DataFrame({"doc_a": docs[a], "doc_b": docs[b]})

    pair_counts = (exploded.groupby("shingle")
                   .map_groups(pairs_in_bucket, batch_format="pandas")
                   .groupby(["doc_a", "doc_b"])
                   .aggregate(Count(alias_name="n_common")))

    def jaccard_batch(batch: pa.Table) -> pa.Table:
        ids, vals = ray.get(size_ref)
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        inter = batch["n_common"].to_numpy().astype(np.float64)
        na = vals[np.searchsorted(ids, a)].astype(np.float64)
        nb = vals[np.searchsorted(ids, b)].astype(np.float64)
        j = inter / (na + nb - inter)
        keep = j >= JACCARD_THRESHOLD
        return pa.table({
            "doc_a": pa.array(a[keep].astype(np.int64)),
            "doc_b": pa.array(b[keep].astype(np.int64)),
            "jaccard": pa.array(np.round(j[keep], 6), pa.float64()),
        })

    return pair_counts.map_batches(jaccard_batch, batch_format="pyarrow")


def ngram_jaccard_pairs_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(lower(text), '[^a-z0-9]+') AS arr
  FROM documents
),
clean AS (
  SELECT doc_id, list_filter(arr, x -> x <> '') AS arr FROM toks
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(arr) < {SHINGLE_N}
              THEN array_to_string(arr, ' ')
              ELSE array_to_string(arr[i:i+{SHINGLE_N - 1}], ' ') END AS shingle
  FROM clean,
       UNNEST(range(1, greatest(len(arr) - {SHINGLE_N - 1}, 1) + 1)) AS r(i)
  WHERE len(arr) > 0
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def dedup_clusters(sf_dir: str):
    """→ (doc_id, cluster_id): connected components over the exact
    near-dup pair graph (Jaccard ≥ 0.5), cluster_id = min doc_id in the
    component.  Pairs are computed distributed (shared-shingle join);
    the component labeling runs driver-side union-find because the pair
    set is provably small (≪ corpus); at larger scale this becomes a few
    rounds of min-label propagation with groupby."""
    pairs = ngram_jaccard_pairs(sf_dir).to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    docs = sorted(parent)
    return pd.DataFrame({"doc_id": docs,
                         "cluster_id": [find(d) for d in docs]})


def dedup_clusters_sql() -> str:
    return f"""
WITH RECURSIVE base AS ({ngram_jaccard_pairs_sql().replace(';', '')}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM base
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM base
),
nodes AS (SELECT DISTINCT a AS doc_id FROM edges),
comp(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.b, c.lbl FROM comp c JOIN edges e ON e.a = c.doc_id
)
SELECT doc_id, min(lbl) AS cluster_id FROM comp GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# MinHash + LSH (approximate; rows-only correctness check)
# ---------------------------------------------------------------------------

_rng = np.random.default_rng(1234)
_MH_A = (_rng.integers(1, (1 << 61) - 1, MINHASH_PERMS)
         .astype(np.uint64))
_MH_B = (_rng.integers(0, (1 << 61) - 1, MINHASH_PERMS)
         .astype(np.uint64))


def _minhash_sig(shingle_hashes: np.ndarray) -> np.ndarray:
    """64-perm MinHash via universal hashing (a*x+b mod 2^61-1)."""
    if len(shingle_hashes) == 0:
        return np.full(MINHASH_PERMS, np.iinfo(np.uint64).max, np.uint64)
    x = shingle_hashes[:, None] % _MERS
    h = (x * _MH_A[None, :] + _MH_B[None, :]) % _MERS
    return h.min(axis=0)


class MinHashStage:
    """Actor-pool stage: text → MinHash signature + LSH band keys."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows_per_band = MINHASH_PERMS // LSH_BANDS
        out_doc, out_band, out_key, out_sig = [], [], [], []
        for d, t in zip(batch["doc_id"].to_numpy(),
                        batch["text"].to_pylist()):
            sh = list(set(_shingles(t)))
            hashes = hash64_batch([s.encode() for s in sh])
            sig = _minhash_sig(hashes)
            for band in range(LSH_BANDS):
                chunk = sig[band * rows_per_band:(band + 1) * rows_per_band]
                key = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                out_doc.append(int(d))
                out_band.append(band)
                out_key.append(key)
                out_sig.append(sig.astype(np.int64) & ((1 << 62) - 1))
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.string()),
            "sig": pa.array([s.tolist() for s in out_sig],
                            pa.list_(pa.int64())),
        })


def minhash_lsh_pairs(sf_dir: str):
    """→ (doc_a, doc_b, est_jaccard): LSH-candidate pairs with signature
    agreement ≥ threshold.  Approximate — rows-only driver check; exactness
    is covered by ngram_jaccard_pairs."""
    from ray.data.aggregate import Count

    banded = _read_docs(sf_dir).map_batches(
        MinHashStage, batch_format="pyarrow", concurrency=(1, 4))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        docs = group["doc_id"].to_numpy()
        order = np.argsort(docs)
        docs = docs[order]
        sigs = group["sig"].to_numpy()[order]
        out_a, out_b, out_j = [], [], []
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                if docs[i] == docs[j]:
                    continue
                s1 = np.asarray(sigs[i])
                s2 = np.asarray(sigs[j])
                est = float((s1 == s2).mean())
                if est >= JACCARD_THRESHOLD:
                    out_a.append(int(docs[i]))
                    out_b.append(int(docs[j]))
                    out_j.append(round(est, 6))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b,
                             "est_jaccard": out_j})

    cand = (banded.groupby(["band", "band_key"])
            .map_groups(pairs, batch_format="pandas"))
    # a pair can surface from several bands → dedup
    return (cand.groupby(["doc_a", "doc_b"])
            .map_groups(lambda g: g.head(1), batch_format="pandas"))


# ---------------------------------------------------------------------------
# SimHash fingerprints (rows-only)
# ---------------------------------------------------------------------------

def simhash_docs(sf_dir: str):
    """→ (doc_id, simhash): 63-bit SimHash over tf-weighted token hashes."""
    def sim_batch(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["text"].to_pylist():
            toks = tokenize_simple(t or "")
            if not toks:
                out.append(0)
                continue
            uniq, counts = np.unique(toks, return_counts=True)
            hs = hash64_batch([u.encode() for u in uniq])
            bits = ((hs[:, None] >> np.arange(63, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            votes = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
            sh = int(((votes > 0).astype(np.uint64) <<
                      np.arange(63, dtype=np.uint64)).sum())
            out.append(sh)
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(out, pa.int64())})

    return _read_docs(sf_dir).map_batches(sim_batch, batch_format="pyarrow")
