"""Deterministic sampling operators for training-data curation.

A 100-TB pipeline downsamples by *stable hash*, never by RNG: the same
doc keeps/drops on every run, on any cluster size, with no coordination
(the reference's analogous determinism is its idempotent sorted keys,
``Rdb.h:76-88`` — a record's fate is a pure function of its key).

The hash here is the Knuth multiplicative hash ``(doc_id * 2654435761)
mod 2^32`` — chosen because it is exact in both numpy int64 arithmetic
and ANSI SQL, so the DuckDB oracle checks the *selection itself*, not
just aggregate counts.  For string keys, swap in ``hash64`` from
``functions/ghash.py`` (already bit-exact vs the reference).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH = 2654435761
MOD = 1 << 32
# SQL twin of knuth_hash(): HUGEINT intermediate so the product can never
# overflow BIGINT (doc_id > ~3.47e9 would wrap int64)
# ((x % M + M) % M) = mathematical mod, matching numpy uint64 even for
# negative doc_ids (DuckDB % takes the dividend sign)
KNUTH_SQL = (f"(((doc_id % {MOD} + {MOD}) % {MOD})::HUGEINT "
             f"* {KNUTH}) % {MOD}")


def knuth_hash(doc_id):
    """(doc_id mod 2^32) * KNUTH mod 2^32, exact for ALL int64 doc_ids:
    uint64 arithmetic holds the <= (2^32-1) * KNUTH < 2^64 product, where
    the old int64 path silently wrapped past doc_id ~ 3.47e9."""
    return (((doc_id.astype(np.uint64) % MOD) * np.uint64(KNUTH)) %
            np.uint64(MOD)).astype(np.int64)

# per-language keep rates (a data-mixing recipe: keep half the English,
# thin the rest) — doc_id-keyed so the sample is reproducible
STRATA_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25}
DEFAULT_RATE = 0.10


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                 columns=columns)


def stratified_sample(sf_dir: str):
    """→ (doc_id, lang) of the kept documents: per-language deterministic
    hash sampling.

    Pure map-side filter — no shuffle, no RNG, no driver state; every
    batch decides its own rows from ``(doc_id * KNUTH) % 2^32 <
    rate(lang) * 2^32``.  This is the only sampling shape that holds at
    10^12 rows: selection is embarrassingly parallel and re-runs (or a
    resumed run over the surviving partitions) keep the identical set.
    """
    thresholds = {k: int(v * MOD) for k, v in STRATA_RATES.items()}
    default_thr = int(DEFAULT_RATE * MOD)

    def keep(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy()
        h = knuth_hash(doc_id)
        lang = b["lang"].to_numpy(zero_copy_only=False)
        thr = np.full(len(doc_id), default_thr, dtype=np.int64)
        for lg, t in thresholds.items():
            thr[lang == lg] = t
        return b.filter(pa.array(h < thr))

    return _read(sf_dir, "documents", ["doc_id", "lang"]) \
        .map_batches(keep, batch_format="pyarrow")


def stratified_sample_sql() -> str:
    cases = " ".join(
        f"WHEN '{lg}' THEN {int(r * MOD)}"
        for lg, r in STRATA_RATES.items())
    return f"""
SELECT doc_id, lang FROM documents
WHERE {KNUTH_SQL} <
      CASE lang {cases} ELSE {int(DEFAULT_RATE * MOD)} END
ORDER BY doc_id
"""


# train/val/test shares in percent (hash buckets 0..99)
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10


def train_split(sf_dir: str):
    """→ (doc_id, split, sort_key): deterministic train/val/test
    assignment + shuffle key — the split-and-shuffle step every training
    run applies before sharding.

    ``split`` comes from ``knuth_hash(doc_id) % 100`` bucket ranges
    (80/10/10), ``sort_key`` is the hash itself: consumers ORDER BY
    ``sort_key`` to get the reproducible global shuffle without this
    operator paying a corpus-wide sort (assignment is pure map-side — the
    only shape that holds at 10^12 rows; the reorder happens inside each
    consumer's own range partition).  Same doc → same split on any
    cluster size, any re-run, any corpus subset — the property that keeps
    eval sets stable as the corpus grows."""
    def assign(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy()
        h = knuth_hash(doc_id)
        bucket = h % 100
        split = np.where(
            bucket < SPLIT_TRAIN_PCT, "train",
            np.where(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT,
                     "val", "test"))
        return pa.table({
            "doc_id": b["doc_id"],
            "split": pa.array(split.astype(object), pa.string()),
            "sort_key": pa.array(h, pa.int64()),
        })

    return _read(sf_dir, "documents", ["doc_id"]) \
        .map_batches(assign, batch_format="pyarrow")


def train_split_sql() -> str:
    return f"""
SELECT doc_id,
       CASE WHEN ({KNUTH_SQL}) % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN ({KNUTH_SQL}) % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT}
              THEN 'val'
            ELSE 'test' END AS split,
       ({KNUTH_SQL})::BIGINT AS sort_key
FROM documents ORDER BY doc_id
"""


K_PER_GROUP = 3


def sample_k_per_group(sf_dir: str):
    """→ (lang, doc_id): a deterministic uniform-without-replacement
    sample of exactly ``min(K, |group|)`` documents per language — the
    per-stratum fixed-quota companion to ``stratified_sample``'s
    rate-based thinning.

    Order within a group is by ``(knuth_hash(doc_id), doc_id)`` — a
    reproducible shuffle, so the "first K" is a uniform draw that any
    re-run (or any cluster size) reproduces.  Scale shape: a map-side
    per-batch top-K partial (each batch keeps ≤K rows per group — the
    combiner), then one tiny ``groupby(lang)`` merge over ≤K×batches
    rows; the full corpus never shuffles.
    """
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy()
        h = knuth_hash(doc_id)
        df = pd.DataFrame({
            "lang": b["lang"].to_numpy(zero_copy_only=False),
            "doc_id": doc_id, "h": h})
        df = df.sort_values(["lang", "h", "doc_id"], kind="stable")
        df = df.groupby("lang", sort=False).head(K_PER_GROUP)
        return pa.table({
            "lang": pa.array(df["lang"], pa.string()),
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            "h": pa.array(df["h"].to_numpy(), pa.int64()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="stable").head(K_PER_GROUP)
        return g[["lang", "doc_id"]]

    return (_read(sf_dir, "documents", ["doc_id", "lang"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("lang").map_groups(merge, batch_format="pandas"))


def sample_k_per_group_sql() -> str:
    return f"""
SELECT lang, doc_id FROM documents
QUALIFY row_number() OVER (
    PARTITION BY lang
    ORDER BY {KNUTH_SQL}, doc_id) <= {K_PER_GROUP}
ORDER BY lang, doc_id
"""


PACK_BUDGET = 2048       # tokens per packed sequence
PACK_PARTS = 16          # independent packing partitions


def pack_sequences(sf_dir: str):
    """→ (doc_id, part, bin_id, bin_offset): assign every document to a
    fixed token-budget training bin — the sequence-packing step a
    pretraining dataloader needs (contiguous fill: a doc starts at the
    running token offset of its partition; its bin is that offset //
    budget).

    Scale shape: packing needs a PREFIX SUM, and a global one would
    serialize the corpus.  Instead docs hash into ``doc_id % P``
    partitions and each partition packs independently in doc_id order —
    one ``groupby(part)`` shuffle of (doc_id, n_tokens) pairs, a
    vectorized cumsum per group, and P scales with the cluster.  Global
    bin ids are ``part * 2^32 + local_bin`` (disjoint by construction).
    Token counts are the shared ``tokenize_simple`` definition, so the
    DuckDB oracle replicates the packing bit-for-bit with window
    functions.
    """
    import pandas as pd

    from ..functions.tokenizer import tokenize_simple

    def count_tokens(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        n_toks = [len(tokenize_simple(t or ""))
                  for t in b["text"].to_pylist()]
        return pa.table({
            "part": pa.array(ids % PACK_PARTS),
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(np.asarray(n_toks, np.int64)),
        })

    def pack(g: pd.DataFrame) -> pa.Table:
        order = np.argsort(g["doc_id"].to_numpy(), kind="stable")
        ids = g["doc_id"].to_numpy()[order]
        nt = g["n_tokens"].to_numpy()[order]
        prev = np.concatenate([[0], np.cumsum(nt)[:-1]])
        part = int(g["part"].iloc[0])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "part": pa.array(np.full(len(ids), part, np.int64)),
            "bin_id": pa.array(part * (1 << 32) + prev // PACK_BUDGET),
            "bin_offset": pa.array(prev % PACK_BUDGET),
        })

    import ray.data

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
            .map_batches(count_tokens, batch_format="pyarrow")
            .groupby("part").map_groups(pack, batch_format="pandas"))


def pack_sequences_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         (SELECT count(*) FROM UNNEST(
             regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
          WHERE t.term <> '') AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, doc_id % {PACK_PARTS} AS part, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
             PARTITION BY doc_id % {PACK_PARTS} ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS prev
  FROM toks
)
SELECT doc_id, part,
       (part * {1 << 32} + prev // {PACK_BUDGET})::BIGINT AS bin_id,
       (prev % {PACK_BUDGET})::BIGINT AS bin_offset
FROM packed ORDER BY doc_id
"""
