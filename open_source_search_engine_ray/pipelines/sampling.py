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
        h = (doc_id.astype(np.int64) * KNUTH) % MOD
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
WHERE (doc_id * {KNUTH}) % {MOD} <
      CASE lang {cases} ELSE {int(DEFAULT_RATE * MOD)} END
ORDER BY doc_id
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
        h = (doc_id.astype(np.int64) * KNUTH) % MOD
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
    ORDER BY (doc_id * {KNUTH}) % {MOD}, doc_id) <= {K_PER_GROUP}
ORDER BY lang, doc_id
"""
