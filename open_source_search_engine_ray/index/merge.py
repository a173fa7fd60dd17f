"""Incremental index maintenance: append generations, tombstone deletes,
updates (delete+readd), stats refresh, and compaction.

Mirrors the reference's LSM lifecycle re-expressed over immutable Parquet
generations:

- incremental adds land in a NEW generation (the in-memory tree dumped to a
  new numbered file, ``Rdb.cpp:717-790``) — here a self-contained sub-index
  built by the same ``build_index`` pipeline under ``gens/g{G}/``;
- deletes are tombstones ``(doc_id, dead_upto_gen)`` (negative keys with the
  del-bit, ``Rdb.h:76-88``, ``Posdb.h:226-228``): postings of generations
  ≤ ``dead_upto_gen`` for that doc are dead; a later re-add revives the doc
  (newest-file-wins, ``RdbList.cpp:2361-2372`` filePos filtering);
- an update = tombstone + re-add in the next generation;
- global scoring stats (live N, avgdl) are refreshed from the per-generation
  doc-stats tables with newest-generation-wins per doc (driver-side merge
  here; a Ray aggregate at cluster scale);
- ``compact()`` rebuilds the live corpus into a fresh single-generation
  index and swaps — the ``Repair``/``DocRebuild`` rebuild-and-swap path
  (``Repair.cpp``, ``DocRebuild.cpp``); a segment-level k-way merge
  (``posdbMerge_r``) is the planned optimization.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..config import IndexConfig, NUM_FIELDS
from .build import build_index, load_meta

GENERATIONS_FILE = "generations.json"
TOMBSTONES_FILE = "tombstones.parquet"


def _gens_path(out_dir: str) -> str:
    return os.path.join(out_dir, GENERATIONS_FILE)


def read_generations(out_dir: str) -> dict:
    path = _gens_path(out_dir)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"generations": [{"gen": 0, "dir": "."}], "live_stats": None}


def _write_generations(out_dir: str, doc: dict) -> None:
    tmp = _gens_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, _gens_path(out_dir))


def gen_dir(out_dir: str, gen: int) -> str:
    return out_dir if gen == 0 else os.path.join(out_dir, "gens", f"g{gen}")


def read_tombstones(out_dir: str):
    """→ (doc_ids sorted uint64, dead_upto_gen int32) or empty arrays."""
    path = os.path.join(out_dir, TOMBSTONES_FILE)
    if not os.path.exists(path):
        return (np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int32))
    df = pq.read_table(path).to_pandas()
    agg = df.groupby("doc_id")["dead_upto_gen"].max().sort_index()
    return (agg.index.to_numpy().astype(np.uint64),
            agg.to_numpy().astype(np.int32))


def add_documents(out_dir: str, transcripts_ds_factory, *,
                  input_token: str,
                  config: IndexConfig | None = None) -> dict:
    """Append a new generation containing the given documents."""
    gens = read_generations(out_dir)
    new_gen = max(g["gen"] for g in gens["generations"]) + 1
    sub = gen_dir(out_dir, new_gen)
    base_meta = load_meta(out_dir)
    cfg = config or IndexConfig(**{
        **base_meta["config"],
        "field_weights": tuple(base_meta["config"]["field_weights"])})
    meta = build_index(transcripts_ds_factory, sub, cfg,
                       input_token=input_token)
    gens["generations"].append({"gen": new_gen,
                                "dir": os.path.relpath(sub, out_dir),
                                "input_token": input_token,
                                "built_at": time.time()})
    _write_generations(out_dir, gens)
    refresh_stats(out_dir)
    return meta


def delete_docs(out_dir: str, doc_ids) -> int:
    """Tombstone documents: their postings in all current generations die;
    a later re-add revives them."""
    gens = read_generations(out_dir)
    cur = max(g["gen"] for g in gens["generations"])
    path = os.path.join(out_dir, TOMBSTONES_FILE)
    new = pa.table({
        "doc_id": pa.array(np.asarray(list(doc_ids), dtype=np.uint64)),
        "dead_upto_gen": pa.array(
            np.full(len(doc_ids), cur, dtype=np.int32)),
    })
    if os.path.exists(path):
        new = pa.concat_tables([pq.read_table(path), new])
    tmp = path + ".tmp"
    pq.write_table(new, tmp)
    os.replace(tmp, path)
    refresh_stats(out_dir)
    return len(doc_ids)


def delete_convs(out_dir: str, conv_ids: list[str]) -> int:
    from ..functions.ghash import doc_ids_for_convs

    return delete_docs(out_dir, doc_ids_for_convs(conv_ids).tolist())


def live_doc_stats(out_dir: str) -> pd.DataFrame:
    """Per-doc stats with newest-generation-wins and tombstones applied."""
    gens = read_generations(out_dir)
    frames = []
    for g in gens["generations"]:
        d = gen_dir(out_dir, g["gen"])
        tbl = pads.dataset(os.path.join(d, "docstats"),
                           format="parquet").to_table().to_pandas()
        tbl["gen"] = g["gen"]
        frames.append(tbl)
    df = pd.concat(frames, ignore_index=True)
    # newest generation wins per doc
    df = (df.sort_values(["doc_id", "gen"])
          .drop_duplicates("doc_id", keep="last"))
    tomb_doc, tomb_dead = read_tombstones(out_dir)
    if len(tomb_doc):
        doc = df["doc_id"].to_numpy().astype(np.uint64)
        idx = np.clip(np.searchsorted(tomb_doc, doc), 0,
                      max(0, len(tomb_doc) - 1))
        dead = (tomb_doc[idx] == doc) & \
            (tomb_dead[idx] >= df["gen"].to_numpy())
        df = df[~dead]
    return df.reset_index(drop=True)


def refresh_stats(out_dir: str) -> dict:
    """Recompute live N / avgdl into generations.json (exact int sums)."""
    df = live_doc_stats(out_dir)
    n_docs = len(df)
    total_dlq = int(df["dl_q"].sum())
    gens = read_generations(out_dir)
    gens["live_stats"] = {
        "n_docs": n_docs,
        "total_dlq": total_dlq,
        "avgdl": float(np.float64(total_dlq) / 4.0 /
                       np.float64(max(1, n_docs))),
        "refreshed_at": time.time(),
    }
    _write_generations(out_dir, gens)
    return gens["live_stats"]


def live_transcripts(out_dir: str) -> pa.Table:
    """Live doc-store rows (newest generation wins, tombstones applied)."""
    gens = read_generations(out_dir)
    frames = []
    for g in gens["generations"]:
        d = gen_dir(out_dir, g["gen"])
        t = pads.dataset(os.path.join(d, "docstore"),
                         format="parquet").to_table().to_pandas()
        t["gen"] = g["gen"]
        frames.append(t)
    df = pd.concat(frames, ignore_index=True)
    newest = df.groupby("doc_id")["gen"].transform("max")
    df = df[df["gen"] == newest]
    tomb_doc, tomb_dead = read_tombstones(out_dir)
    if len(tomb_doc):
        doc = df["doc_id"].to_numpy().astype(np.uint64)
        idx = np.clip(np.searchsorted(tomb_doc, doc), 0,
                      max(0, len(tomb_doc) - 1))
        dead = (tomb_doc[idx] == doc) & \
            (tomb_dead[idx] >= df["gen"].to_numpy())
        df = df[~dead]
    df = df.drop(columns=["gen"])
    return pa.Table.from_pandas(df, preserve_index=False)


def compact(out_dir: str, config: IndexConfig | None = None) -> dict:
    """Rebuild the live corpus into a fresh single-generation index and
    swap (Repair/DocRebuild analogue)."""
    import ray.data

    base_meta = load_meta(out_dir)
    cfg = config or IndexConfig(**{
        **base_meta["config"],
        "field_weights": tuple(base_meta["config"]["field_weights"])})
    live = live_transcripts(out_dir)
    live = live.drop_columns(["doc_id"])
    tmp_corpus = out_dir + ".compact_corpus.parquet"
    pq.write_table(live, tmp_corpus)
    new_dir = out_dir + ".compacting"
    shutil.rmtree(new_dir, ignore_errors=True)
    meta = build_index(lambda: ray.data.read_parquet(tmp_corpus), new_dir,
                       cfg,
                       input_token=f"compact:{base_meta['fingerprint']}:"
                                   f"{time.time()}")
    old_dir = out_dir + ".old"
    shutil.rmtree(old_dir, ignore_errors=True)
    os.replace(out_dir, old_dir)
    os.replace(new_dir, out_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    os.remove(tmp_corpus)
    return meta
