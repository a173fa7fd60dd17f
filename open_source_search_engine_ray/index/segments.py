"""Posting-list segment files: encode (build side) and read (query side).

A segment file is one Parquet file per shuffle shard holding one row per
(term_id, salt): delta+varbyte docId gaps, per-field varbyte tfs, float32
doc lengths, nested varbyte positions, and float32 per-block max impacts —
the columnar analogue of the reference's prefix-compressed termlists
(``Posdb.h:230-235``, ``RdbList.h:13-47``) plus the block-max metadata that
replaces per-candidate upper-bound scans (``PosdbTable.cpp:4102-4264``).

Rows are sorted by term_id and written with small row groups so the query
side prunes to the row groups containing the requested terms (the RdbMap
16KB page-index analogue, ``RdbMap.h:1-50``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import IndexConfig, NUM_FIELDS
from ..functions import varbyte

SEGMENT_SCHEMA = pa.schema([
    ("term_id", pa.uint64()),
    ("salt", pa.int32()),
    ("df", pa.int64()),
    ("cf", pa.int64()),
    ("max_tfq", pa.int64()),
    ("doc_blob", pa.large_binary()),
    ("dl_blob", pa.large_binary()),
    ("tf_blobs", pa.list_(pa.large_binary(), NUM_FIELDS)),
    # positions: per-doc counts and delta-coded values as SEPARATE varbyte
    # streams so decode is two vectorized passes (no per-doc loop)
    ("cnt_blob", pa.large_binary()),
    ("pos_blob", pa.large_binary()),
    ("bm_blob", pa.large_binary()),
])


def encode_shard(postings: pa.Table, config: IndexConfig, salt: int,
                 avgdl: float) -> pa.Table:
    """Encode one shard's posting partials into segment rows.

    ``postings`` columns: term_id, doc_id, field, tf, positions, dl.
    Partials with the same (term, doc) from different turns/batches are
    merged here (tf summed per field, positions concatenated sorted) — the
    posting-merge analogue of ``RdbList::posdbMerge_r``.
    """
    if postings.num_rows == 0:
        return SEGMENT_SCHEMA.empty_table()
    postings = postings.combine_chunks()
    term = postings["term_id"].to_numpy()
    doc = postings["doc_id"].to_numpy()
    field = postings["field"].to_numpy()          # uint8
    tf = postings["tf"].to_numpy()                # int32
    dl = postings["dl"].to_numpy()                # float32
    pos_col = postings["positions"].combine_chunks()
    pos_offsets = pos_col.offsets.to_numpy().astype(np.int64)
    pos_values = pos_col.values.to_numpy()        # int32

    # sort by (term, doc) only — rows of the same (term, doc) merge via
    # commutative accumulation, so field order inside a group is free
    order = np.lexsort((doc, term))
    term, doc, field, tf, dl = (term[order], doc[order], field[order],
                                tf[order], dl[order])
    tf = tf.astype(np.int64)

    # (term, doc) group boundaries
    new_td = np.empty(len(term), dtype=bool)
    new_td[0] = True
    new_td[1:] = (term[1:] != term[:-1]) | (doc[1:] != doc[:-1])
    td_starts = np.flatnonzero(new_td)
    td_id = np.cumsum(new_td) - 1           # group index per row
    n_td = len(td_starts)

    # per-(term,doc) per-field tf matrix
    tfs = np.zeros((n_td, NUM_FIELDS), dtype=np.int64)
    np.add.at(tfs, (td_id, field), tf)
    g_term = term[td_starts]
    g_doc = doc[td_starts]
    g_dl = dl[td_starts]

    # weighted tf in exact quarters (see functions/bm25.py contract)
    wq = np.asarray([int(round(w * 4)) for w in config.field_weights],
                    dtype=np.int64)
    tfq = tfs @ wq

    # positions per (term,doc): concatenate source lists in row order
    # (sorted by (term,doc,field); within each original list positions are
    # ascending, and lists from different turns don't interleave-sort —
    # we re-sort the concatenation per group)
    row_pos_lens = pos_offsets[1:] - pos_offsets[:-1]
    row_pos_lens = row_pos_lens[order]
    src_starts = pos_offsets[:-1][order]
    flat_idx = np.repeat(src_starts, row_pos_lens) + _ragged_arange(row_pos_lens)
    flat_pos = pos_values[flat_idx]
    grp_of_pos = np.repeat(td_id, row_pos_lens)
    pos_order = np.lexsort((flat_pos, grp_of_pos))
    flat_pos = flat_pos[pos_order]
    grp_pos_counts = np.zeros(n_td, dtype=np.int64)
    np.add.at(grp_pos_counts, grp_of_pos, 1)

    # deterministic positions cap: per (term, doc), after the merge of all
    # batch partials and the ascending sort, keep only the first
    # max_positions_per_doc positions.  tf is NOT capped (scoring exact);
    # only phrase matching sees the truncation — same rule in OracleIndex.
    cap = config.max_positions_per_doc
    if int(grp_pos_counts.max(initial=0)) > cap:
        keep = _ragged_arange(grp_pos_counts) < cap
        flat_pos = flat_pos[keep]
        grp_pos_counts = np.minimum(grp_pos_counts, cap)

    return encode_from_groups(g_term, g_doc, g_dl, tfs, flat_pos,
                              grp_pos_counts, config, salt, avgdl)


def encode_from_groups(g_term: np.ndarray, g_doc: np.ndarray,
                       g_dl: np.ndarray, tfs: np.ndarray,
                       flat_pos: np.ndarray, grp_pos_counts: np.ndarray,
                       config: IndexConfig, salt: int,
                       avgdl: float) -> pa.Table:
    """Encode already-merged (term, doc) groups (sorted by term then doc)
    into segment rows.  Shared by the build path (``encode_shard``) and
    segment-level compaction (index/merge.py) — same blobs either way."""
    if len(g_term) == 0:
        return SEGMENT_SCHEMA.empty_table()
    n_td = len(g_term)
    wq = np.asarray([int(round(w * 4)) for w in config.field_weights],
                    dtype=np.int64)
    tfq = tfs @ wq
    grp_pos_offsets = np.concatenate([[0], np.cumsum(grp_pos_counts)])

    # term boundaries over the (term,doc) groups
    new_t = np.empty(n_td, dtype=bool)
    new_t[0] = True
    new_t[1:] = g_term[1:] != g_term[:-1]
    t_starts = np.flatnonzero(new_t)
    t_ends = np.append(t_starts[1:], n_td)
    n_terms = len(t_starts)
    k1, b, bs = config.k1, config.b, config.block_size

    # --- vectorized per-term encodes (no per-term Python varbyte calls;
    # each slice below is byte-identical to encoding that term alone) ---

    # docId deltas with reset at term starts
    doc_deltas = g_doc.copy()
    doc_deltas[1:] -= g_doc[:-1]
    doc_deltas[t_starts] = g_doc[t_starts]
    doc_all, doc_offs = varbyte.encode_segmented(doc_deltas, t_starts)
    doc_view = memoryview(doc_all)

    # per-field tf streams
    tf_all, tf_offs = [], []
    for f in range(NUM_FIELDS):
        blob, offs = varbyte.encode_segmented(
            tfs[:, f].astype(np.uint64), t_starts)
        tf_all.append(memoryview(blob))
        tf_offs.append(offs)

    # float32 dl stream: per-term slice of the packed array
    dl_bytes = memoryview(g_dl.astype("<f4").tobytes())

    # positions: separate count stream (per doc) and delta stream (reset at
    # each doc's first position, which is stored absolute)
    n_pos = len(flat_pos)
    cnt_all, cnt_offs = varbyte.encode_segmented(
        grp_pos_counts.astype(np.uint64), t_starts)
    cnt_view = memoryview(cnt_all)
    if n_pos:
        pos_deltas = flat_pos.astype(np.uint64)
        pd = pos_deltas.copy()
        pd[1:] -= pos_deltas[:-1]
        gstarts = grp_pos_offsets[:-1][grp_pos_counts > 0]
        pd[gstarts] = pos_deltas[gstarts]
    else:
        pd = np.zeros(0, dtype=np.uint64)
    pos_all, pos_offs = varbyte.encode_segmented(
        pd, grp_pos_offsets[t_starts])
    pos_view = memoryview(pos_all)

    # per-block max impacts (block-max WAND metadata)
    s_all = _scores_noidf(tfq.astype(np.float64) / 4.0, g_dl, avgdl, k1, b)
    df_per_term = t_ends - t_starts
    nblocks = (df_per_term + bs - 1) // bs
    blk_starts = (np.repeat(t_starts, nblocks) +
                  _ragged_arange(nblocks) * bs).astype(np.int64)
    bm_all = np.maximum.reduceat(s_all, blk_starts)
    bm32 = bm_all.astype(np.float32)
    low = bm32.astype(np.float64) < bm_all
    bm32[low] = np.nextafter(bm32[low], np.float32(np.inf))
    bm_bytes = memoryview(bm32.astype("<f4").tobytes())
    bm_offs = np.concatenate([[0], np.cumsum(nblocks)])

    # per-term cf / max_tfq via segmented reductions
    cf_all = np.add.reduceat(tfs.sum(axis=1), t_starts)
    maxtfq_all = np.maximum.reduceat(tfq, t_starts)

    out = {
        "term_id": g_term[t_starts],
        "salt": np.full(n_terms, salt, dtype=np.int32),
        "df": df_per_term.astype(np.int64),
        "cf": cf_all.astype(np.int64),
        "max_tfq": maxtfq_all.astype(np.int64),
        "doc_blob": [bytes(doc_view[doc_offs[i]:doc_offs[i + 1]])
                     for i in range(n_terms)],
        "dl_blob": [bytes(dl_bytes[t_starts[i] * 4:t_ends[i] * 4])
                    for i in range(n_terms)],
        "tf_blobs": [[bytes(tf_all[f][tf_offs[f][i]:tf_offs[f][i + 1]])
                      for f in range(NUM_FIELDS)] for i in range(n_terms)],
        "cnt_blob": [bytes(cnt_view[cnt_offs[i]:cnt_offs[i + 1]])
                     for i in range(n_terms)],
        "pos_blob": [bytes(pos_view[pos_offs[i]:pos_offs[i + 1]])
                     for i in range(n_terms)],
        "bm_blob": [bytes(bm_bytes[bm_offs[i] * 4:bm_offs[i + 1] * 4])
                    for i in range(n_terms)],
    }
    return pa.table(out, schema=SEGMENT_SCHEMA)


def _scores_noidf(tf_w: np.ndarray, dl_w: np.ndarray, avgdl: float,
                  k1: float, b: float) -> np.ndarray:
    from ..functions.bm25 import term_scores

    return term_scores(tf_w, dl_w, avgdl, k1, b, 1.0)


def _ragged_arange(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ids = np.arange(total, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return ids - np.repeat(offs, lens)


def write_segment(table: pa.Table, path: str) -> None:
    """Idempotent write: tmp file + atomic rename (the ``*.writing`` →
    final-name pattern of ``RdbBase``)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".writing.%d" % os.getpid()
    pq.write_table(table, tmp, row_group_size=512, compression="zstd")
    os.replace(tmp, path)


class SegmentReader:
    """Reads term rows from a shard's segment file with row-group pruning
    and an in-process decoded-list cache (page-cache / Msg5 analogue)."""

    def __init__(self, path: str):
        self.path = path
        self._pf = pq.ParquetFile(path)
        self._rg_min: np.ndarray | None = None
        self._rg_max: np.ndarray | None = None
        self._load_rg_stats()

    def _load_rg_stats(self):
        mins, maxs = [], []
        md = self._pf.metadata
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            st = col.statistics
            mins.append(st.min if st else 0)
            maxs.append(st.max if st else 2**64 - 1)
        self._rg_min = np.asarray(mins, dtype=np.uint64)
        self._rg_max = np.asarray(maxs, dtype=np.uint64)

    def read_terms(self, term_ids: list[int],
                   with_positions: bool = True) -> pa.Table:
        want = np.asarray(sorted(set(term_ids)), dtype=np.uint64)
        rgs = [rg for rg in range(len(self._rg_min))
               if ((want >= self._rg_min[rg]) & (want <= self._rg_max[rg])).any()]
        if not rgs:
            return SEGMENT_SCHEMA.empty_table()
        cols = [f.name for f in SEGMENT_SCHEMA]
        if not with_positions:
            cols.remove("pos_blob")  # often the largest column; scoring
            cols.remove("cnt_blob")  # without a phrase filter neither is
            # ever touched
        tbl = self._pf.read_row_groups(rgs, columns=cols)
        mask = pc.is_in(tbl["term_id"], value_set=pa.array(want, pa.uint64()))
        return tbl.filter(mask)


def _concat_binary(col) -> tuple[np.ndarray, np.ndarray]:
    """(large_)binary column → (contiguous uint8 data, value offsets)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    obuf = arr.buffers()[1]
    width = 8 if pa.types.is_large_binary(arr.type) else 4
    dt = np.int64 if width == 8 else np.int32
    offs = np.frombuffer(obuf, dtype=dt)[arr.offset:arr.offset + len(arr) + 1]
    dbuf = arr.buffers()[2]
    data = (np.frombuffer(dbuf, dtype=np.uint8) if dbuf is not None
            else np.zeros(0, dtype=np.uint8))
    return data[offs[0]:offs[-1]], (offs - offs[0]).astype(np.int64)


def decode_posting_table(tbl: pa.Table, with_positions: bool = True) -> dict:
    """Decode ALL rows of a segment table in one vectorized pass → flat
    posting arrays (the bulk path ``compact_merge`` uses; per-row
    :func:`decode_posting_row` remains for single-term query reads).

    Varbyte is self-delimiting, so decoding the concatenation of every
    row's blob equals concatenating the per-row decodes — each blob column
    is decoded once, then per-row delta resets are applied with segmented
    cumsum corrections (no per-term Python loop).

    Returns dict: ``term`` uint64 per posting, ``docs`` uint64, ``tfs``
    (n, NUM_FIELDS) int64, ``dl`` float32, and with positions ``counts``
    int64 per posting + ``flat_pos`` uint64.
    """
    n_rows = tbl.num_rows
    empty = {
        "term": np.zeros(0, np.uint64), "docs": np.zeros(0, np.uint64),
        "tfs": np.zeros((0, NUM_FIELDS), np.int64),
        "dl": np.zeros(0, np.float32), "counts": np.zeros(0, np.int64),
        "flat_pos": np.zeros(0, np.uint64),
    }
    if n_rows == 0:
        return empty
    df = tbl["df"].to_numpy().astype(np.int64)
    total = int(df.sum())
    if total == 0:
        return empty
    post_offs = np.concatenate([[0], np.cumsum(df)])
    row_of_post = np.repeat(np.arange(n_rows, dtype=np.int64), df)
    term = np.repeat(tbl["term_id"].to_numpy(), df)

    # docIds: decode all deltas, cumsum, subtract per-row correction so
    # each row's first (absolute) docId survives
    doc_cat, _ = _concat_binary(tbl["doc_blob"])
    deltas = varbyte.decode(doc_cat)
    flat = np.cumsum(deltas, dtype=np.uint64)
    starts = post_offs[:-1]
    corr = flat[starts] - deltas[starts]
    docs = flat - np.repeat(corr, df)

    dl_cat, _ = _concat_binary(tbl["dl_blob"])
    dl = np.frombuffer(dl_cat.tobytes(), dtype="<f4")

    # per-field tfs: the fixed-size-list values concatenate row-major as
    # (row0 f0 | row0 f1 | ... | row1 f0 | ...); one decode, then gather
    tf_col = tbl["tf_blobs"].combine_chunks()
    # .flatten() is offset-aware; .values would silently decode the wrong
    # rows' tf streams for a sliced (non-zero-offset) input table
    tf_cat, _ = _concat_binary(tf_col.flatten())
    tf_all = varbyte.decode(tf_cat).astype(np.int64)
    local = np.arange(total, dtype=np.int64) - post_offs[row_of_post]
    base = NUM_FIELDS * post_offs[row_of_post]
    df_rep = df[row_of_post]
    tfs = np.empty((total, NUM_FIELDS), dtype=np.int64)
    for f in range(NUM_FIELDS):
        tfs[:, f] = tf_all[base + f * df_rep + local]

    out = {"term": term, "docs": docs, "tfs": tfs, "dl": dl}
    if with_positions:
        cnt_cat, _ = _concat_binary(tbl["cnt_blob"])
        counts = varbyte.decode(cnt_cat).astype(np.int64)
        pos_cat, _ = _concat_binary(tbl["pos_blob"])
        pdeltas = varbyte.decode(pos_cat)
        pflat = np.cumsum(pdeltas, dtype=np.uint64)
        pos_offs = np.concatenate([[0], np.cumsum(counts)])
        nz = counts > 0
        pstarts = pos_offs[:-1][nz]
        if len(pflat):
            seg_corr = pflat[pstarts] - pdeltas[pstarts]
            pflat = pflat - np.repeat(seg_corr, counts[nz])
        out["counts"] = counts
        out["flat_pos"] = pflat
    return out


def decode_posting_row(row: dict, with_positions: bool = False) -> dict:
    """Decode one segment row into numpy arrays.  Positions come back as
    (flat values uint64, offsets int64 of len df+1) — two vectorized
    decode passes, no per-doc loop."""
    docs = varbyte.decode_deltas(row["doc_blob"])
    dl = np.frombuffer(row["dl_blob"], dtype="<f4")
    tfs = np.stack([varbyte.decode(blob).astype(np.int64)
                    for blob in row["tf_blobs"]], axis=1)
    out = {
        "doc_ids": docs, "dl": dl, "tfs": tfs,
        "df": row["df"], "cf": row["cf"], "max_tfq": row["max_tfq"],
        "block_max": np.frombuffer(row["bm_blob"], dtype="<f4"),
    }
    if with_positions:
        counts = varbyte.decode(row["cnt_blob"]).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        deltas = varbyte.decode(row["pos_blob"])
        flat = np.cumsum(deltas, dtype=np.uint64)
        # subtract each doc's pre-segment cumulative so the per-doc first
        # (stored absolute) survives and deltas chain within the doc only
        starts = offsets[:-1][counts > 0]
        corr = np.zeros(len(flat), dtype=np.uint64)
        if len(flat):
            seg_corr = flat[starts] - deltas[starts]
            corr = np.repeat(seg_corr, counts[counts > 0])
            flat = flat - corr
        out["positions"] = (flat, offsets)
    return out
