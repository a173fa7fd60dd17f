"""The BM25F scoring contract — one kernel shared by the oracle and the
distributed engine so "rank-identical" is well-defined bit-for-bit.

The reference scores with a proximity model (``PosdbTable.cpp:273-803``,
weakest-link min over terms, ``SURVEY.md`` §2.12); this engine's defined
contract is BM25 with role/tool field weighting (the north rule), with the
reference's ``termFreqWeight`` idf analogue (``Msg3a.cpp:967-996``) replaced
by the Robertson/Lucene idf.

Contract (all float64, fixed evaluation order):

- fields: per-turn role/tool → field id (config.role_tool_to_field);
- field weights are multiples of 1/4, so weighted tf and weighted doc length
  are exact quarter-integers: sums are order-independent in int64 → every
  aggregate below is deterministic under any partitioning;
- ``tf_w(t,d) = Σ_f w_f · tf_{t,d,f}``; ``dl_w(d) = Σ_f w_f · len_f(d)``
  stored as float32 alongside each posting (doc-length quantization is part
  of the contract);
- ``avgdl = (Σ_d 4·dl_w(d)) / 4 / N`` with the numerator an int64 sum;
- ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``;
- ``score(d,q) = Σ_t idf·tf_w·(k1+1)/(tf_w + k1·(1-b+b·dl_w/avgdl))``
  accumulated term-at-a-time in query-expansion order (single terms in query
  order, then bigram boost terms in order, weighted by ``bigram_weight``);
- ties: (score desc, docId asc), mirroring ``Msg3a.cpp:790-794``.
"""

from __future__ import annotations

import numpy as np


def idf(df: float, n_docs: float) -> np.float64:
    return np.float64(np.log1p((n_docs - df + 0.5) / (df + 0.5)))


def term_scores(tf_w: np.ndarray, dl_w: np.ndarray, avgdl: float,
                k1: float, b: float, idf_val: float) -> np.ndarray:
    """Vectorized per-posting BM25 contribution of one term (float64)."""
    tf = tf_w.astype(np.float64)
    dl = dl_w.astype(np.float64)
    denom = tf + np.float64(k1) * (np.float64(1.0 - b) +
                                   np.float64(b) * dl / np.float64(avgdl))
    return np.float64(idf_val) * tf * np.float64(k1 + 1.0) / denom


def max_block_impact(tf_w: np.ndarray, dl_w: np.ndarray, avgdl: float,
                     k1: float, b: float, block_size: int) -> np.ndarray:
    """Per-block max of the idf-less score factor, rounded up one ulp so the
    stored float32 bound stays admissible (block-max WAND metadata; the
    analogue of ``getMaxPossibleScore`` ``PosdbTable.cpp:4102-4264``)."""
    s = term_scores(tf_w, dl_w, avgdl, k1, b, 1.0)
    n = len(s)
    nblocks = (n + block_size - 1) // block_size
    pad = nblocks * block_size - n
    if pad:
        s = np.concatenate([s, np.full(pad, -np.inf)])
    bm = s.reshape(nblocks, block_size).max(axis=1)
    bm32 = bm.astype(np.float32)
    low = bm32.astype(np.float64) < bm
    bm32[low] = np.nextafter(bm32[low], np.float32(np.inf))
    return bm32


def topk_merge(doc_ids: np.ndarray, scores: np.ndarray, k: int):
    """Exact top-k by (score desc, doc_id asc) → (doc_ids, scores)."""
    if len(doc_ids) == 0 or k <= 0:
        return doc_ids[:0], scores[:0]
    if len(doc_ids) > 4 * k:
        # O(n) argpartition pre-select, then the tie-exact lexsort runs
        # over only the k-th-score-and-above subset (score ties at the
        # boundary are all kept, so (score desc, doc_id asc) order is
        # unchanged — degenerates to the full sort only under total ties)
        kk = min(k, len(scores))
        part = np.argpartition(-scores, kk - 1)[:kk]
        thresh = scores[part].min()
        keep = scores >= thresh
        doc_ids, scores = doc_ids[keep], scores[keep]
    # lexsort: last key is primary
    order = np.lexsort((doc_ids, -scores))
    sel = order[:k]
    return doc_ids[sel], scores[sel]
