"""Pinned hash/tokenizer goldens (FIXTURES.md §3 golden_tokens /
golden_postings): regression anchors so any accidental change to the
hashing or tokenization contract fails loudly — termIds define index
identity (``SURVEY.md`` §7.5 hard part #1)."""

import numpy as np
import pyarrow as pa

from open_source_search_engine_ray.functions.ghash import (
    TERMID_MASK, doc_id_for_conv, hash64_lower_utf8)
from open_source_search_engine_ray.functions.tokenizer import (
    TokenHashCache, terms_for_texts)

# (token, hash64Lower_utf8, termId) — computed once from the verified
# glibc-rand table, pinned forever
GOLDEN_WORD_IDS = [
    ("the", 297427748605399427, 190173198946691),
    ("w0042", 13004773059611817057, 66185626088545),
    ("cdrom", 1750302235397337179, 90830210478171),
    ("café", 11110975347448049763, 32116771614819),
    ("we're", 15748438787388270398, 195315403777854),
    ("c++", 14037569479522935247, 130915985809871),
    ("1,000", 9155164114417072398, 190496902985998),
    ("hello", 11716599326945049354, 203421363993354),
]

GOLDEN_DOC_IDS = [
    ("conv-00000000", 786185004971996227),
    ("conv-00000042", 2177045036047658972),
]


def test_pinned_word_hashes():
    for tok, h, tid in GOLDEN_WORD_IDS:
        assert hash64_lower_utf8(tok) == h, tok
        assert int(np.uint64(h) & TERMID_MASK) == tid, tok


def test_pinned_doc_ids():
    for conv, d in GOLDEN_DOC_IDS:
        assert doc_id_for_conv(conv) == d, conv


def test_golden_tokens_table():
    """FIXTURES §3 golden_tokens: the edge-case inventory round-trips
    through the batch path with the pinned ids."""
    cache = TokenHashCache()
    rows, term, pos, is_big = terms_for_texts(
        ["the w0042 cd-rom café we're C++ 1,000 hello"], cache)
    singles = term[~is_big]
    expect = [190173198946691, 66185626088545,
              # cd-rom tokenizes as cd + rom (two singles)
              None, None,
              32116771614819, 195315403777854, 130915985809871,
              190496902985998, 203421363993354]
    got = [int(x) for x in singles]
    assert got[0] == expect[0]
    assert got[1] == expect[1]
    assert got[4:] == expect[4:]
    # bigram "cd rom" (hyphenated) == wordId("cdrom") masked
    assert 90830210478171 in [int(x) for x in term[is_big]]


def test_golden_postings_roundtrip():
    """FIXTURES §3 golden_postings: segment-encoded posting lists decode
    back to the oracle's lists for a sample of terms."""
    from open_source_search_engine_ray.config import IndexConfig
    from open_source_search_engine_ray.index.segments import (
        decode_posting_row, encode_shard)

    rng = np.random.default_rng(7)
    n = 5000
    ref_rows: dict[int, dict[int, int]] = {}
    term = np.sort(rng.integers(0, 50, n).astype(np.uint64))
    doc = rng.integers(0, 1 << 62, n).astype(np.uint64)
    field = rng.integers(0, 4, n).astype(np.uint8)
    tf = rng.integers(1, 5, n).astype(np.int32)
    pos = pa.ListArray.from_arrays(
        pa.array(np.arange(n + 1, dtype=np.int32)),
        pa.array(rng.integers(0, 100000, n).astype(np.int32)))
    tbl = pa.table({
        "term_id": pa.array(term), "doc_id": pa.array(doc),
        "field": pa.array(field, pa.uint8()), "tf": pa.array(tf),
        "positions": pos,
        "dl": pa.array(rng.uniform(5, 500, n).astype(np.float32)),
    })
    cfg = IndexConfig()
    seg = encode_shard(tbl, cfg, 0, 100.0)
    # decode every term and compare against a dict-built reference
    ref: dict[int, dict[int, int]] = {}
    for i in range(n):
        ref.setdefault(int(term[i]), {}).setdefault(int(doc[i]), 0)
        ref[int(term[i])][int(doc[i])] += int(tf[i])
        ref_rows.setdefault(int(term[i]), {}).setdefault(int(doc[i]), 0)
        ref_rows[int(term[i])][int(doc[i])] += 1  # one position per row
    assert seg.num_rows == len(ref)
    for row in seg.to_pylist():
        d = decode_posting_row(row, with_positions=True)
        t = int(row["term_id"])
        assert sorted(ref[t]) == [int(x) for x in d["doc_ids"]]
        assert [ref[t][int(x)] for x in d["doc_ids"]] == \
            d["tfs"].sum(axis=1).tolist()
        flat, offsets = d["positions"]
        assert len(offsets) == len(d["doc_ids"]) + 1
        assert len(flat) == offsets[-1]
        # per-doc position count == number of merged source rows (each
        # synthetic row carried exactly one position)
        assert np.diff(offsets).tolist() == \
            [ref_rows[t][int(x)] for x in d["doc_ids"]]
        # positions ascending within each doc
        deltas_ok = np.ones(len(flat), dtype=bool)
        inner = np.ones(len(flat), dtype=bool)
        inner[offsets[:-1][np.diff(offsets) > 0]] = False
        if len(flat) > 1:
            deltas_ok[1:] = (flat[1:] >= flat[:-1]) | ~inner[1:]
        assert deltas_ok.all()
