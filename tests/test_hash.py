"""Hash-layer goldens: the regenerated table must match the reference's
``g_hashtab.inc`` anchor and the scalar/vector paths must agree."""

import numpy as np

from open_source_search_engine_ray.functions import ghash


def test_anchor_value():
    # hash.cpp:70 — the table's self-check constant
    assert int(ghash.G_HASHTAB[0, 0]) == 6720717044602784129


def test_scalar_vs_vectorized_lower():
    toks = ["Hello", "C++", "we're", "café", "1,000", "日本語", "x"]
    scalar = [ghash.hash64_lower_utf8(t) for t in toks]
    vec = ghash.hash_tokens_lower(toks)
    assert [int(v) for v in vec] == scalar


def test_cont_and_pair():
    h1 = ghash.hash64_lower_utf8("cd")
    h2_cont, conti = ghash.hash64_lower_utf8_cont("rom", h1, 2)
    # continued hash of "cd"+"rom" equals the hash of "cdrom"
    assert h2_cont == ghash.hash64_lower_utf8("cdrom")
    assert conti == 5
    p = ghash.hash64_pair(h1, h2_cont)
    pv = ghash.hash64_pair_batch(np.array([h1], dtype=np.uint64),
                                 np.array([h2_cont], dtype=np.uint64))
    assert int(pv[0]) == p


def test_case_insensitive():
    assert ghash.hash64_lower_utf8("HELLO") == ghash.hash64_lower_utf8("hello")
    assert ghash.hash64_lower_utf8("CAFÉ") == ghash.hash64_lower_utf8("café")


def test_docid_mask():
    d = ghash.doc_id_for_conv("conv-00000001")
    assert 0 <= d < 2**63
    vec = ghash.doc_ids_for_convs(["conv-00000001"])
    assert int(vec[0]) == d


def test_wrap_at_256_bytes():
    # position index wraps at 256 (hash.h:55-64 casts i to unsigned char)
    long1 = b"a" * 300
    h = ghash.hash64(long1)
    hv = ghash.hash64_batch([long1])
    assert int(hv[0]) == h
