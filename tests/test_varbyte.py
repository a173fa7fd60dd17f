"""Round-trip goldens for the delta+varbyte posting codec (the analogue of
the reference's posting-merge goldens ``test/unit/RdbListTest.cpp:60-345``)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from open_source_search_engine_ray.functions import varbyte


def test_empty():
    assert varbyte.encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte.decode(b"").tolist() == []
    assert varbyte.encode_deltas(np.array([], dtype=np.uint64)) == b""


def test_known_values():
    v = np.array([0, 1, 127, 128, 300, 2**32, 2**63 - 1], dtype=np.uint64)
    assert varbyte.decode(varbyte.encode(v)).tolist() == v.tolist()
    # 127 → 1 byte, 128 → 2 bytes
    assert len(varbyte.encode(np.array([127], dtype=np.uint64))) == 1
    assert len(varbyte.encode(np.array([128], dtype=np.uint64))) == 2


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert varbyte.decode(varbyte.encode(v)).tolist() == vals


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=200, unique=True))
def test_delta_roundtrip(vals):
    v = np.array(sorted(vals), dtype=np.uint64)
    assert varbyte.decode_deltas(varbyte.encode_deltas(v)).tolist() == v.tolist()


def test_nested_roundtrip():
    lists = [np.array([1, 5, 9], dtype=np.uint64),
             np.array([], dtype=np.uint64),
             np.array([100], dtype=np.uint64),
             np.array([0, 2, 4, 6], dtype=np.uint64)]
    blob = varbyte.encode_nested(lists)
    out = varbyte.decode_nested(blob, len(lists))
    assert [o.tolist() for o in out] == [l.tolist() for l in lists]


def test_compression_ratio():
    # dense doc ids: gaps ≈ small → ~1-2 bytes/posting vs 8 raw
    docs = np.cumsum(np.random.default_rng(0).integers(1, 30, 10_000)).astype(np.uint64)
    blob = varbyte.encode_deltas(docs)
    assert len(blob) < 2 * len(docs)
