"""Delta + varbyte codec for posting lists, numpy-vectorized.

The reference prefix-compresses sorted 18-byte posting keys down to 12/6
bytes when the termId / termId+docId repeats (``Posdb.h:230-235``,
``RdbList.h:35-39`` — "35% of indexdb can be cut").  The standard columnar
equivalent is: sort postings by docId, delta-encode the docId gaps, and
varbyte-encode the gaps — which is what this module implements (LEB128-style
7-bit groups, little-endian, high bit = continuation).

Both encode and decode avoid per-value Python loops: encode computes output
offsets with cumulative sums and scatters the 7-bit groups; decode finds
value boundaries from the continuation-bit mask and combines groups with a
segmented shift-accumulate (max 10 groups for 64-bit values → bounded loop
over *group index*, not over values).
"""

from __future__ import annotations

import numpy as np


def encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a non-negative integer array (uint64-safe)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(n, dtype=np.int64)
    tmp = v.copy()
    # bit length via float log is unsafe for 64-bit; use iterative shift
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nz = tmp > 0
        nbytes[nz] += 1
        tmp = tmp >> np.uint64(7)
    del nbits
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offs[1:])
    total = int(offs[-1])
    out = np.zeros(total, dtype=np.uint8)
    # scatter each 7-bit group g of every value
    max_groups = int(nbytes.max())
    idx_base = offs[:-1]
    for g in range(max_groups):
        sel = nbytes > g
        if not sel.any():
            break
        grp = ((v[sel] >> np.uint64(7 * g)) & np.uint64(0x7F)).astype(np.uint8)
        pos = idx_base[sel] + g
        last = (nbytes[sel] - 1) == g
        out[pos] = np.where(last, grp, grp | np.uint8(0x80))
    return out.tobytes()


def decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a varbyte buffer → uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) \
        else np.asarray(buf, dtype=np.uint8)
    if len(raw) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)            # index of last byte per value
    n = len(ends)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    out = np.zeros(n, dtype=np.uint64)
    max_groups = int(lens.max())
    payload = (raw & 0x7F).astype(np.uint64)
    for g in range(max_groups):
        sel = lens > g
        out[sel] |= payload[starts[sel] + g] << np.uint64(7 * g)
    return out


def encode_lengths(values: np.ndarray) -> np.ndarray:
    """Varbyte-encoded byte length per value (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes[tmp > 0] += 1
        tmp = tmp >> np.uint64(7)
    return nbytes


def encode_segmented(values: np.ndarray,
                     seg_starts: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode one flat value array and return (blob, byte offset of each
    segment boundary).  ``seg_starts`` are value indices (ascending,
    starting at 0); the returned offsets have len(seg_starts)+1 entries so
    segment *i* is ``blob[off[i]:off[i+1]]``.  Equivalent to calling
    :func:`encode` per segment but with no per-segment Python overhead."""
    blob = encode(values)
    lens = encode_lengths(values) if len(values) else np.zeros(0, np.int64)
    cum = np.concatenate([[0], np.cumsum(lens)])
    offs = np.empty(len(seg_starts) + 1, dtype=np.int64)
    offs[:-1] = cum[seg_starts]
    offs[-1] = cum[-1]
    return blob, offs


def encode_deltas(sorted_values: np.ndarray) -> bytes:
    """Delta + varbyte encode a sorted uint64 array (first value absolute)."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return encode(deltas)


def decode_deltas(buf: bytes | np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_deltas`."""
    deltas = decode(buf)
    return np.cumsum(deltas, dtype=np.uint64)


def encode_nested(lists: list[np.ndarray]) -> bytes:
    """Encode many small arrays as [count, delta-encoded values...] per list,
    concatenated — used for per-document position lists inside one posting
    blob.  Each list must be sorted ascending."""
    parts: list[np.ndarray] = []
    for arr in lists:
        a = np.ascontiguousarray(arr, dtype=np.uint64)
        item = np.empty(len(a) + 1, dtype=np.uint64)
        item[0] = len(a)
        if len(a):
            item[1] = a[0]
            np.subtract(a[1:], a[:-1], out=item[2:])
        parts.append(item)
    if not parts:
        return b""
    return encode(np.concatenate(parts))


def decode_nested(buf: bytes | np.ndarray, n_lists: int) -> list[np.ndarray]:
    """Inverse of :func:`encode_nested`."""
    flat = decode(buf)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(n_lists):
        cnt = int(flat[i])
        i += 1
        vals = np.cumsum(flat[i:i + cnt], dtype=np.uint64)
        out.append(vals)
        i += cnt
    return out
