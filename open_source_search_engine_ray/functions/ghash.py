"""Zobrist-style position-dependent 64-bit hashing, bit-compatible with the
reference engine's ``hash.h`` / ``g_hashtab.inc``.

The reference hashes a byte string by XOR-ing, for each byte position ``i``,
a table entry ``g_hashtab[i & 0xff][byte]`` (``hash.h:55-64``).  The table
itself was generated once with glibc ``srand(1945687)`` + ``rand()``
(``hash.cpp:33-74``, the ``#if 0``-ed generator) and shipped as
``g_hashtab.inc``.  glibc's ``random()`` is the public TYPE_3 additive
lagged-Fibonacci generator (glibc ``stdlib/random_r.c``):

    r[0]    = seed
    r[i]    = 16807 * r[i-1] mod 2147483647          (1 <= i < 31)
    r[i]    = r[i-31]                                 (31 <= i < 34)
    r[i]    = (r[i-3] + r[i-31]) mod 2^32             (i >= 34)
    output  = r[i] >> 1   for i >= 344  (first 310 outputs discarded)

We regenerate the identical table from that recurrence (no table data is
copied from the reference) and verify the anchor value
``g_hashtab[0][0] == 6720717044602784129`` asserted at ``hash.cpp:70``.

All batch entry points are numpy-vectorized: tokens are hashed as a padded
(n, L) byte matrix with one XOR-reduction over columns, not a Python loop
per token.
"""

from __future__ import annotations

import os

import numpy as np

# reference termid_mask.h:4 — termIds are the low 48 bits of the 64-bit hash
TERMID_MASK = np.uint64(0x0000FFFFFFFFFFFF)

# docIds keep 63 bits of hash64b(conv_id): the reference's 38-bit docId
# space (Titledb.h:8-11) cannot address ~10^11 conversations; 63 (not 64)
# bits so docIds stay int64-representable through Arrow/Parquet/DuckDB
# aggregation paths, which are signed.
DOCID_MASK = np.uint64(0x7FFFFFFFFFFFFFFF)

# reference Phrases.cpp:260 — two-word phrase id is XORed with this when the
# second word is a stopword and the pair is not hyphenated
PHRASE_STOPWORD_XOR = np.uint64(0x768867)

_SEED = 1945687
_ANCHOR = 6720717044602784129  # hash.cpp:70


def _glibc_rand_outputs(seed: int, n: int) -> np.ndarray:
    """First ``n`` outputs of glibc ``rand()`` after ``srand(seed)``."""
    # 34 seeded entries + 310 discarded outputs + n usable outputs
    total = 34 + 310 + n
    r = np.zeros(total, dtype=np.uint64)
    r[0] = seed
    v = seed
    for i in range(1, 31):
        v = (16807 * v) % 2147483647
        r[i] = v
    for i in range(31, 34):
        r[i] = r[i - 31]
    # additive recurrence; vectorize in stride-3 chunks (r[i] depends on
    # r[i-3], so lag-3 forces a short serial dimension; lag-31 is the long one)
    buf = r
    mask = np.uint64(0xFFFFFFFF)
    for i in range(34, total):
        buf[i] = (buf[i - 3] + buf[i - 31]) & mask
    return buf[344:] >> np.uint64(1)


def _generate_table() -> np.ndarray:
    """Regenerate the 256x256 uint64 table exactly as hash.cpp:33-74 did."""
    outs = _glibc_rand_outputs(_SEED, 256 * 256 * 4)
    a = outs.reshape(-1, 4).astype(np.uint64)
    v = a[:, 0].copy()
    v |= np.where(a[:, 1] > (0x7FFFFFFF // 2), np.uint64(0x80000000), np.uint64(0))
    v <<= np.uint64(32)
    v |= a[:, 2]
    v |= np.where(a[:, 3] > (0x7FFFFFFF // 2), np.uint64(0x80000000), np.uint64(0))
    tab = v.reshape(256, 256)
    if int(tab[0, 0]) != _ANCHOR:
        raise RuntimeError("g_hashtab regeneration failed anchor check")
    return tab


_CACHE_PATH = os.path.join(os.path.dirname(__file__), "_g_hashtab.npy")


def _load_table() -> np.ndarray:
    if os.path.exists(_CACHE_PATH):
        tab = np.load(_CACHE_PATH)
        if tab.shape == (256, 256) and int(tab[0, 0]) == _ANCHOR:
            return tab
    tab = _generate_table()
    try:  # cache for fast worker imports; best-effort
        tmp = _CACHE_PATH + ".tmp.%d" % os.getpid()
        np.save(tmp, tab)            # np.save appends ".npy"
        os.replace(tmp + ".npy", _CACHE_PATH)
    except OSError:
        pass
    return tab


G_HASHTAB = _load_table()

# Extended table with a 257th column of zeros: column index 256 is the
# padding byte for vectorized fixed-width hashing (XOR with 0 is identity).
_TAB_EXT = np.concatenate([G_HASHTAB, np.zeros((256, 1), dtype=np.uint64)], axis=1)
_PAD = 256


# ---------------------------------------------------------------------------
# scalar reference implementations (used by tests and the query parser)
# ---------------------------------------------------------------------------

def hash64(data: bytes, start: int = 0) -> int:
    """reference hash.h:55-64 (``hash64(s, len, startHash)``)."""
    h = np.uint64(start)
    for i, b in enumerate(data):
        h ^= G_HASHTAB[i & 0xFF, b]
    return int(h)


def hash64_cont(data: bytes, start: int, conti: int) -> tuple[int, int]:
    """reference hash.h:66-77 — continue hashing at byte position ``conti``."""
    h = np.uint64(start)
    for i, b in enumerate(data):
        h ^= G_HASHTAB[(i + conti) & 0xFF, b]
    return int(h), conti + len(data)


def hash64_pair(h1: int, h2: int) -> int:
    """reference hash.h:86-109 — combine two 64-bit hashes (fields etc.)."""
    b1 = int(h1).to_bytes(8, "little")
    b2 = int(h2).to_bytes(8, "little")
    h = np.uint64(0)
    for i in range(8):
        h ^= G_HASHTAB[i, b1[i]]
        h ^= G_HASHTAB[8 + i, b2[i]]
    return int(h)


def lower_utf8(token: str) -> bytes:
    """Lowercase per codepoint (UnicodeMaps::to_lower analogue) and encode.

    The reference lowers codepoint-by-codepoint (hash.h:125-181).  Python's
    per-character ``str.lower()`` matches for the practical range; characters
    whose lowercase expands to multiple codepoints are kept as-is (the
    reference emits a single codepoint or the original bytes).
    """
    out = []
    for ch in token:
        lo = ch.lower()
        out.append(lo if len(lo) == 1 else ch)
    return "".join(out).encode("utf-8")


def hash64_lower_utf8(token: str, start: int = 0) -> int:
    """reference hash.h:125-181 — hash of the UTF-8 lowercased token."""
    return hash64(lower_utf8(token), start)


def hash64_lower_utf8_cont(token: str, start: int, conti: int) -> tuple[int, int]:
    """reference hash.h:234-293 — continuation variant for phrase ids."""
    return hash64_cont(lower_utf8(token), start, conti)


# ---------------------------------------------------------------------------
# vectorized batch implementations (the hot path)
# ---------------------------------------------------------------------------

def _byte_matrix(bufs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pack a list of byte strings into a (n, L) uint16 matrix padded with
    column-index ``_PAD`` (which XORs zero), plus the per-row lengths."""
    n = len(bufs)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    if n == 0:
        return np.zeros((0, 0), dtype=np.uint16), lens
    L = max(1, int(lens.max()))
    arr = np.full((n, L), _PAD, dtype=np.uint16)
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    mask = np.arange(L)[None, :] < lens[:, None]
    arr[mask] = flat  # row-major fill order == concatenation order
    return arr, lens


def hash64_batch(bufs: list[bytes], starts: np.ndarray | None = None) -> np.ndarray:
    """Vectorized ``hash64`` over many byte strings → uint64 array."""
    arr, _ = _byte_matrix(bufs)
    n, L = arr.shape
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    cols = (np.arange(L) & 0xFF).astype(np.intp)
    contrib = _TAB_EXT[cols[None, :], arr]  # (n, L) uint64
    h = np.bitwise_xor.reduce(contrib, axis=1)
    if starts is not None:
        h ^= starts.astype(np.uint64)
    return h


def hash64_cont_batch(bufs: list[bytes], starts: np.ndarray,
                      contis: np.ndarray) -> np.ndarray:
    """Vectorized ``hash64_cont``: per-row starting byte position."""
    arr, _ = _byte_matrix(bufs)
    n, L = arr.shape
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    cols = ((np.arange(L)[None, :] + contis[:, None]) & 0xFF).astype(np.intp)
    contrib = _TAB_EXT[cols, arr]
    h = np.bitwise_xor.reduce(contrib, axis=1)
    return h ^ starts.astype(np.uint64)


def hash64_pair_batch(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Vectorized ``hash64_pair`` over aligned uint64 arrays."""
    n = len(h1)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    b1 = np.ascontiguousarray(h1, dtype="<u8").view(np.uint8).reshape(n, 8)
    b2 = np.ascontiguousarray(h2, dtype="<u8").view(np.uint8).reshape(n, 8)
    rows = np.arange(8, dtype=np.intp)
    c1 = G_HASHTAB[rows[None, :], b1]
    c2 = G_HASHTAB[(rows + 8)[None, :], b2]
    return np.bitwise_xor.reduce(c1, axis=1) ^ np.bitwise_xor.reduce(c2, axis=1)


def hash_tokens_lower(tokens: list[str]) -> np.ndarray:
    """wordId of each token: ``hash64Lower_utf8`` (Words.cpp:339-341)."""
    return hash64_batch([lower_utf8(t) for t in tokens])


def term_ids(word_ids: np.ndarray) -> np.ndarray:
    """termId = wordId & TERMID_MASK (Query.cpp:622, termid_mask.h:4)."""
    return word_ids & TERMID_MASK


def doc_id_for_conv(conv_id: str) -> int:
    """docId of a conversation: 63-bit masked ``hash64b(conv_id)``.

    The reference derives a 38-bit docId from the URL hash (Titledb.h:54-78);
    38 bits cannot address a 10^12-turn corpus (~10^11 conversations), so this
    engine keeps 63 bits of the same hash function (hash.h:45-53 hash64b ==
    hash64 over the NUL-terminated bytes; see DOCID_MASK).  Collision policy:
    expected birthday collisions at 10^11 docs ≈ 0.5; a collision merges two
    conversations into one docId and is accepted (the reference instead
    relocates docIds via Msg22).
    """
    return int(np.uint64(hash64(conv_id.encode("utf-8"))) & DOCID_MASK)


def doc_ids_for_convs(conv_ids) -> np.ndarray:
    """Vectorized ``doc_id_for_conv`` over a sequence of strings."""
    return hash64_batch([c.encode("utf-8") for c in conv_ids]) & DOCID_MASK
