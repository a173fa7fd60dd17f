"""Tokenizer with the reference engine's word-splitting semantics.

Replicates ``Words.cpp:169-358`` (``addWords``) behaviorally:

- a *word* is a maximal run of word characters (letters/digits, underscore is
  punctuation);
- ``C++`` / ``c#`` / ``A+`` exceptions: a trailing ``++``, ``+`` or ``#``
  followed by a non-alnum is part of the word (``Words.cpp:285-293``);
- digit-group commas: a 1-3 digit word continues over ``,ddd`` groups
  (``1,000``; ``Words.cpp:295-310``);
- decimal point: ``d.d`` keeps the dot and following digits (``3.14``;
  ``Words.cpp:312-320``);
- one apostrophe may join two alnum runs (``we're``, ``dave's``;
  ``Words.cpp:324-329``), after which the extension rules re-apply;
- non-Latin script changes break words; ideographic / hiragana / thai
  characters are single-character words (``Words.cpp:243-283``; Latin is
  folded into Common so accented chars don't break words);
- wordId = ``hash64Lower_utf8(word)`` (``Words.cpp:339-341``).

Two-word phrase ("bigram") ids replicate ``Phrases.cpp:109-263``:

- the bigram of word *i* is the continued hash of the next alnum word *j*
  (``hash64Lower_utf8_cont`` starting at byte offset ``len(word_i)``,
  ``Phrases.cpp:193-198``), searched at most 32 words ahead
  (``Phrases.cpp:164``);
- ``hasHyphen`` iff the punct word directly after *i* contains ``-`` and
  word *i* is not numeric (``Phrases.cpp:178-181,246``);
- the id is XORed with ``0x768867`` unless the pair is hyphenated or the
  second word is not a stopword (``Phrases.cpp:253-262``; stopword =
  table hit or single alpha char, ``StopWords.cpp:168-186``).

The ASCII fast path is one compiled regex (C speed); texts containing
non-ASCII bytes take a per-character scanner with a compact script table.
Both paths are exercised against each other in tests.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from .ghash import (
    TERMID_MASK,
    PHRASE_STOPWORD_XOR,
    hash64_cont_batch,
    hash64_batch,
    lower_utf8,
)
from .stopwords import STOPWORDS

# --- ASCII fast path -------------------------------------------------------

_EXT = r"(?:\+\+(?![a-zA-Z0-9])|\+(?![a-zA-Z0-9]))?(?:\#(?![a-zA-Z0-9]))?"
_DEC = r"(?:(?<=[0-9])\.[0-9]+)?"
_CORE_NUM = r"[0-9]{1,3}(?:,[0-9]{3}(?![0-9]))+"
_CORE_GEN = r"[a-zA-Z0-9]+"
_AGAIN = rf"(?:'(?=[a-zA-Z0-9]){_CORE_GEN}{_EXT}{_DEC})?"
_ASCII_WORD = re.compile(rf"(?:{_CORE_NUM}|{_CORE_GEN}{_EXT}){_DEC}{_AGAIN}")

_NON_ASCII = re.compile(r"[^\x00-\x7f]")

# monotone position cursor (getWordPosVec, XmlDoc.cpp:20056-20142): a word
# takes the cursor then advances it by 1; the punct run before a word
# advances it by 1 (whitespace, lone hyphen), by SENT_GAP when it contains
# a sentence-ending character (the Sections sentence-boundary +SENT_UNITS
# analogue — this engine detects sentences from punctuation, having no
# HTML), else by 2 ("animal (dog)").
SENT_GAP = 30
_SENT_CHARS = frozenset(".!?")


def _gap_incr(g: str) -> int:
    if not g:
        return 0
    if _SENT_CHARS.intersection(g):
        return SENT_GAP
    if g.isspace() or g == "-":
        return 1
    return 2


# --- unicode scanner fallback ---------------------------------------------

def _script_of(cp: int) -> int:
    """Compact script classifier: 0=common (incl. Latin, Words.cpp:271-273),
    then per-block ids.  Ideographic/Hiragana/Thai get dedicated ids used for
    the single-char-word rule (Words.cpp:275-280)."""
    if cp < 0x2E80:
        return 0  # Latin / Greek-ish / Cyrillic... treated per-block below
    if 0x3040 <= cp <= 0x309F:
        return 101  # hiragana
    if 0x30A0 <= cp <= 0x30FF:
        return 3  # katakana
    if 0x3400 <= cp <= 0x9FFF or 0xF900 <= cp <= 0xFAFF or 0x20000 <= cp <= 0x2FFFF:
        return 102  # ideographic
    if 0x0E00 <= cp <= 0x0E7F:
        return 103  # thai
    if 0xAC00 <= cp <= 0xD7AF:
        return 4  # hangul
    return 5


def _script(cp: int) -> int:
    # finer split of the sub-0x2E80 range
    if cp < 0x0370:
        return 0  # ascii + latin-1 + latin extended + combining (common)
    if cp < 0x0400:
        return 10  # greek
    if cp < 0x0530:
        return 11  # cyrillic
    if cp < 0x0600:
        return 12  # armenian/hebrew
    if cp < 0x0700:
        return 13  # arabic
    if cp < 0x0980:
        return 14  # devanagari etc.
    return _script_of(cp)


_SINGLE_CHAR_SCRIPTS = {101, 102, 103}


def _is_word_char(ch: str) -> bool:
    return ch.isalnum() and ch != "_"


def _scan_unicode(text: str):
    """Scanner path for non-ASCII text.  Returns (tokens, hyphen_after,
    word_index, mono_pos) where word_index counts words including punct
    runs (for the 32-word bigram window, Phrases.cpp:164) and mono_pos is
    the monotone position cursor (getWordPosVec analogue)."""
    tokens: list[str] = []
    hyphen_after: list[bool] = []
    windex: list[int] = []
    mono: list[int] = []
    dist = 0
    n = len(text)
    i = 0
    widx = 0  # index in the full word array (alnum + punct words)
    while i < n:
        if not _is_word_char(text[i]):
            # punct word: run of non-word chars
            start = i
            while i < n and not _is_word_char(text[i]):
                i += 1
            if tokens and windex[-1] == widx - 1:
                # punct word directly after the last alnum word
                hyphen_after[-1] = "-" in text[start:i]
            dist += _gap_incr(text[start:i])
            widx += 1
            continue
        # alnum word.  oldScript starts as the script of the first char when
        # it is non-ASCII (Words.cpp:221 sets it in the punct lookahead);
        # ASCII alnum chars do not update it (Words.cpp:245-247).
        j = i
        had_apostrophe = False
        cp0 = ord(text[j])
        old_script = _script(cp0) if cp0 >= 128 else 0
        while True:
            while i < n:
                ch = text[i]
                cp = ord(ch)
                if cp < 128:
                    if ch.isalnum() and ch != "_":
                        i += 1
                        continue
                    break
                if not _is_word_char(ch):
                    break
                sc = _script(cp)
                saved = old_script
                old_script = sc
                if sc in _SINGLE_CHAR_SCRIPTS:
                    i += 1  # include it, then stop (Words.cpp:275-280)
                    break
                if saved != sc:
                    break  # script change ends the word (Words.cpp:282)
                i += 1
            # extensions (ASCII rules, Words.cpp:285-329)
            if i < n and text[i] == "+":
                if text[i:i + 2] == "++" and (i + 2 >= n or not _is_word_char(text[i + 2])):
                    i += 2
                elif i + 1 >= n or not _is_word_char(text[i + 1]):
                    i += 1
            if i < n and text[i] == "#" and (i + 1 >= n or not _is_word_char(text[i + 1])):
                i += 1
            if (i < n and text[i] == "," and 1 <= i - j <= 3
                    and text[j:i].isdigit()):
                # a group is EXACTLY 3 digits (Words.cpp:295-310) — the
                # len check matters at end-of-string where a short slice
                # like "0" would still pass .isdigit()
                while (text[i:i + 1] == ","
                       and len(text[i + 1:i + 4]) == 3
                       and text[i + 1:i + 4].isdigit()
                       and not text[i + 4:i + 5].isdigit()):
                    i += 4
            if (i < n and text[i] == "." and i > j and text[i - 1].isdigit()
                    and i + 1 < n and text[i + 1].isdigit()):
                i += 1
                while i < n and text[i].isdigit():
                    i += 1
            if (not had_apostrophe and i < n and text[i] == "'"
                    and i + 1 < n and _is_word_char(text[i + 1])):
                had_apostrophe = True
                i += 1
                continue
            break
        tokens.append(text[j:i])
        hyphen_after.append(False)
        windex.append(widx)
        mono.append(dist)
        dist += 1
        widx += 1
        # a single-char-script word may be followed directly by another word
    if hyphen_after:
        # trailing punct has no following token: normalize so both paths
        # (regex / scanner) return identical flags
        hyphen_after[-1] = False
    return tokens, hyphen_after, windex, mono


def tokenize_pos(text: str):
    """Tokenize one text → (alnum tokens, hyphen_after flags, word
    indices, monotone positions).

    ``hyphen_after[t]`` is True iff the punct run between token ``t`` and
    ``t+1`` directly follows token ``t`` and contains a hyphen.
    ``word_index[t]`` is the token's index in the full alternating
    alnum/punct word sequence (bounded bigram window check).
    ``mono_pos[t]`` is the getWordPosVec-analogue cursor position (word
    +1, whitespace/hyphen gap +1, other punct +2, sentence punct
    +SENT_GAP) used when ``IndexConfig.position_mode == "monotone"``.
    """
    if not text:
        return [], [], [], []
    if _NON_ASCII.search(text) is None:
        tokens: list[str] = []
        hyphen_after: list[bool] = []
        windex: list[int] = []
        mono: list[int] = []
        dist = 0
        widx = 0
        last_end = 0
        for m in _ASCII_WORD.finditer(text):
            s, e = m.span()
            if s > last_end:
                # exactly one punct word between ASCII alnum words
                if tokens:
                    hyphen_after[-1] = "-" in text[last_end:s]
                dist += _gap_incr(text[last_end:s])
                widx += 1
            tokens.append(m.group())
            hyphen_after.append(False)
            windex.append(widx)
            mono.append(dist)
            dist += 1
            widx += 1
            last_end = e
        return tokens, hyphen_after, windex, mono
    return _scan_unicode(text)


def tokenize(text: str) -> tuple[list[str], list[bool], list[int]]:
    """3-tuple view of :func:`tokenize_pos` (tokens, hyphen_after,
    word indices) for callers that don't need positions."""
    toks, hyph, widx, _ = tokenize_pos(text)
    return toks, hyph, widx


# --- batch term extraction -------------------------------------------------

@dataclass
class TurnTerms:
    """Terms of one tokenized text: parallel arrays."""
    term_ids: np.ndarray      # uint64, 48-bit masked
    positions: np.ndarray     # int32 ordinal of the (first) word
    is_bigram: np.ndarray     # bool


class TokenHashCache:
    """token string → wordId memo; Zipf-heavy corpora hit >99%."""

    def __init__(self, cap: int = 1 << 20):
        self._map: dict[str, int] = {}
        self._cap = cap

    def lookup(self, tokens: list[str]) -> np.ndarray:
        out = np.empty(len(tokens), dtype=np.uint64)
        miss_idx: list[int] = []
        miss_tok: list[str] = []
        mp = self._map
        for i, t in enumerate(tokens):
            w = mp.get(t)
            if w is None:
                miss_idx.append(i)
                miss_tok.append(t)
            else:
                out[i] = w
        if miss_tok:
            hashed = hash64_batch([lower_utf8(t) for t in miss_tok])
            if len(mp) + len(miss_tok) > self._cap:
                mp.clear()
            for i, t, h in zip(miss_idx, miss_tok, hashed):
                out[i] = h
                mp[t] = int(h)
        return out


def fragment_mask(wids: np.ndarray, row_ids: np.ndarray,
                  n: int) -> np.ndarray:
    """Repeated-fragment suppression mask (``getFragVec`` analogue,
    ``XmlDoc.cpp:20286-20304``: the reference rolls a 5-word XOR hash over
    the document and demotes any ≥5-word sequence already seen).

    Token ``t`` is masked (True) iff it is covered by an ``n``-word window,
    contained in a single row (turn), whose word-id sequence already
    occurred at an earlier window start of the SAME row.  The first
    occurrence of a fragment keeps full weight; later copies are
    suppressed entirely.  Window identity uses an order-sensitive
    polynomial key over the 64-bit word ids (collisions ~ windows²/2⁶⁴,
    and the oracle shares this exact function, so engine/oracle identity
    holds regardless).  Fully vectorized: no per-token Python.
    """
    m = len(wids)
    out = np.zeros(m, dtype=bool)
    if n <= 0 or m < n:
        return out
    nwin = m - n + 1
    # window start s is valid iff tokens s..s+n-1 share a row
    valid = row_ids[:nwin] == row_ids[n - 1:]
    key = np.zeros(nwin, dtype=np.uint64)
    C = np.uint64(0x9E3779B97F4A7C15)
    for j in range(n):
        key = key * C + wids[j:nwin + j]
    starts = np.flatnonzero(valid)
    if len(starts) == 0:
        return out
    rk = row_ids[starts]
    kk = key[starts]
    order = np.lexsort((starts, kk, rk))
    rs, ks, ss = rk[order], kk[order], starts[order]
    first = np.empty(len(ss), dtype=bool)
    first[0] = True
    first[1:] = (rs[1:] != rs[:-1]) | (ks[1:] != ks[:-1])
    rep_starts = ss[~first]
    if len(rep_starts) == 0:
        return out
    # coverage of all repeated windows via a difference array
    delta = np.zeros(m + 1, dtype=np.int64)
    np.add.at(delta, rep_starts, 1)
    np.add.at(delta, rep_starts + n, -1)
    return np.cumsum(delta[:m]) > 0


def terms_for_texts(texts: list[str], cache: TokenHashCache,
                    index_bigrams: bool = True,
                    term_mask: bool = True,
                    fragment_suppress: int = 0,
                    position_mode: str = "ordinal"):
    """Tokenize many texts and compute term ids + bigram ids, vectorized.

    Returns (row_ids, term_ids, positions, is_bigram) flat numpy arrays,
    where ``row_ids[i]`` is the index of the source text.  Positions are
    token ordinals within each text (punct words carry no position) in
    the default ``"ordinal"`` mode, or the getWordPosVec-analogue cursor
    positions in ``"monotone"`` mode (sentence +SENT_GAP, punct +2 —
    the reference's intra-document position-distance semantics,
    ``XmlDoc.cpp:20056-20142``).
    """
    all_tokens: list[str] = []
    row_of: list[int] = []
    offsets = [0]
    hyph_all: list[bool] = []
    widx_all: list[int] = []
    mono_all: list[int] = []
    for r, text in enumerate(texts):
        toks, hyph, widx, mono = tokenize_pos(text)
        all_tokens.extend(toks)
        hyph_all.extend(hyph)
        widx_all.extend(widx)
        mono_all.extend(mono)
        row_of.extend([r] * len(toks))
        offsets.append(len(all_tokens))
    n = len(all_tokens)
    row_ids = np.asarray(row_of, dtype=np.int64)
    offs = np.asarray(offsets, dtype=np.int64)
    if position_mode == "monotone":
        positions = np.asarray(mono_all, dtype=np.int32)
    else:
        # ordinal position within each text
        positions = (np.arange(n, dtype=np.int64) -
                     np.repeat(offs[:-1], np.diff(offs))).astype(np.int32)
    wids = cache.lookup(all_tokens)
    term = (wids & TERMID_MASK) if term_mask else wids

    # repeated-fragment suppression: masked tokens index nothing (no
    # unigram posting, no bigram on either side) and are excluded from
    # the word counts the callers derive from the returned rows
    sup = (fragment_mask(wids, row_ids, fragment_suppress)
           if fragment_suppress > 0 else None)
    keep = None if sup is None else np.flatnonzero(~sup)

    if not index_bigrams or n == 0:
        if keep is not None:
            return (row_ids[keep], term[keep], positions[keep],
                    np.zeros(len(keep), dtype=bool))
        return (row_ids, term, positions,
                np.zeros(n, dtype=bool))

    # bigram candidates: token t and t+1 in the same row, within the
    # 32-word window (Phrases.cpp:164: j <= i+32)
    same_row = row_ids[:-1] == row_ids[1:] if n > 1 else np.zeros(0, dtype=bool)
    widx_arr = np.asarray(widx_all, dtype=np.int64)
    window_ok = (widx_arr[1:] - widx_arr[:-1] <= 32) if n > 1 else same_row
    pair_ok = same_row & window_ok
    if sup is not None and n > 1:
        pair_ok &= ~sup[:-1] & ~sup[1:]
    cand = np.flatnonzero(pair_ok)
    if len(cand) == 0:
        if keep is not None:
            return (row_ids[keep], term[keep], positions[keep],
                    np.zeros(len(keep), dtype=bool))
        return row_ids, term, positions, np.zeros(n, dtype=bool)

    next_tok_bytes = [lower_utf8(all_tokens[i + 1]) for i in cand]
    contis = np.fromiter((len(all_tokens[i].encode("utf-8")) for i in cand),
                         dtype=np.int64, count=len(cand))
    h2 = hash64_cont_batch(next_tok_bytes, wids[cand], contis)
    # stopword XOR rule (Phrases.cpp:246-262)
    hyph_arr = np.asarray(hyph_all, dtype=bool)
    is_num = np.fromiter((all_tokens[i][0].isdigit() for i in cand),
                         dtype=bool, count=len(cand))
    has_hyphen = hyph_arr[cand] & ~is_num
    stop2 = np.fromiter(
        ((all_tokens[i + 1].lower() in STOPWORDS) or
         (len(all_tokens[i + 1]) == 1 and all_tokens[i + 1].isalpha())
         for i in cand), dtype=bool, count=len(cand))
    xor_mask = ~has_hyphen & stop2
    h2 = np.where(xor_mask, h2 ^ PHRASE_STOPWORD_XOR, h2)
    bigram_term = (h2 & TERMID_MASK) if term_mask else h2

    if keep is None:
        u_row, u_term, u_pos = row_ids, term, positions
    else:
        u_row, u_term, u_pos = row_ids[keep], term[keep], positions[keep]
    out_row = np.concatenate([u_row, row_ids[cand]])
    out_term = np.concatenate([u_term, bigram_term])
    out_pos = np.concatenate([u_pos, positions[cand]])
    out_big = np.concatenate([np.zeros(len(u_row), dtype=bool),
                              np.ones(len(cand), dtype=bool)])
    return out_row, out_term, out_pos, out_big


# --- simplified SQL-parity tokenizer --------------------------------------

_SIMPLE_RE = re.compile(r"[a-z0-9]+")


def tokenize_simple(text: str) -> list[str]:
    """Lowercase ``[a-z0-9]+`` tokenizer, exactly replicable in ANSI SQL
    (``regexp_split`` in the DuckDB oracle).  Used by the SQL-checked
    document-search pipelines; the full tokenizer above is covered by unit
    goldens and the pytest oracle instead."""
    return _SIMPLE_RE.findall(text.lower())
