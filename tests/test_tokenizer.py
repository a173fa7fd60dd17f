"""Tokenizer goldens (the edge-case inventory of FIXTURES.md §1, mirroring
``test/unit/WordsTest.cpp``) and bigram/phrase-id rules
(``Phrases.cpp:109-263``)."""

import string

import numpy as np
from hypothesis import given, settings, strategies as st

from open_source_search_engine_ray.functions.ghash import (
    PHRASE_STOPWORD_XOR, TERMID_MASK, hash64_lower_utf8)
from open_source_search_engine_ray.functions.tokenizer import (
    TokenHashCache, _scan_unicode, terms_for_texts, tokenize,
    tokenize_pos, tokenize_simple)


def toks(s):
    return tokenize(s)[0]


def test_goldens_apostrophe():
    assert toks("we're happy that dave's here i'm ok") == \
        ["we're", "happy", "that", "dave's", "here", "i'm", "ok"]
    assert toks("it''s 'tis") == ["it", "s", "tis"]


def test_goldens_programming():
    # Words.cpp:285-293
    assert toks("C++ c# java++ A+ a++b c++x") == \
        ["C++", "c#", "java++", "A+", "a+", "b", "c+", "x"]


def test_goldens_numbers():
    # Words.cpp:295-320
    assert toks("1,000 3.14 1-2 8 1234,567 12,34 1,0000 1,000.56") == \
        ["1,000", "3.14", "1", "2", "8", "1234", "567", "12", "34", "1",
         "0000", "1,000.56"]


def test_goldens_unicode():
    assert toks("café naïve") == ["café", "naïve"]
    assert toks("日本語test") == ["日", "本", "語", "test"]
    assert toks("test日本") == ["test日", "本"]  # ideographic include+stop quirk
    assert toks("abcдef") == ["abc", "дef"]     # script change breaks


def test_hyphen_flags():
    t, h, _ = tokenize("cd-rom e-mail plain text 1-2")
    assert t == ["cd", "rom", "e", "mail", "plain", "text", "1", "2"]
    assert h == [True, False, True, False, False, False, True, False]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.ascii_letters + string.digits +
               " .,'-+#!?:;()\"/@", max_size=80))
def test_ascii_regex_equals_scanner(s):
    assert tokenize_pos(s) == _scan_unicode(s)


def test_bigram_ids():
    cache = TokenHashCache()
    rows, term, pos, is_big = terms_for_texts(["cd rom"], cache)
    # bigram of "cd rom" == wordId("cdrom") & mask (Phrases continued hash)
    bid = term[is_big]
    assert len(bid) == 1
    expected = np.uint64(hash64_lower_utf8("cdrom")) & TERMID_MASK
    assert int(bid[0]) == int(expected)


def test_bigram_stopword_xor():
    cache = TokenHashCache()
    # "st the" — second word is a stopword, no hyphen → XOR 0x768867
    _, term, _, is_big = terms_for_texts(["st the"], cache)
    raw = np.uint64(hash64_lower_utf8("stthe"))
    expected = (raw ^ PHRASE_STOPWORD_XOR) & TERMID_MASK
    assert int(term[is_big][0]) == int(expected)


def test_bigram_hyphen_overrides_stopword():
    cache = TokenHashCache()
    # hyphenated pair whose second word is a stopword → no XOR
    _, term, _, is_big = terms_for_texts(["x-the"], cache)
    expected = np.uint64(hash64_lower_utf8("xthe")) & TERMID_MASK
    assert int(term[is_big][0]) == int(expected)


def test_bigram_positions_and_rows():
    cache = TokenHashCache()
    rows, term, pos, is_big = terms_for_texts(["a b", "c d"], cache)
    # bigrams never span rows
    assert rows[is_big].tolist() == [0, 1]
    # bigram position = position of first word
    assert pos[is_big].tolist() == [0, 0]


def test_simple_tokenizer():
    assert tokenize_simple("Hello, World! 42") == ["hello", "world", "42"]
