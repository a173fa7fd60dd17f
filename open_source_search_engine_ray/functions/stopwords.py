"""Stopword tables.

The reference ships a large multi-language stopword module
(``StopWords.cpp``, 2,108 LoC; per-language ``query_stop_words.*.txt``).
This engine keeps one configurable English set covering the reference's
common-word core; it drives

- the bigram stopword rule (``Phrases.cpp:253-262``: two-word phrase id is
  XORed with 0x768867 when the second word is a stopword and the pair is not
  hyphenated), via ``Bits::getAlnumBits`` (``Bits.cpp:170-177``), and
- query stopword handling (``Query.h:139`` IGNORE_QSTOP: unquoted, unsigned
  query stopwords are ignored for requiredness but still scored).
"""

STOPWORDS = frozenset("""
a about after all also an and any are as at be because been but by can could
did do does for from had has have he her his how i if in into is it its just
me more most my no not of on one only or other our out she so some than that
the their them then there these they this to up us was we were what when
which who will with would you your
""".split())


def is_stopword(token_lower: str) -> bool:
    return token_lower in STOPWORDS
