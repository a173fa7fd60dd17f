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


# Per-language QUERY stopword sets (``query_stop_words.*.txt`` analogue —
# the reference ships one file per language and picks by query language).
# These drive only the query-side IGNORE_QSTOP optionality decision; the
# index-side bigram stopword rule stays on the English contract set so
# term/phrase ids never depend on the query language.  Small hand-written
# common-function-word sets (public knowledge).
QUERY_STOPWORDS: dict[str, frozenset] = {
    "en": STOPWORDS,
    "de": frozenset("""
der die das den dem des ein eine einer eines einem einen und oder aber ist
sind war waren sein bin bist seid nicht kein keine mit von zu im in am an
auf für als auch es ich du er sie wir ihr man sich dass wie was wer wo
""".split()),
    "fr": frozenset("""
le la les un une des du de et ou mais est sont était je tu il elle nous
vous ils elles ne pas plus avec pour dans sur par au aux ce cette ces que
qui quoi où si son sa ses mon ma mes ton ta tes
""".split()),
    "es": frozenset("""
el la los las un una unos unas y o pero es son era fue soy eres de del en
con por para que quien como donde no más yo tú él ella nosotros vosotros
ellos se su sus mi mis tu tus este esta estos estas
""".split()),
    "it": frozenset("""
il lo la i gli le un uno una e o ma è sono era fu di del della dei delle
in con per su da che chi come dove non più io tu lui lei noi voi loro si
suo sua suoi mio mia questo questa questi queste
""".split()),
    "pt": frozenset("""
o a os as um uma uns umas e ou mas é são era foi de do da dos das em com
por para que quem como onde não mais eu tu ele ela nós vós eles se seu sua
seus meu minha este esta estes estas
""".split()),
}


def query_stopwords(lang: str) -> frozenset:
    """Stopword set for a query language; unknown languages fall back to
    English (the reference's default-collection behavior)."""
    return QUERY_STOPWORDS.get(lang, STOPWORDS)
