"""Query-side synonym / word-variation expansion tables.

The reference treats synonyms as core relevance: STO dictionaries +
Wiktionary-derived tables (``Synonyms.cpp:53-140``, ``sto/``), generated
word variations (``word_variations/WordVariations.cpp`` — verb/noun
morphology, possessive strip ``XmlDoc_Indexing.cpp:1973-2018``), and
number variants — its system test asserts ``'the one'`` expands to
``['the one', 'the', 'one', '1']`` (``test/system/test_search_terms.py:4-18``),
all weighted ``synonymWeight = 0.9`` (``Parms.cpp:3879-3886``).

The STO dictionaries themselves are data files this repo does not ship;
this module provides a documented substitute with the same *mechanism*:

1. number-word ↔ digit variants (both directions, 0-20 + tens + scales);
2. a small curated English synonym table (hand-written, public-knowledge
   word pairs — the stand-in for the STO dictionary payload);
3. generated variations: possessive strip (``dave's`` → ``dave``),
   apostrophe-less form, naive plural/singular (add/strip ``s``) — the
   ``WordVariations`` analogue.

``DEFAULT_SYNONYMS`` is a dict-like object usable directly as the
``synonyms=`` argument of ``parse_query`` / ``IndexSearcher.search`` /
``OracleIndex.search``: lookups generate variants on the fly, so the
"table" needs no corpus-sized storage.  Expansion semantics (OR-unit of
{base, variants}, weight 0.9, base term's requiredness transfers to the
unit) live in ``query/parse.py``.
"""

from __future__ import annotations

NUMBER_WORDS = {
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "ten": "10", "eleven": "11", "twelve": "12", "thirteen": "13",
    "fourteen": "14", "fifteen": "15", "sixteen": "16", "seventeen": "17",
    "eighteen": "18", "nineteen": "19", "twenty": "20", "thirty": "30",
    "forty": "40", "fifty": "50", "sixty": "60", "seventy": "70",
    "eighty": "80", "ninety": "90", "hundred": "100", "thousand": "1000",
    "million": "1000000", "billion": "1000000000",
}
DIGIT_WORDS = {v: k for k, v in NUMBER_WORDS.items()}

# curated sets: every member expands to the others (the STO-payload
# stand-in — ordinary public-knowledge English synonym groups)
SYNONYM_SETS: list[list[str]] = [
    ["fast", "quick", "rapid", "speedy"],
    ["big", "large", "huge"],
    ["small", "little", "tiny"],
    ["car", "auto", "automobile"],
    ["begin", "start", "commence"],
    ["end", "finish", "conclude"],
    ["buy", "purchase"],
    ["sick", "ill"],
    ["smart", "intelligent", "clever"],
    ["happy", "glad", "joyful"],
    ["sad", "unhappy"],
    ["road", "street"],
    ["movie", "film"],
    ["picture", "photo", "image"],
    ["error", "mistake", "fault"],
    ["fix", "repair", "mend"],
    ["test", "check", "verify"],
    ["delete", "remove", "erase"],
    ["search", "find", "lookup"],
    ["build", "construct", "assemble"],
]
_SET_INDEX: dict[str, list[str]] = {}
for _s in SYNONYM_SETS:
    for _w in _s:
        _SET_INDEX[_w] = [x for x in _s if x != _w]


def variants_for(token: str) -> list[str]:
    """All expansion alternatives for one lowercase query token."""
    out: list[str] = []
    low = token.lower()
    if low in NUMBER_WORDS:
        out.append(NUMBER_WORDS[low])
    if low in DIGIT_WORDS:
        out.append(DIGIT_WORDS[low])
    out.extend(_SET_INDEX.get(low, ()))
    # generated variations (WordVariations analogue)
    if low.endswith("'s") and len(low) > 2:       # possessive strip
        out.append(low[:-2])
    elif "'" in low:                              # we're → were
        out.append(low.replace("'", ""))
    elif low.endswith("s") and len(low) > 3 and not low.endswith("ss"):
        out.append(low[:-1])                      # naive singular
    elif low.isalpha() and len(low) > 2:
        out.append(low + "s")                     # naive plural
    # dedup, preserve order, never echo the base
    seen = {low}
    uniq = []
    for v in out:
        if v not in seen:
            seen.add(v)
            uniq.append(v)
    return uniq


class GenerativeSynonyms:
    """Dict-like synonym source: ``.get(token)`` generates variants on
    demand — usable anywhere a ``dict[str, list[str]]`` table is."""

    def get(self, token: str, default=()):
        v = variants_for(token)
        return v if v else default

    def __contains__(self, token: str) -> bool:
        return bool(variants_for(token))


DEFAULT_SYNONYMS = GenerativeSynonyms()
