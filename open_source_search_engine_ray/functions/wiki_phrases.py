"""Wiki-phrase bigram boost data (the ``Wiki.cpp`` dictionary analogue).

The reference loads a titles dictionary (``Wiki.cpp:87-210`` reads
``wikititles.txt.part*`` into ``m_ht``), marks adjacent query words that
fall inside one dictionary phrase (``Query::m_wikiPhraseId``,
``Words/Phrases`` carry the flag into the posting as the half-stop wiki
bigram bit, ``Posdb.h`` ``getIsHalfStopWikiBigram``), and scores such
bigram pairs with ``WIKI_BIGRAM_WEIGHT = 1.40`` applied **squared**
(``PosdbTable.h:22``, ``PosdbTable.cpp:436``:
``sum += bestScores[k] * WIKI_BIGRAM_WEIGHT * WIKI_BIGRAM_WEIGHT``).

This engine's analogue under the BM25F contract: a query-side phrase
dictionary.  When the two tokens of a generated bigram boost term form a
dictionary phrase, the boost term's weight is
``bigram_weight * wiki_bigram_boost`` (default ``1.4² = 1.96``) instead of
``bigram_weight``.  The check is query-side only — the bigram termid and
the index layout are unchanged, so the dictionary can be swapped without
rebuilding (the reference must bake the bit into postings because its
scorer never sees the surface text; this engine's parser does).  The
reference restricts the squared boost to *half-stopword* wiki bigrams
(the pairs that would otherwise be weakened by the stopword-XOR hash
rule); this engine applies it to any dictionary pair — a documented
generalization, shared by engine and oracle so rank identity holds.

The shipped default list is a small curated set of common two-word
noun-phrase titles (public general knowledge, the spirit of the
reference's ``wikititles`` data at smoke scale).  Production use loads a
full titles dump via :func:`load_wiki_bigrams`.
"""

from __future__ import annotations

# 1.40² — PosdbTable.h:22 WIKI_BIGRAM_WEIGHT, applied squared at
# PosdbTable.cpp:436
WIKI_BIGRAM_BOOST = 1.96

# curated two-word titles: lowercase, single-space separated, tokens must
# survive the engine tokenizer unchanged (plain alnum words)
DEFAULT_WIKI_BIGRAMS = frozenset({
    "machine learning", "deep learning", "neural network",
    "artificial intelligence", "computer science", "data science",
    "natural language", "operating system", "open source",
    "source code", "version control", "unit test",
    "climate change", "global warming", "solar system",
    "quantum mechanics", "general relativity", "black hole",
    "periodic table", "amino acid", "immune system",
    "new york", "los angeles", "san francisco", "hong kong",
    "united states", "united kingdom", "new zealand", "south africa",
    "middle east", "latin america", "pacific ocean", "atlantic ocean",
    "world war", "cold war", "civil war", "french revolution",
    "supreme court", "prime minister", "human rights", "civil rights",
    "stock market", "interest rate", "supply chain", "exchange rate",
    "health care", "public health", "mental health", "blood pressure",
    "heart disease", "red blood", "dna sequence", "gene expression",
    "search engine", "web browser", "social media", "mobile phone",
    "hard drive", "random access", "binary search", "hash table",
    "linked list", "regular expression", "programming language",
    "distributed system", "load balancing", "fault tolerance",
})


def load_wiki_bigrams(path: str) -> frozenset:
    """Load a phrase file (one phrase per line, ``wikititles.txt`` style);
    keeps the two-word entries this engine's bigram boost can use, folded
    to the parser's comparison form (lowercase, single space)."""
    out = set()
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            words = line.strip().lower().split()
            if len(words) == 2:
                out.add(" ".join(words))
    return frozenset(out)
