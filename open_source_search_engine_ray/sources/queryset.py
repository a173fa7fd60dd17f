"""The reference query set (FIXTURES.md §2) — the queries both the oracle
and the engine answer; rank identity over this set is the correctness gate.

Query classes mirror the reference's black-box term-expansion tests
(``test/system/test_search_terms.py:4-18``) plus WAND/salting stress cases.
"""

from __future__ import annotations

QUERIES: list[tuple[str, str, int]] = [
    # (query_id, query string, k)
    ("q0001", "w4273", 10),                 # single rare (Zipf tail) term
    ("q0002", "w0002", 10),                 # single hot (Zipf head) term
    ("q0003", "w0042 w0777", 10),           # two-term OR + bigram boost
    ("q0004", "to be or not to be", 10),    # stopword-heavy phrase
    ("q0005", '"w0042 w0777"', 10),         # quoted phrase (positional)
    ("q0006", "w0042 -w0777", 10),          # negative term
    ("q0007", "role:assistant w0042", 10),  # fielded query (title: analogue)
    ("q0008", "we're C++ 1,000", 10),       # edge-case tokens
    ("q0009", "zzqqxoov", 10),              # OOV term — zero hits
    ("q0010", "the", 10),                   # df≈N — idf floor, WAND worst case
    ("q0011", "w0001 w0002 w0003", 10),     # all hot terms
    ("q0012", "roleonlyterm_assistant", 10),  # field marker term
    ("q0013", '"we\'re sure dave\'s code"', 10),  # quoted 4-word edge phrase
    ("q0014", "+w0042 w9321", 10),          # required + rare
    ("q0015", "tool:bash w0100", 10),       # tool-field query
    ("q0016", "cd-rom", 10),                # hyphenated bigram
    ("q0017", 'w0042 -"w0042 w0777"', 10),  # negated quoted phrase
    ("q0018", "(w0042 OR w0777) -w0100", 10),   # boolean tree
    ("q0019", '(w0042 w0777) OR "we\'re sure"', 10),  # nested bool + phrase
]


def query_set() -> list[tuple[str, str, int]]:
    return list(QUERIES)
