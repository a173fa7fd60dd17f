"""Hand-verified query semantics on a tiny constructed corpus — validates
the shared kernel itself (the oracle parity tests can't catch kernel-level
semantic bugs because the oracle shares the kernel)."""

import pyarrow as pa
import pytest

from open_source_search_engine_ray.query.oracle import OracleIndex


def _mk(rows):
    conv_id, turn_idx, role, text, tool, ts = [], [], [], [], [], []
    for c, t, r, x in rows:
        conv_id.append(c)
        turn_idx.append(t)
        role.append(r)
        text.append(x)
        tool.append("bash" if r == "tool" else None)
        ts.append(0)
    return pa.table({
        "conv_id": pa.array(conv_id), "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(role), "text": pa.array(text),
        "tool": pa.array(tool, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


@pytest.fixture(scope="module")
def tiny():
    # doc A: apple banana | doc B: apple cherry | doc C: cherry date
    # doc D: banana only, in a tool turn | doc E: apple apple (tf boost)
    return OracleIndex(_mk([
        ("A", 0, "user", "apple banana"),
        ("B", 0, "user", "apple cherry"),
        ("C", 0, "assistant", "cherry date"),
        ("D", 0, "tool", "banana solo"),
        ("E", 0, "user", "apple apple"),
    ]))


def _convs(oracle, q, k=10):
    docs, _ = oracle.search(q, k)
    return sorted(oracle.doc_to_conv[int(d)] for d in docs)


def test_and_default(tiny):
    assert _convs(tiny, "apple banana") == ["A"]
    assert _convs(tiny, "apple cherry") == ["B"]
    assert _convs(tiny, "apple date") == []


def test_or_operator(tiny):
    assert _convs(tiny, "banana OR cherry") == ["A", "B", "C", "D"]
    # AND of a plain term with an OR group
    assert _convs(tiny, "apple banana OR cherry") == ["A", "B"]
    assert _convs(tiny, "date banana OR cherry") == ["C"]


def test_negative(tiny):
    assert _convs(tiny, "apple -cherry") == ["A", "E"]
    assert _convs(tiny, "apple -banana -cherry") == ["E"]


def test_field_scope(tiny):
    assert _convs(tiny, "tool:x banana") == ["D"]
    assert _convs(tiny, "role:user banana") == ["A"]


def test_phrase(tiny):
    assert _convs(tiny, '"apple banana"') == ["A"]
    assert _convs(tiny, '"banana apple"') == []


def test_tf_affects_rank(tiny):
    docs, scores = tiny.search("apple", 10)
    convs = [tiny.doc_to_conv[int(d)] for d in docs]
    # E has tf=2 and shortest dl among apple docs → ranks first
    assert convs[0] == "E"
    assert len(set(convs) & {"A", "B", "E"}) == 3


def test_stopword_optional(tiny):
    # "the" is OOV here and a stopword → optional; apple still required
    assert _convs(tiny, "the apple banana") == ["A"]


@pytest.fixture(scope="module")
def adjacency():
    # F has apple..banana NON-adjacent; A adjacent; D banana only
    return OracleIndex(_mk([
        ("A", 0, "user", "apple banana"),
        ("D", 0, "user", "banana solo"),
        ("F", 0, "user", "apple fig banana"),
    ]))


def test_negated_phrase(adjacency):
    # phrase "apple banana" matches only A (adjacent); F keeps both words
    # non-adjacently and must NOT be excluded
    assert _convs(adjacency, 'banana -"apple banana"') == ["D", "F"]
    # a negated phrase that matches nowhere excludes nothing
    assert _convs(adjacency, 'banana -"banana apple"') == ["A", "D", "F"]
    # phrase terms don't score: identical scores with/without the filter
    d1, s1 = adjacency.search('banana -"banana apple"', 10)
    d2, s2 = adjacency.search("banana", 10)
    assert list(d1) == list(d2) and list(s1) == list(s2)


def test_negated_single_token_quote(tiny):
    # -"cherry" degrades to a plain negative term
    assert _convs(tiny, 'apple -"cherry"') == ["A", "E"]


def test_synonym_expansion(tiny):
    # without synonyms, "fruit" matches nothing
    assert _convs(tiny, "fruit") == []
    # with a synonym table, fruit → banana (optional, 0.9-weighted)
    syn = {"fruit": ["banana"]}
    docs, scores = tiny.search("fruit", 10, synonyms=syn)
    convs = sorted(tiny.doc_to_conv[int(d)] for d in docs)
    assert convs == ["A", "D"]
    # the synonym contribution is scaled by 0.9 vs the direct query
    d2, s2 = tiny.search("banana", 10)
    direct = {tiny.doc_to_conv[int(d)]: s for d, s in zip(d2, s2)}
    via_syn = {tiny.doc_to_conv[int(d)]: s for d, s in zip(docs, scores)}
    for c in ("A", "D"):
        assert abs(via_syn[c] - 0.9 * direct[c]) < 1e-12


def test_boolean_tree_queries(tiny):
    # parenthesized boolean expressions (Expression::isTruth analogue)
    assert _convs(tiny, "(banana OR cherry) -apple") == ["C", "D"]
    assert _convs(tiny, "apple (banana OR cherry)") == ["A", "B"]
    assert _convs(tiny, "(apple banana) OR (cherry date)") == ["A", "C"]
    assert _convs(tiny, "apple -(banana OR cherry)") == ["E"]
    assert _convs(tiny, "((apple OR date) -banana)") == ["B", "C", "E"]
    # phrase leaf inside a boolean expression
    assert _convs(tiny, '("apple banana") OR date') == ["A", "C"]
    # field scope inside the tree
    assert _convs(tiny, "(role:user banana) OR date") == ["A", "C"]
    # terms under NOT don't score: same scores as the plain positive query
    d1, s1 = tiny.search("apple -(banana OR cherry)", 10)
    d2, s2 = tiny.search("apple", 10)
    m2 = {int(d): s for d, s in zip(d2, s2)}
    for d, s in zip(d1, s1):
        assert abs(m2[int(d)] - s) < 1e-12


def test_per_language_query_stopwords():
    # query_stop_words.<lang> analogue: 'der' is a stopword in German but
    # a content word in English — requiredness flips with the language
    orc = OracleIndex(_mk([
        ("G1", 0, "user", "der schnelle fuchs"),
        ("G2", 0, "user", "fuchs springt hoch"),
    ]))
    docs_en, _ = orc.search("der fuchs", 10, lang="en")
    assert sorted(orc.doc_to_conv[int(d)] for d in docs_en) == ["G1"]
    docs_de, _ = orc.search("der fuchs", 10, lang="de")
    assert sorted(orc.doc_to_conv[int(d)] for d in docs_de) == ["G1", "G2"]


def test_boolean_tree_random_expressions():
    """Property test: 200 random boolean expression trees rendered to
    query strings must match an independent set-semantics evaluator over
    the corpus (AND = intersection with anti-joined negations and no
    pure-negative matches, OR = union, NOT = exclusion)."""
    import random

    pool = ["apple", "banana", "cherry", "date", "fig", "grape"]
    rng = random.Random(1234)
    rows = []
    for i in range(40):
        k = rng.randint(2, 6)
        rows.append((f"D{i:02d}", 0, "user",
                     " ".join(rng.sample(pool, k))))
    orc = OracleIndex(_mk(rows))
    docsets = {c: set(t.split()) for c, _, _, t in rows}

    def gen(depth):
        r = rng.random()
        if depth >= 3 or r < 0.4:
            return ("t", rng.choice(pool))
        if r < 0.6:
            return ("and", [gen(depth + 1) for _ in range(rng.randint(2, 3))])
        if r < 0.85:
            return ("or", [gen(depth + 1) for _ in range(rng.randint(2, 3))])
        return ("not", gen(depth + 1))

    def render(node):
        kind = node[0]
        if kind == "t":
            return node[1]
        if kind == "and":
            return "(" + " ".join(render(c) for c in node[1]) + ")"
        if kind == "or":
            return "(" + " OR ".join(render(c) for c in node[1]) + ")"
        return "-" + render(("and", [node[1]]))

    def ev(node, convs):
        kind = node[0]
        if kind == "t":
            return {c for c in convs if node[1] in docsets[c]}
        if kind == "or":
            out = set()
            for c in node[1]:
                out |= ev(c, convs)
            return out
        if kind == "and":
            pos = [c for c in node[1] if c[0] != "not"]
            neg = [c[1] for c in node[1] if c[0] == "not"]
            if not pos:
                return set()          # pure-negative AND matches nothing
            cand = ev(pos[0], convs)
            for c in pos[1:]:
                cand &= ev(c, convs)
            for c in neg:
                cand -= ev(c, convs)
            return cand
        return set()                   # bare NOT at this level

    all_convs = set(docsets)
    n_nonempty = 0
    for trial in range(200):
        tree = ("and", [gen(0) for _ in range(rng.randint(1, 3))])
        q = render(tree)[1:-1]        # strip outer parens, keep inner ones
        if "(" not in q:
            q = "(" + q + ")"         # force the tree-parser route
            tree = ("and", [tree])
        want = ev(tree, all_convs)
        docs, _ = orc.search(q, 100)
        got = {orc.doc_to_conv[int(d)] for d in docs}
        assert got == want, (trial, q, sorted(got), sorted(want))
        n_nonempty += bool(want)
    assert n_nonempty > 50


def test_boolean_tree_negated_then_positive_term_scores():
    """A term first seen under NOT but also required positively must still
    score (code-review r2 regression: the seen-dedup kept negative=True)."""
    orc = OracleIndex(_mk([("A", 0, "user", "apple banana")]))
    d1, s1 = orc.search("(-apple OR banana) apple", 10)
    d2, s2 = orc.search("(banana) apple", 10)
    assert list(d1) == list(d2)
    assert list(s1) == list(s2)   # apple's BM25 contribution not muted


def test_boolean_tree_stray_parens_and_scope(tiny):
    # unmatched ')' must not drop the rest of the query
    assert _convs(tiny, "(apple)) banana") == _convs(tiny, "(apple banana)")
    assert _convs(tiny, "(banana)) -apple") == _convs(tiny, "(banana) -apple")
    # a term scoped in one branch and unscoped in another scores branch-
    # order independently
    d1, s1 = tiny.search("(role:user apple) OR apple", 10)
    d2, s2 = tiny.search("apple OR (role:user apple)", 10)
    assert list(d1) == list(d2) and list(s1) == list(s2)
    assert all(s > 0 for s in s1)
