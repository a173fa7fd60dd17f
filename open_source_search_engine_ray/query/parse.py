"""Query parser → term expansion (the ``Query::set`` analogue).

Replicates the structure of the reference's query pipeline
(``Query.cpp:103-140`` tokenize, ``Query.cpp:369-935`` setQTerms, SURVEY.md
Appendix A) with this engine's contract:

- the SAME tokenizer as indexing produces query tokens (``Query.cpp:262``);
- single-word terms are *required* (docid-vote intersection,
  ``PosdbTable.cpp:1847-2068``) unless they are query stopwords, which are
  scored but optional (IGNORE_QSTOP, ``Query.h:139``); if every positive
  term is optional the query is evaluated as OR;
- ``-term`` excludes documents (``delDocIdVotes`` ``PosdbTable.cpp:4703``);
  ``+term`` forces a stopword to be required;
- ``"quoted phrase"`` terms are required and must appear at consecutive
  positions (positional check; the reference only emits the quote-start
  term, ``Query.cpp:599-610`` — this engine scores each phrase word and
  filters by adjacency);
- adjacent positive unquoted terms yield optional bigram *boost* terms with
  the indexing-side phrase id rules (Appendix A class 1: bigrams are boost
  sublists, never required), weighted ``config.bigram_weight``;
- ``role:X`` / ``tool:X`` set the field scope for subsequent terms
  (``title:`` field analogue, ``Query.h:35-104``): scoped terms score with
  tf from that field only;
- synonyms/variations (Appendix A class 3) are not implemented in v1.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import FIELD_NAMES
from ..functions.ghash import (TERMID_MASK, PHRASE_STOPWORD_XOR,
                               hash64_lower_utf8, hash64_lower_utf8_cont)
from ..functions.stopwords import STOPWORDS, query_stopwords
from ..functions.tokenizer import tokenize, tokenize_pos


@dataclass
class QTerm:
    token: str
    term_id: int
    required: bool
    negative: bool
    is_bigram: bool
    field: int | None = None     # None = all fields, weighted
    weight: float = 1.0
    quote_id: int = -1


@dataclass
class ParsedQuery:
    raw: str
    terms: list[QTerm] = field(default_factory=list)       # expansion order
    phrases: list[list[int]] = field(default_factory=list)  # term_id chains
    # negated quoted phrases (-"foo bar"): docs where the chain matches at
    # consecutive positions are EXCLUDED; chain terms don't score
    neg_phrases: list[list[int]] = field(default_factory=list)
    # per-chain expected position offsets (parallel to phrases /
    # neg_phrases).  Ordinal mode: [0,1,2,...] (consecutive tokens);
    # monotone mode: the getWordPosVec cursor over the quoted text — the
    # document must reproduce the query's own token spacing
    # (QueryWord::m_posNum analogue, the duplicated cursor noted at
    # XmlDoc.cpp:20090-20092)
    phrase_offsets: list[list[int]] = field(default_factory=list)
    neg_phrase_offsets: list[list[int]] = field(default_factory=list)
    # boolean OR units (Query.h:149-158 boolean-op analogue): each group is
    # a required disjunction — a candidate doc must match ≥1 alternative
    or_groups: list[list[int]] = field(default_factory=list)
    # parenthesized boolean expression tree (Query.h:284,364
    # Expression::isTruth analogue).  When set, the candidate set comes
    # solely from evaluating this tree; terms/phrases only feed scoring
    # and list fetching.  Nodes: ("term", term_id, field),
    # ("phrase", [term_ids]), ("and", [pos...], [neg...]), ("or", [children])
    bool_tree: tuple | None = None

    def position_term_ids(self) -> set[int]:
        """Term ids whose postings must be fetched WITH positions."""
        ids = {t for chain in self.phrases for t in chain}
        ids |= {t for chain in self.neg_phrases for t in chain}
        if self.bool_tree is not None:
            def walk(node):
                if node[0] == "phrase":
                    ids.update(node[1])
                elif node[0] == "and":
                    for c in node[1] + node[2]:
                        walk(c)
                elif node[0] == "or":
                    for c in node[1]:
                        walk(c)
            walk(self.bool_tree)
        return ids


def _is_query_stop(token: str, stops: frozenset = STOPWORDS) -> bool:
    t = token.lower()
    return t in stops or (len(t) == 1 and t.isalpha())


def _parse_boolean_query(q: str, position_mode: str = "ordinal") -> ParsedQuery:
    """Full boolean expression trees for parenthesized queries
    (``Query.h:284,364`` — ``Expression::isTruth`` over nested
    AND/OR/NOT).  Grammar::

        expr   := andseq (OR andseq)*
        andseq := unary+            (adjacency = AND, like the reference)
        unary  := '-' unary | atom
        atom   := '(' expr ')' | "quoted phrase" | role:/tool: scope | word

    Every positive leaf term scores (BM25F sum over present terms); terms
    under a NOT never score.  Bigram boosts / synonyms / stopword
    optionality don't apply inside boolean trees (the reference likewise
    evaluates boolean queries as pure set expressions over termlists)."""
    out = ParsedQuery(raw=q)
    seen: dict[int, QTerm] = {}
    quote_id = [0]

    def add_term(tok, tid, negative, field_scope, qid=-1):
        qt = seen.get(tid)
        if qt is None:
            qt = QTerm(tok, tid, False, negative, False, field_scope,
                       1.0, qid)
            seen[tid] = qt
            out.terms.append(qt)
            return
        if qt.negative and not negative:
            # a term that ALSO appears positively anywhere must score —
            # the first occurrence being under a NOT must not mute it
            qt.negative = False
        if qt.field != field_scope:
            # same term under different scopes across branches: score it
            # unscoped so ranking is branch-order independent (candidate
            # filtering still honors each leaf's own scope via the tree)
            qt.field = None

    # --- lexer ---
    toks: list[tuple[str, str]] = []   # (kind, text)
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c in "()":
            toks.append((c, c))
            i += 1
        elif c == "-":
            toks.append(("NOT", "-"))
            i += 1
        elif c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                j = n
            toks.append(("QUOTE", q[i + 1:j]))
            i = j + 1
        else:
            j = i
            while j < n and not q[j].isspace() and q[j] not in '()"':
                j += 1
            word = q[i:j]
            i = j
            if word == "OR":
                toks.append(("OR", word))
            elif word in ("AND", "&&"):
                continue   # adjacency is already AND
            else:
                toks.append(("WORD", word))

    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else (None, None)

    def take():
        t = peek()
        pos[0] += 1
        return t

    def leaf_terms(word: str, field_scope, negative: bool) -> list[tuple]:
        nodes = []
        wtoks, _, _ = tokenize(word)
        for tok in wtoks:
            tid = int(np.uint64(hash64_lower_utf8(tok)) & TERMID_MASK)
            add_term(tok, tid, negative, field_scope)
            nodes.append(("term", tid, field_scope))
        return nodes

    def parse_atom(field_scope, negative):
        kind, text = peek()
        if kind == "(":
            take()
            node = parse_expr(field_scope, negative)
            if peek()[0] == ")":
                take()
            return node
        if kind == "QUOTE":
            take()
            wtoks, _, _ = tokenize(text)
            chain = []
            qid = quote_id[0]
            quote_id[0] += 1
            for tok in wtoks:
                tid = int(np.uint64(hash64_lower_utf8(tok)) & TERMID_MASK)
                add_term(tok, tid, negative, field_scope, qid)
                chain.append(tid)
            if len(chain) >= 2:
                return ("phrase", chain,
                        _phrase_offsets_for(wtoks, text, position_mode))
            return (("term", chain[0], field_scope) if chain
                    else ("and", [], []))
        if kind == "WORD":
            take()
            low = text.lower()
            for fname in ("role", "tool"):
                if low.startswith(fname + ":"):
                    value = low[len(fname) + 1:]
                    if fname == "role" and value in FIELD_NAMES:
                        return ("scope", FIELD_NAMES[value])
                    if fname == "tool":
                        return ("scope", FIELD_NAMES["tool"])
            nodes = leaf_terms(text, field_scope, negative)
            if len(nodes) == 1:
                return nodes[0]
            return ("and", nodes, [])
        take()   # stray ')' etc.
        return ("and", [], [])

    def parse_unary(field_scope, negative):
        if peek()[0] == "NOT":
            take()
            inner = parse_unary(field_scope, not negative)
            if inner[0] in ("neg", "scope"):   # --a == a; -role:x == role:x
                return inner[1] if inner[0] == "neg" else inner
            return ("neg", inner)
        return parse_atom(field_scope, negative)

    def parse_andseq(field_scope, negative):
        pos_children, neg_children = [], []
        scope = field_scope
        while peek()[0] not in (None, ")", "OR"):
            node = parse_unary(scope, negative)
            if node[0] == "scope":
                scope = node[1]
                continue
            if node[0] == "neg":
                neg_children.append(node[1])
            elif node != ("and", [], []):
                pos_children.append(node)
        if not neg_children and len(pos_children) == 1:
            return pos_children[0]
        return ("and", pos_children, neg_children)

    def parse_expr(field_scope, negative):
        children = [parse_andseq(field_scope, negative)]
        while peek()[0] == "OR":
            take()
            children.append(parse_andseq(field_scope, negative))
        if len(children) == 1:
            return children[0]
        return ("or", children)

    # top-level driver: keep parsing past stray ')' so no token of the
    # query is silently dropped; multiple top-level fragments AND together
    # (AND is associative, so and-node fragments flatten into one)
    nodes = []
    while peek()[0] is not None:
        node = parse_expr(None, False)
        if node != ("and", [], []):
            nodes.append(node)
        if peek()[0] == ")":
            take()   # unmatched close paren — skip and continue
    if len(nodes) == 1:
        out.bool_tree = nodes[0]
    else:
        top_pos, top_neg = [], []
        for nd in nodes:
            if nd[0] == "and":
                top_pos.extend(nd[1])
                top_neg.extend(nd[2])
            elif nd[0] == "neg":
                top_neg.append(nd[1])
            else:
                top_pos.append(nd)
        out.bool_tree = ("and", top_pos, top_neg)
    return out


def _phrase_offsets_for(toks: list[str], body: str,
                        position_mode: str) -> list[int]:
    """Expected in-document position offsets for a quoted chain."""
    if position_mode == "monotone":
        _, _, _, mono = tokenize_pos(body)
        return list(mono)
    return list(range(len(toks)))


def parse_query(q: str, bigram_weight: float = 0.5,
                synonyms: dict[str, list[str]] | None = None,
                synonym_weight: float = 0.9,
                lang: str = "en",
                position_mode: str = "ordinal",
                wiki_bigrams: frozenset | None = None,
                wiki_bigram_boost: float = 1.96) -> ParsedQuery:
    """``synonyms`` (optional): token → alternatives, expanded as optional
    weighted terms for unquoted, unsigned, unfielded words of length > 1 —
    Appendix A class 3 (``Synonyms.cpp:53-140``, ``synonymWeight=0.9``
    default ``Parms.cpp:3879-3886``).  Off by default.

    ``wiki_bigrams`` (optional): a phrase dictionary (lowercase
    ``"word word"`` entries).  A generated bigram boost term whose token
    pair is in the dictionary is weighted
    ``bigram_weight * wiki_bigram_boost`` — the ``WIKI_BIGRAM_WEIGHT²``
    rule (1.4², ``PosdbTable.h:22``, ``PosdbTable.cpp:436``); see
    functions/wiki_phrases.py.

    ``position_mode`` must match the index's ``IndexConfig.position_mode``
    — it controls the expected spacing of quoted-phrase tokens.

    A query containing parentheses routes to the boolean expression-tree
    parser (:func:`_parse_boolean_query`)."""
    if "(" in q:
        return _parse_boolean_query(q, position_mode)
    # per-language QUERY stopword set (query_stop_words.<lang>.txt
    # analogue); affects only IGNORE_QSTOP optionality — the bigram rule
    # below keeps the indexing contract's English set
    qstops = query_stopwords(lang)
    out = ParsedQuery(raw=q)
    # chunking: quotes, signs, field-scope directives
    i, n = 0, len(q)
    field_scope: int | None = None
    # token-level stream with attributes, for bigram adjacency
    stream: list[tuple[str, bool, bool, int, int | None, bool]] = []
    # (token, negative, required_sign, quote_id, field, hyphen_to_next)
    group_of: list[int] = []   # OR-group id per stream entry
    next_group = 0
    join_next = False          # previous chunk was the OR operator
    quote_id = -1
    quote_offs: dict[int, list[int]] = {}
    while i < n:
        while i < n and q[i].isspace():
            i += 1
        if i >= n:
            break
        neg = req = False
        if q[i] in "+-" and i + 1 < n and not q[i + 1].isspace():
            neg = q[i] == "-"
            req = q[i] == "+"
            i += 1
        if q[i] == '"':
            j = q.find('"', i + 1)
            if j < 0:
                j = n
            quote_id += 1
            body = q[i + 1:j]
            toks, hyph, _ = tokenize(body)
            quote_offs[quote_id] = _phrase_offsets_for(toks, body,
                                                       position_mode)
            # a sign before the quote applies to the whole phrase; a
            # single-token negated quote degrades to a plain negative term
            if neg and len(toks) == 1:
                stream.append((toks[0], True, False, -1, field_scope, False))
                group_of.append(next_group)
                next_group += 1
            else:
                for t_i, tok in enumerate(toks):
                    stream.append((tok, neg, True, quote_id, field_scope,
                                   hyph[t_i]))
                    group_of.append(next_group)
                    next_group += 1
            join_next = False
            i = j + 1
            continue
        j = i
        while j < n and not q[j].isspace() and q[j] != '"':
            j += 1
        chunk = q[i:j]
        i = j
        if chunk == "OR":
            # boolean OR operator: join previous and next simple terms into
            # one required disjunction (Query.h:149-158 analogue)
            join_next = bool(stream)
            continue
        low = chunk.lower()
        for fname in ("role", "tool"):
            if low.startswith(fname + ":"):
                value = low[len(fname) + 1:]
                if fname == "role" and value in FIELD_NAMES:
                    field_scope = FIELD_NAMES[value]
                    chunk = ""
                elif fname == "tool":
                    # any tool value scopes to the tool field
                    field_scope = FIELD_NAMES["tool"]
                    chunk = ""
                break
        if not chunk:
            continue
        toks, hyph, _ = tokenize(chunk)
        for t_i, tok in enumerate(toks):
            stream.append((tok, neg, req, -1, field_scope, hyph[t_i]))
            if t_i == 0 and join_next and not neg and len(group_of):
                group_of.append(group_of[-1])  # join previous OR group
            else:
                group_of.append(next_group)
                next_group += 1
        join_next = False

    # single terms (expansion order: appearance order)
    seen_ids: set[int] = set()
    groups: dict[int, list[int]] = {}
    for s_i, (tok, neg, req, qid, fscope, _hyph) in enumerate(stream):
        wid = hash64_lower_utf8(tok)
        tid = int(np.uint64(wid) & TERMID_MASK)
        is_stop = _is_query_stop(tok, qstops)
        required = (qid >= 0) or req or (not is_stop)
        if neg:
            out.terms.append(QTerm(tok, tid, False, True, False, fscope,
                                   1.0, qid))
            continue
        if qid < 0:
            groups.setdefault(group_of[s_i], []).append(tid)
        if tid in seen_ids and qid < 0:
            continue  # ignored repeat (Query.cpp:594 analogue)
        seen_ids.add(tid)
        out.terms.append(QTerm(tok, tid, required, False, False, fscope,
                               1.0, qid))
    # OR groups: ≥2 members become one required disjunction; its members
    # drop individual requiredness
    or_groups = [sorted(set(g)) for g in groups.values() if len(set(g)) > 1]
    if or_groups:
        member = {t for g in or_groups for t in g}
        for qt in out.terms:
            if qt.term_id in member and not qt.negative and not qt.is_bigram:
                qt.required = False
        out.or_groups = or_groups

    # synonym/variation expansion (Appendix A §3): a synonym is a sublist
    # of its base term — a doc matches the (required) term when it appears
    # in ANY sublist (PosdbTable.cpp:1374-1700 QueryTermInfo semantics) —
    # expressed here as an OR unit of {base, synonyms}
    if synonyms:
        by_tid = {t.term_id: t for t in out.terms}
        for tok, neg, req, qid, fscope, _h in stream:
            if neg or req or qid >= 0 or fscope is not None or len(tok) <= 1:
                continue
            alts = synonyms.get(tok.lower(), ())
            if not alts:
                continue
            base_tid = int(np.uint64(hash64_lower_utf8(tok)) & TERMID_MASK)
            unit = [base_tid]
            for alt in alts:
                tid = int(np.uint64(hash64_lower_utf8(alt)) & TERMID_MASK)
                if tid not in seen_ids:
                    seen_ids.add(tid)
                    qt = QTerm(alt, tid, False, False, False, None,
                               synonym_weight)
                    out.terms.append(qt)
                    by_tid[tid] = qt
                unit.append(tid)
            base = by_tid.get(base_tid)
            if base is not None and base.required:
                base.required = False
                out.or_groups.append(sorted(set(unit)))

    # bigram boost terms between adjacent positive tokens (same quote or
    # both unquoted), using the indexing-side phrase rules
    seen_bigrams: set[int] = set()
    for a, b in zip(range(len(stream) - 1), range(1, len(stream))):
        tok1, neg1, _, qid1, fs1, hyph1 = stream[a]
        tok2, neg2, _, qid2, fs2, _ = stream[b]
        if neg1 or neg2 or qid1 != qid2:
            continue
        wid1 = hash64_lower_utf8(tok1)
        h2, _ = hash64_lower_utf8_cont(tok2, wid1,
                                       len(tok1.encode("utf-8")))
        is_num = tok1[0].isdigit()
        stop2 = (tok2.lower() in STOPWORDS or
                 (len(tok2) == 1 and tok2.isalpha()))
        has_hyphen = hyph1 and not is_num
        if (not has_hyphen) and stop2:
            h2 = int(np.uint64(h2) ^ PHRASE_STOPWORD_XOR)
        tid = int(np.uint64(h2) & TERMID_MASK)
        if tid in seen_bigrams:
            continue
        seen_bigrams.add(tid)
        bw = bigram_weight
        if wiki_bigrams and f"{tok1.lower()} {tok2.lower()}" in wiki_bigrams:
            bw = bigram_weight * wiki_bigram_boost
        out.terms.append(QTerm(f"{tok1} {tok2}", tid, False, False, True,
                               fs1, bw, qid1))

    # quoted phrase chains for the positional adjacency filter (a quote's
    # tokens are uniformly positive or negative; negated chains go to
    # neg_phrases and are excluded rather than required)
    if quote_id >= 0:
        for qid in range(quote_id + 1):
            members = [t for t in out.terms
                       if t.quote_id == qid and not t.is_bigram]
            chain = [t.term_id for t in members]
            if len(chain) >= 2:
                offs = quote_offs.get(qid, list(range(len(chain))))
                if members[0].negative:
                    out.neg_phrases.append(chain)
                    out.neg_phrase_offsets.append(offs)
                else:
                    out.phrases.append(chain)
                    out.phrase_offsets.append(offs)
    return out
