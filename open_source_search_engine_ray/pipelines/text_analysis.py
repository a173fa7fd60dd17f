"""Text analysis operators over ``documents``: token stats, quality
scoring, heuristic language ID, document fingerprinting.

The language/quality heuristics are defined as exact functions of the text
(no models — the reference's CLD2 language ID ``FxLanguage.cpp`` and spam
checks ``FxCheckSpam.cpp`` are external-model stages there) so the DuckDB
oracle can replicate them bit-for-bit where SQL allows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.ghash import hash64_batch
from ..functions.stopwords import STOPWORDS
from ..functions.tokenizer import tokenize_simple

# deterministic marker vocabularies for the n-gram language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "with", "for"],
    "de": ["der", "die", "und", "das", "ist", "mit", "ein", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "pour"],
    "es": ["el", "la", "de", "los", "que", "es", "una", "por"],
}
LANG_ORDER = ["en", "de", "fr", "es"]

FINGERPRINT_WINDOW = 4  # winnowing window over 3-gram hashes


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=list(columns))


def token_stats(sf_dir: str):
    """→ (doc_id, n_tokens, n_unique, mean_token_len)."""
    def stats(batch: pa.Table) -> pa.Table:
        n_tok, n_uni, mean_len = [], [], []
        for t in batch["text"].to_pylist():
            toks = tokenize_simple(t or "")
            n_tok.append(len(toks))
            n_uni.append(len(set(toks)))
            mean_len.append(
                round(float(np.float64(sum(map(len, toks))) /
                            np.float64(len(toks))), 6) if toks else 0.0)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_unique": pa.array(n_uni, pa.int64()),
            "mean_token_len": pa.array(mean_len, pa.float64()),
        })

    return _read_docs(sf_dir).map_batches(stats, batch_format="pyarrow")


# whitespace is an EXPLICIT ASCII class: Python re's \s is Unicode-aware
# while DuckDB's RE2 \s is ASCII-only — with \s the two sides disagree on
# NBSP etc., breaking oracle parity on real-world text
_WS = r"\t\n\f\r "
_BPE_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d"
                r"| ?[a-zA-Z]+| ?[0-9]+"
                rf"| ?[^a-zA-Z0-9{_WS}]+|[{_WS}]+")


def bpe_token_count(sf_dir: str):
    """→ (doc_id, n_bpe_tokens, chars_per_token): GPT-2-style pre-tokenizer
    segmentation (contraction suffixes, letter runs, digit runs, punct
    runs, whitespace) — the standard first stage of BPE tokenization, as a
    deterministic regex both Python ``re`` and DuckDB's RE2 evaluate
    identically.  The LLM-pipeline 'token budget' operator: compiled once
    per actor, vectorized over batches."""
    import re

    pat = re.compile(_BPE_PATTERN)

    def count(batch: pa.Table) -> pa.Table:
        n_tok, cpt = [], []
        for t in batch["text"].to_pylist():
            t = t or ""
            toks = pat.findall(t)
            n = len(toks)
            n_tok.append(n)
            cpt.append(round(len(t) / n, 6) if n else 0.0)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": pa.array(n_tok, pa.int64()),
            "chars_per_token": pa.array(cpt, pa.float64()),
        })

    return _read_docs(sf_dir).map_batches(count, batch_format="pyarrow")


def bpe_token_count_sql() -> str:
    pat = _BPE_PATTERN.replace("'", "''")
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{pat}')) AS n_bpe_tokens,
       CASE WHEN len(regexp_extract_all(text, '{pat}')) = 0 THEN 0.0
            ELSE round(length(text)::DOUBLE /
                       len(regexp_extract_all(text, '{pat}')), 6)
       END AS chars_per_token
FROM documents ORDER BY doc_id
"""


def token_stats_sql() -> str:
    return """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
)
SELECT d.doc_id,
       coalesce(s.n_tokens, 0) AS n_tokens,
       coalesce(s.n_unique, 0) AS n_unique,
       coalesce(s.mean_token_len, 0.0) AS mean_token_len
FROM documents d
LEFT JOIN (
  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT term) AS n_unique,
         round(sum(length(term))::DOUBLE / count(*), 6) AS mean_token_len
  FROM toks GROUP BY doc_id
) s USING (doc_id)
ORDER BY doc_id
"""


def quality_score(sf_dir: str):
    """→ (doc_id, n_tokens, stop_ratio, short_ratio, quality):
    quality = round((1-stop_ratio)*0.6 + (1-short_ratio)*0.4, 6)."""
    stop_list = sorted(STOPWORDS)

    def score(batch: pa.Table) -> pa.Table:
        out = {"doc_id": batch["doc_id"], "n_tokens": [], "stop_ratio": [],
               "short_ratio": [], "quality": []}
        for t in batch["text"].to_pylist():
            toks = tokenize_simple(t or "")
            n = len(toks)
            if n == 0:
                out["n_tokens"].append(0)
                out["stop_ratio"].append(0.0)
                out["short_ratio"].append(0.0)
                out["quality"].append(1.0)
                continue
            stop = sum(1 for x in toks if x in STOPWORDS)
            short = sum(1 for x in toks if len(x) <= 2)
            sr = round(float(np.float64(stop) / np.float64(n)), 6)
            shr = round(float(np.float64(short) / np.float64(n)), 6)
            out["n_tokens"].append(n)
            out["stop_ratio"].append(sr)
            out["short_ratio"].append(shr)
            out["quality"].append(round((1 - sr) * 0.6 + (1 - shr) * 0.4, 6))
        return pa.table({
            "doc_id": out["doc_id"],
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
            "stop_ratio": pa.array(out["stop_ratio"], pa.float64()),
            "short_ratio": pa.array(out["short_ratio"], pa.float64()),
            "quality": pa.array(out["quality"], pa.float64()),
        })

    _ = stop_list
    return _read_docs(sf_dir).map_batches(score, batch_format="pyarrow")


def quality_score_sql() -> str:
    stops = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    return f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
),
agg AS (
  SELECT doc_id, count(*) AS n,
         round(sum(CASE WHEN term IN ({stops}) THEN 1 ELSE 0 END)::DOUBLE
               / count(*), 6) AS stop_ratio,
         round(sum(CASE WHEN length(term) <= 2 THEN 1 ELSE 0 END)::DOUBLE
               / count(*), 6) AS short_ratio
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n, 0) AS n_tokens,
       coalesce(a.stop_ratio, 0.0) AS stop_ratio,
       coalesce(a.short_ratio, 0.0) AS short_ratio,
       CASE WHEN a.n IS NULL THEN 1.0
            ELSE round((1 - a.stop_ratio) * 0.6 + (1 - a.short_ratio) * 0.4, 6)
       END AS quality
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


def lang_id(sf_dir: str):
    """→ (doc_id, lang_pred): argmax of distinct-marker hits, precedence
    en > de > fr > es on ties, 'unknown' when no markers hit."""
    def classify(batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch["text"].to_pylist():
            toks = set(tokenize_simple(t or ""))
            best_lang, best_n = "unknown", 0
            for lang in LANG_ORDER:
                n = len(toks & set(LANG_MARKERS[lang]))
                if n > best_n:
                    best_lang, best_n = lang, n
            preds.append(best_lang)
        return pa.table({"doc_id": batch["doc_id"],
                         "lang_pred": pa.array(preds, pa.string())})

    return _read_docs(sf_dir).map_batches(classify, batch_format="pyarrow")


class _NgramLangId:
    """Actor-pool stage for the TextCat n-gram classifier: the ~30
    reference profiles build once per actor in ``__init__`` (SURVEY §2.4
    stateful-stage rule); ``__call__`` classifies a batch."""

    def __init__(self):
        from ..functions import langid

        self._classify = langid.classify

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs, confs = [], []
        for t in batch["text"].to_pylist():
            lg, c = self._classify(t or "")
            langs.append(lg)
            confs.append(c)
        return pa.table({"doc_id": batch["doc_id"],
                         "lang_pred": pa.array(langs, pa.string()),
                         "confidence": pa.array(confs, pa.float64())})


def lang_id_ngram(sf_dir: str):
    """→ (doc_id, lang_pred, confidence): TextCat rank-order character
    n-gram classification over ~30 languages (functions/langid.py — the
    public-method CLD2 analogue, ``FxLanguage.cpp``).  Rows-only driver
    entry: the classifier is not SQL-expressible; accuracy is anchored
    by the planted multilingual pytest instead.  Map-side only, no
    shuffle."""
    return _read_docs(sf_dir).map_batches(
        _NgramLangId, batch_format="pyarrow", concurrency=(1, 8))


def lang_id_sql() -> str:
    def in_list(lang):
        return ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, t.term
  FROM documents, UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE t.term <> ''
),
hits AS (
  SELECT doc_id,
         sum(CASE WHEN term IN ({in_list('en')}) THEN 1 ELSE 0 END) AS n_en,
         sum(CASE WHEN term IN ({in_list('de')}) THEN 1 ELSE 0 END) AS n_de,
         sum(CASE WHEN term IN ({in_list('fr')}) THEN 1 ELSE 0 END) AS n_fr,
         sum(CASE WHEN term IN ({in_list('es')}) THEN 1 ELSE 0 END) AS n_es
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       CASE
         WHEN h.doc_id IS NULL OR greatest(n_en, n_de, n_fr, n_es) = 0
           THEN 'unknown'
         WHEN n_en >= greatest(n_de, n_fr, n_es) THEN 'en'
         WHEN n_de >= greatest(n_fr, n_es) THEN 'de'
         WHEN n_fr >= n_es THEN 'fr'
         ELSE 'es'
       END AS lang_pred
FROM documents d LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
"""


def fingerprint_docs(sf_dir: str):
    """→ (doc_id, n_fingerprints, min_fp): winnowing fingerprints — min
    hash per sliding window of 3-gram hashes (rows-only check; the rolling
    structure is not ANSI-SQL)."""
    def fp(batch: pa.Table) -> pa.Table:
        n_fps, min_fps = [], []
        for t in batch["text"].to_pylist():
            toks = tokenize_simple(t or "")
            grams = [" ".join(toks[i:i + 3])
                     for i in range(max(0, len(toks) - 2))]
            if not grams:
                n_fps.append(0)
                min_fps.append(0)
                continue
            hs = (hash64_batch([g.encode() for g in grams]) &
                  np.uint64((1 << 62) - 1))
            w = FINGERPRINT_WINDOW
            if len(hs) <= w:
                fps = {int(hs.min())}
            else:
                view = np.lib.stride_tricks.sliding_window_view(hs, w)
                fps = set(view.min(axis=1).tolist())
            n_fps.append(len(fps))
            min_fps.append(min(fps))
        return pa.table({"doc_id": batch["doc_id"],
                         "n_fingerprints": pa.array(n_fps, pa.int64()),
                         "min_fp": pa.array(min_fps, pa.int64())})

    return _read_docs(sf_dir).map_batches(fp, batch_format="pyarrow")


def url_host_stats(sf_dir: str):
    """→ (host, domain, n_urls) — URL parse/normalize (the ``Url.cpp``/
    ``Punycode.cpp`` scalar family, functions/urlnorm.py) grouped by
    normalized host.  The corpus has no URL column, so — like the
    multimodal payloads — deterministic messy URLs derive from doc_id
    (mixed case, default ports, dot-segments, %-escapes, IDN hosts) and
    MUST all collapse to clean canonical hosts.  Rows-only driver check;
    the normalization goldens are tests/test_pipelines.py."""
    import ray.data
    from ray.data.aggregate import Count

    from ..functions.urlnorm import normalize_url_batch, synth_url

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def attach(b: pa.Table) -> pa.Table:
        urls = [synth_url(int(d)) for d in b["doc_id"].to_numpy()]
        return normalize_url_batch(
            pa.table({"doc_id": b["doc_id"],
                      "url": pa.array(urls, pa.string())}))

    return (ds.map_batches(attach, batch_format="pyarrow")
            .groupby(["host", "domain"])
            .aggregate(Count(alias_name="n_urls"))
            .sort(["n_urls", "host"], descending=[True, False]))


TOP_TERMS_K = 20
MG_CAPACITY = 8192          # Misra-Gries counters per batch summary


def top_terms(sf_dir: str):
    """→ the exact top-K corpus terms by total occurrence count
    (term, n), ties broken by term — found with a mergeable Misra-Gries
    (SpaceSaving) sketch plus an exact verification pass.

    Scale shape (the reason this isn't just ``groupby(term).sum()``): a
    full term-count groupby shuffles every distinct term.  Here each batch
    emits an MG summary truncated to C=MG_CAPACITY counters (any term with true
    count > N/C is guaranteed to survive truncation — Misra & Gries
    1982; summaries merge by summation, Agarwal et al. 2012), so the
    shuffle is O(C x batches) rows regardless of vocabulary size.  The
    candidate top-(4K) set is then broadcast and re-counted *exactly* in a
    second streaming pass, so the output is exact, not approximate —
    the sketch only prunes the shuffle.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    def _batch_counts(batch: pa.Table) -> dict[str, int]:
        counts: dict[str, int] = {}
        for text in batch["text"].to_pylist():
            for t in tokenize_simple(text or ""):
                counts[t] = counts.get(t, 0) + 1
        return counts

    def mg_partial(batch: pa.Table) -> pa.Table:
        counts = _batch_counts(batch)
        thresh = 0
        if len(counts) > MG_CAPACITY:
            vals = np.sort(np.fromiter(counts.values(), dtype=np.int64))
            thresh = int(vals[len(vals) - MG_CAPACITY - 1])  # (C+1)-th largest
            counts = {t: c - thresh for t, c in counts.items()
                      if c > thresh}
        # "\x00r" sentinel row: this batch's truncation residual.  Any
        # term NOT in a batch summary was undercounted by <= thresh, so
        # sum(thresh) bounds the total undercount of any term — the
        # soundness certificate checked below (no real term can collide
        # with the sentinel: the tokenizer never emits NUL bytes)
        return pa.table({
            "term": pa.array(list(counts.keys()) + ["\x00r"], pa.string()),
            "n_lb": pa.array(list(counts.values()) + [thresh], pa.int64()),
        })

    lb = (_read_docs(sf_dir).map_batches(mg_partial,
                                         batch_format="pyarrow")
          .groupby("term").aggregate(Sum("n_lb", alias_name="n_lb"))
          .to_pandas())
    residual = int(lb.loc[lb["term"] == "\x00r", "n_lb"].sum())
    lb = lb[lb["term"] != "\x00r"]
    cand = lb.nlargest(TOP_TERMS_K * 4, "n_lb")
    # soundness: an excluded term's true count <= its lower bound
    # (<= cut, the smallest candidate bound) + the global residual.
    # With no truncation anywhere the bounds ARE the exact counts and
    # the candidate set is provably sufficient.
    cut = int(cand["n_lb"].min()) if len(cand) else 0
    # excluded-but-seen terms have true count <= cut + residual; terms
    # truncated out of EVERY batch summary still have true count <=
    # residual — so the bound never collapses to 0 while residual > 0
    if len(lb) > len(cand):
        exclusion_bound = cut + residual
    else:
        exclusion_bound = residual
    cand_sorted = np.sort(cand["term"].to_numpy().astype(object))
    ref = ray.put(cand_sorted)

    def exact_count(batch: pa.Table) -> pa.Table:
        cs = ray.get(ref)
        counts = np.zeros(len(cs), dtype=np.int64)
        for text in batch["text"].to_pylist():
            toks = np.asarray(tokenize_simple(text or ""), dtype=object)
            if len(toks) == 0:
                continue
            idx = np.searchsorted(cs, toks)
            ok = (idx < len(cs))
            idx[~ok] = 0
            ok &= cs[idx] == toks
            np.add.at(counts, idx[ok], 1)
        return pa.table({"term": pa.array(cs, pa.string()),
                         "n_part": pa.array(counts, pa.int64())})

    exact = (_read_docs(sf_dir).map_batches(exact_count,
                                            batch_format="pyarrow")
             .groupby("term").aggregate(Sum("n_part", alias_name="n"))
             .to_pandas())
    exact = exact.sort_values(["n", "term"], ascending=[False, True],
                              kind="stable").head(TOP_TERMS_K)
    kth = int(exact["n"].min()) if len(exact) else 0
    # strict >: an excluded term tying kth could still win the name
    # tie-break, so equality is not a certificate
    if exclusion_bound > 0 and kth <= exclusion_bound:
        # certificate failed (near-flat frequency distribution): the
        # sketch cannot prove the candidate set contains the true top-K.
        # Fall back to the exact full-vocabulary count — more shuffle,
        # still correct; the sketch path is the fast common case.
        def all_counts(batch: pa.Table) -> pa.Table:
            counts = _batch_counts(batch)
            return pa.table({
                "term": pa.array(list(counts.keys()), pa.string()),
                "n_part": pa.array(list(counts.values()), pa.int64())})

        exact = (_read_docs(sf_dir).map_batches(all_counts,
                                                batch_format="pyarrow")
                 .groupby("term").aggregate(Sum("n_part", alias_name="n"))
                 .to_pandas()
                 .sort_values(["n", "term"], ascending=[False, True],
                              kind="stable").head(TOP_TERMS_K))
    return pd.DataFrame({"term": exact["term"].to_numpy(),
                         "n": exact["n"].to_numpy().astype(np.int64)})


def top_terms_sql() -> str:
    return f"""
SELECT t.term AS term, count(*) AS n
FROM documents,
     UNNEST(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
WHERE t.term <> ''
GROUP BY t.term
ORDER BY n DESC, term
LIMIT {TOP_TERMS_K}
"""
