"""Driver contract for the graft builder (Ray Data target).

The driver initialises Ray itself before importing this module; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

``entry()`` runs the flagship pipeline (full inverted-index build over the
synthetic transcripts corpus + BM25F top-k for the reference query set) at
smoke scale.  ``queries()`` exposes every implemented operator/pipeline
from SURVEY.md §2 plus the training-data operators (dedup family,
similarity search, text analysis, multimodal stubs); ``oracle_sql()``
provides DuckDB-equivalent SQL for every SQL-expressible entry (the
remaining entries are approximate/stateful/index-building operators that
get the driver's rows-only check — rank identity for those is enforced by
the pytest oracle instead, see tests/test_build_query.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from open_source_search_engine_ray.pipelines import (
    curation,
    dedup,
    doc_search,
    engine_docs,
    multimodal,
    relational,
    sampling,
    similarity,
    text_analysis,
    transcripts_flagship,
)


def entry() -> Any:
    """Flagship: build the inverted index over the smoke-scale synthetic
    transcripts corpus and answer the reference query set."""
    return transcripts_flagship.transcripts_bm25_topk(
        "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship search engine (transcripts corpus)
        "transcripts_bm25_topk": transcripts_flagship.transcripts_bm25_topk,
        "transcripts_bm25_prox_topk":
            transcripts_flagship.transcripts_bm25_prox_topk,
        "transcripts_doc_stats": transcripts_flagship.transcripts_doc_stats,
        "transcripts_index_manifests":
            transcripts_flagship.transcripts_index_manifests,
        "transcripts_search_snippets":
            transcripts_flagship.transcripts_search_snippets,
        "transcripts_search_snippets_dedup":
            transcripts_flagship.transcripts_search_snippets_dedup,
        "transcripts_spell_suggest":
            transcripts_flagship.transcripts_spell_suggest,
        "transcripts_search_budgeted":
            transcripts_flagship.transcripts_search_budgeted,
        "transcripts_doc_prior_topk":
            transcripts_flagship.transcripts_doc_prior_topk,
        "transcripts_search_parallel":
            transcripts_flagship.transcripts_search_parallel,
        "transcripts_search_lang":
            transcripts_flagship.transcripts_search_lang,
        "transcripts_facet_lang":
            transcripts_flagship.transcripts_facet_lang,
        "transcripts_related_terms":
            transcripts_flagship.transcripts_related_terms,
        "transcripts_delete_by_query":
            transcripts_flagship.transcripts_delete_by_query,
        # document search with SQL-replicable semantics
        "bm25_topk_docs": doc_search.bm25_topk_docs,
        "engine_bm25_docs": engine_docs.engine_bm25_docs,
        "doc_term_df": doc_search.doc_term_df,
        "doc_facet_dl": doc_search.doc_facet_dl,
        "doc_sortby_dl": doc_search.doc_sortby_dl,
        # curation verification set — kept EARLY so a time-budgeted
        # driver sweep reaches them before the expensive Jaccard /
        # curate entries (curation_report warms the curated-set cache
        # that curate_corpus below reuses, so total cost is unchanged)
        "curation_report": curation.curation_report,
        "decontaminate": curation.decontaminate,
        "pii_scan": curation.pii_scan,
        "pii_redact": curation.pii_redact,
        "embedding_kmeans": similarity.embedding_kmeans,
        # dedup family
        "exact_dedup": dedup.exact_dedup,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "dedup_clusters": dedup.dedup_clusters,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash_docs": dedup.simhash_docs,
        "repeated_ngram_spans": dedup.repeated_ngram_spans,
        "remove_repeated_spans": dedup.remove_repeated_spans,
        # similarity search
        "cosine_topk": similarity.cosine_topk,
        "lsh_cosine_topk": similarity.lsh_cosine_topk,
        "ivf_cosine_topk": similarity.ivf_cosine_topk,
        "embedding_neardup_pairs": similarity.embedding_neardup_pairs,
        "embedding_neardup_lsh": similarity.embedding_neardup_lsh,
        # text analysis
        "token_stats": text_analysis.token_stats,
        "bpe_token_count": text_analysis.bpe_token_count,
        "quality_score": text_analysis.quality_score,
        "lang_id": text_analysis.lang_id,
        "lang_id_ngram": text_analysis.lang_id_ngram,
        "fingerprint_docs": text_analysis.fingerprint_docs,
        "url_host_stats": text_analysis.url_host_stats,
        "top_terms": text_analysis.top_terms,
        # multimodal plumbing (decode stubbed, see module docstring)
        "multimodal_features": multimodal.multimodal_features,
        # relational / streaming
        "lineitem_pricing_summary": relational.lineitem_pricing_summary,
        "orders_by_nation": relational.orders_by_nation,
        "parts_profit_by_nation": relational.parts_profit_by_nation,
        "customers_without_orders": relational.customers_without_orders,
        "top_parts_per_brand": relational.top_parts_per_brand,
        "events_hourly_window": relational.events_hourly_window,
        "events_sessionize": relational.events_sessionize,
        "events_asof_join": relational.events_asof_join,
        "events_window_join": relational.events_window_join,
        "events_hopping_window": relational.events_hopping_window,
        "events_funnel": relational.events_funnel,
        "events_value_quantiles": relational.events_value_quantiles,
        "order_priority_revenue": relational.order_priority_revenue,
        # training-data curation
        "stratified_sample": sampling.stratified_sample,
        "sample_k_per_group": sampling.sample_k_per_group,
        "train_split": sampling.train_split,
        "pack_sequences": sampling.pack_sequences,
        "curate_corpus": curation.curate_corpus,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk_docs": doc_search.bm25_topk_docs_sql(),
        "engine_bm25_docs": engine_docs.engine_bm25_docs_sql(),
        "doc_term_df": doc_search.doc_term_df_sql(),
        "doc_facet_dl": doc_search.doc_facet_dl_sql(),
        "doc_sortby_dl": doc_search.doc_sortby_dl_sql(),
        "exact_dedup": dedup.exact_dedup_sql(),
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs_sql(),
        "dedup_clusters": dedup.dedup_clusters_sql(),
        "repeated_ngram_spans": dedup.repeated_ngram_spans_sql(),
        "remove_repeated_spans": dedup.remove_repeated_spans_sql(),
        "cosine_topk": similarity.cosine_topk_sql(),
        "embedding_neardup_pairs": similarity.embedding_neardup_pairs_sql(),
        "token_stats": text_analysis.token_stats_sql(),
        "bpe_token_count": text_analysis.bpe_token_count_sql(),
        "quality_score": text_analysis.quality_score_sql(),
        "lang_id": text_analysis.lang_id_sql(),
        "top_terms": text_analysis.top_terms_sql(),
        "lineitem_pricing_summary":
            relational.lineitem_pricing_summary_sql(),
        "orders_by_nation": relational.orders_by_nation_sql(),
        "parts_profit_by_nation": relational.parts_profit_by_nation_sql(),
        "customers_without_orders":
            relational.customers_without_orders_sql(),
        "top_parts_per_brand": relational.top_parts_per_brand_sql(),
        "events_hourly_window": relational.events_hourly_window_sql(),
        "events_sessionize": relational.events_sessionize_sql(),
        "events_asof_join": relational.events_asof_join_sql(),
        "events_window_join": relational.events_window_join_sql(),
        "events_hopping_window": relational.events_hopping_window_sql(),
        "events_funnel": relational.events_funnel_sql(),
        "events_value_quantiles": relational.events_value_quantiles_sql(),
        "order_priority_revenue": relational.order_priority_revenue_sql(),
        "stratified_sample": sampling.stratified_sample_sql(),
        "sample_k_per_group": sampling.sample_k_per_group_sql(),
        "train_split": sampling.train_split_sql(),
        "pack_sequences": sampling.pack_sequences_sql(),
        "curate_corpus": curation.curate_corpus_sql(),
        "curation_report": curation.curation_report_sql(),
        "decontaminate": curation.decontaminate_sql(),
        "pii_scan": curation.pii_scan_sql(),
        "pii_redact": curation.pii_redact_sql(),
    }
