"""The bench.py query registry as data, importable by bench_extra.py
(bench.py itself is frozen for measurement and keeps its own copy)."""

from __future__ import annotations

from service1_text_extraction_spark.functions import (
    curate,
    dedup,
    jsonfuncs,
    relational,
    similarity,
    textstats,
)

FRAMES = {
    "dedup_minhash_candidates": dedup.minhash_band_candidates,
    "dedup_simhash": dedup.simhash_fingerprints,
    "dedup_exact": dedup.exact_dedup,
    "dedup_minhash_clusters": dedup.minhash_clusters,
    "dedup_simhash_neardup": dedup.simhash_neardup_pairs,
    "dedup_minhash_cc": dedup.minhash_connected_components,
    "duplicate_passages": dedup.duplicate_passages,
    "ann_cosine_topk": similarity.cosine_topk,
    "kmeans_assign": similarity.kmeans_assign,
    "ann_ivf_topk": similarity.ivf_ann_topk,
    "ann_lsh_topk": similarity.lsh_ann_topk,
    "json_sanitize": jsonfuncs.json_sanitize,
    "neardup_cosine_pairs": similarity.cosine_neardup_pairs,
    "pricing_summary": relational.pricing_summary,
    "broadcast_dim_rollup": relational.broadcast_dim_rollup,
    "sessionize": relational.sessionize,
    "token_counts": textstats.token_counts,
    "doc_fingerprint": textstats.doc_fingerprint,
    "tfidf_top_terms": textstats.tfidf_top_terms,
    "decontaminate": dedup.decontaminate,
    "pack_sequences": textstats.pack_sequences,
    "curate_corpus": curate.curate_corpus,
    "semantic_dedup": similarity.semantic_dedup,
    "semantic_keepers": similarity.semantic_keepers,
    "gopher_repetition": textstats.gopher_repetition,
    "gopher_quality": textstats.gopher_quality,
    "c4_line_stats": textstats.c4_line_stats,
    "pii_redact": textstats.pii_redact,
    "dsir_weights": textstats.dsir_weights,
    "sample_by_source": curate.sample_by_source,
    "vocab_top_terms": textstats.vocab_top_terms,
    "vocab_oov": textstats.vocab_oov,
    "admit_corpus": curate.admit_corpus,
    "knn_join": similarity.knn_join,
    "knn_join_multiprobe": similarity.knn_join_multiprobe,
    "unigram_logprob": textstats.unigram_logprob,
    "bigram_logprob": textstats.bigram_logprob,
    "trigram_logprob": textstats.trigram_logprob,
    "ccnet_ppl_buckets": textstats.ccnet_ppl_buckets,
    "contamination_fraction": dedup.contamination_fraction,
    "dup_passage_fraction": dedup.dup_passage_fraction,
    "c4_span_dedup": dedup.c4_span_dedup,
    "hll_distinct_shingles": dedup.hll_distinct_shingles,
    "sample_exact_quota": curate.sample_exact_quota,
    "asof_join": relational.asof_join,
    "asof_join_salted": relational.asof_join_salted,
    "hdr_value_quantiles": relational.hdr_value_quantiles,
    "range_join_bucketed": relational.range_join_bucketed,
    "bloom_decontaminate": dedup.bloom_decontaminate,
    "cms_heavy_hitters": textstats.cms_heavy_hitters,
    "bm25_topk": textstats.bm25_topk,
    "minhash_source_jaccard": dedup.minhash_source_jaccard,
    "split_leak_safe": curate.split_leak_safe,
    "hopping_window_stats": relational.hopping_window_stats,
    "char_entropy": textstats.char_entropy,
    "weighted_sample": curate.weighted_sample,
    "corpus_delta": curate.corpus_delta,
    "funnel_steps": relational.funnel_steps,
    "rrf_fusion": similarity.rrf_fusion,
    "cluster_keepers_degree": dedup.cluster_keepers_degree,
    "session_window_stats": relational.session_window_stats,
    "hopping_distinct_users": relational.hopping_distinct_users,
    "pagerank_candidates": dedup.pagerank_candidates,
    "source_overlap_stats": dedup.source_overlap_stats,
    "dedup_verified_pairs": dedup.minhash_verified_pairs,
}


def frame(spark, sf_dir, name):
    return FRAMES[name](spark, sf_dir)


def build(spark, sf_dir, wrap):
    return {name: wrap(fn) for name, fn in FRAMES.items()}
