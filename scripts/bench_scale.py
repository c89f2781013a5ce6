#!/usr/bin/env python
"""Data-size scaling evidence (VERDICT r4 item 2): the full
documents/embeddings query suite timed at sf0.1 AND at the
deterministic 10x replica corpus (scripts/gen_scaled.py ->
.bench_cache/sf1), plus the extraction kernel at the sf1-equivalent
2M-turn transcript load.

Per query: best-of-ROUNDS interleaved wall time at both scales, the
t10x/t0.1 ratio, and the implied scaling exponent
exp = ln(ratio)/ln(10). Linear work with fixed per-job overhead
lands below 1.0; anything with ratio > SUPERLINEAR_RATIO (a 10x
corpus costing > ~13x, i.e. past the n log n envelope) is FLAGGED.
Writes BENCH/sf_scaling.json; the narrative lives in BENCH/BASELINE.md.

Caveat recorded in the output: the semantic/kNN family runs a FIXED
k=10 quantizer, so at 10x every cluster exceeds SEM_MAX_CLUSTER and
the cap refuses pair expansion (0 rows) — that IS the designed 100 TB
mega-cluster behavior (production grows k with the corpus), so those
timings measure the quantize+cap path, not pair scoring.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = os.path.join(REPO, ".bench_cache", "sf1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("SCALE_ROUNDS", "2"))
SUPERLINEAR_RATIO = 13.0
EXTRACT_TURNS_SMALL = 200_000
EXTRACT_TURNS_BIG = 2_000_000

DOC_QUERIES = [
    "dedup_exact", "dedup_minhash_candidates", "dedup_minhash_clusters",
    "dedup_minhash_cc", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_simhash_neardup", "duplicate_passages", "dedup_verified_pairs",
    "decontaminate", "lang_id", "quality_score", "token_counts",
    "doc_fingerprint", "tfidf_top_terms", "pack_sequences",
    "train_test_split", "curate_corpus", "gopher_repetition",
    "gopher_quality", "c4_line_stats", "pii_redact", "dsir_weights",
    "sample_by_source", "vocab_top_terms", "vocab_oov", "admit_corpus",
    "unigram_logprob", "chunk_counts", "clean_unicode_sql",
    "normalize_ws_sql", "s3_uri_split",
    "dup_passage_fraction", "c4_span_dedup", "hll_distinct_shingles",
    "bloom_decontaminate", "cms_heavy_hitters", "bm25_topk",
    "minhash_source_jaccard", "split_leak_safe", "char_entropy",
    "cluster_keepers_degree", "pagerank_candidates", "source_overlap_stats",
    "weighted_sample", "corpus_delta",
    # events-table operators (the sf1 replica carries a user-offset
    # 10x events table: weak scaling over users)
    "asof_join", "asof_join_salted", "range_join_bucketed",
    "hdr_value_quantiles", "hopping_window_stats", "funnel_steps",
    "session_window_stats", "hopping_distinct_users",
]
EMB_QUERIES = [
    "kmeans_assign", "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
    "rrf_fusion",
    "neardup_cosine_pairs", "semantic_dedup", "semantic_keepers",
    "knn_join", "knn_join_multiprobe", "embedding_meanpool",
]
CAPPED_AT_10X = {
    "neardup_cosine_pairs", "semantic_dedup", "semantic_keepers",
    "knn_join", "knn_join_multiprobe",
}


def main() -> None:
    if not os.path.exists(os.path.join(BIG, "_DONE")):
        sys.exit("run scripts/gen_scaled.py first")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sf-scaling")
        .config("spark.sql.shuffle.partitions", str(max(8, CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.local.dir", "/dev/shm/spark-tmp")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    names = DOC_QUERIES + EMB_QUERIES
    # SCALE_ONLY=a,b,c: time just those queries and MERGE their rows
    # into the existing BENCH/sf_scaling.json (so adding one operator
    # does not force re-running the 400 s+ full suite); the extraction
    # phase is skipped in that mode.
    only = [n for n in os.environ.get("SCALE_ONLY", "").split(",") if n]
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            sys.exit(f"SCALE_ONLY names not in queries(): {unknown}")
        names = only
    for d in (SMALL, BIG):  # warm page cache + JVM
        spark.read.parquet(f"{d}/documents.parquet").count()
        spark.read.parquet(f"{d}/embeddings.parquet").count()
        if os.path.exists(f"{d}/events.parquet"):
            spark.read.parquet(f"{d}/events.parquet").count()

    best: dict[str, dict[str, float]] = {n: {} for n in names}
    rows: dict[str, dict[str, int]] = {n: {} for n in names}
    for rnd in range(ROUNDS):
        for scale, d in (("sf0.1", SMALL), ("sf1", BIG)):
            for name in names:
                # noop WRITE, not count(): a count() would let Catalyst
                # prune every projection (pure-projection queries and
                # the extraction UDF would measure as a bare scan).
                # Construction sits INSIDE the timer: the iterative
                # queries (connected components, semantic keepers, IVF)
                # do real eager work there (localCheckpoint / driver
                # collect loops).
                t0 = time.monotonic()
                df = qs[name](spark, d)
                df.write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                cur = best[name].get(scale)
                if cur is None or dt < cur:
                    best[name][scale] = round(dt, 3)
                if rnd == 0:
                    rows[name][scale] = df.count()
                print(f"r{rnd} {scale:6s} {name:26s} {dt:7.2f}s",
                      flush=True)

    # extraction kernel at both turn loads (one run each — the
    # long-soak numbers in BENCH/BASELINE.md corroborate)
    from service1_text_extraction_spark.pipeline import run_extraction
    from service1_text_extraction_spark.pipeline.datagen import (
        generate_transcripts,
    )

    extract = {}
    for label, target in () if only else (
        ("sf0.1", EXTRACT_TURNS_SMALL), ("sf1", EXTRACT_TURNS_BIG)
    ):
        cache = os.path.join(REPO, ".bench_cache", f"transcripts_x{target}")
        if not os.path.exists(os.path.join(cache, "_SUCCESS")):
            t, _ = generate_transcripts(
                seed=42, with_golden=False, target_turns=target,
                max_turns=2_000,
            )
            spark.createDataFrame(t).repartition(CPUS).write.mode(
                "overwrite"
            ).parquet(cache)
        tdf = spark.read.parquet(cache)
        n = tdf.count()
        out = run_extraction(spark, tdf, n_buckets=max(32, CPUS))
        t0 = time.monotonic()
        out.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        extract[label] = {"sec": round(dt, 3), "turns": n,
                          "turns_per_sec": round(n / dt, 1)}
        print(f"extract_turns {label}: {dt:.2f}s {n} turns", flush=True)

    report = {}
    flagged = []
    for name in names:
        t0, t1 = best[name]["sf0.1"], best[name]["sf1"]
        ratio = round(t1 / t0, 2)
        exp = round(math.log(max(ratio, 1e-9)) / math.log(10.0), 3)
        report[name] = {
            "sf0.1_sec": t0, "sf1_sec": t1, "ratio": ratio,
            "exponent": exp,
            "rows": rows[name],
            "capped_by_design": name in CAPPED_AT_10X,
        }
        if ratio > SUPERLINEAR_RATIO and name not in CAPPED_AT_10X:
            flagged.append(name)
    path = os.path.join(REPO, "BENCH", "sf_scaling.json")
    if only:
        with open(path) as f:
            out = json.load(f)
        out["queries"].update(report)
        out["flagged_superlinear"] = sorted(
            set(out.get("flagged_superlinear", [])) - set(names)
            | set(flagged)
        )
        ex_ratio = out["extract_turns"]["ratio"]
    else:
        ex_ratio = round(
            extract["sf1"]["sec"] / extract["sf0.1"]["sec"], 2
        )
        out = {
            "cpus": CPUS, "rounds": ROUNDS,
            "small": SMALL, "big": BIG, "scale_factor": 10,
            "superlinear_ratio_threshold": SUPERLINEAR_RATIO,
            "queries": report,
            "extract_turns": {**extract, "ratio": ex_ratio,
                              "exponent": round(
                                  math.log(ex_ratio) / math.log(10.0),
                                  3)},
            "flagged_superlinear": flagged,
        }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"flagged_superlinear": out["flagged_superlinear"],
                      "extract_ratio": ex_ratio}))
    spark.stop()


if __name__ == "__main__":
    main()
