#!/usr/bin/env python
"""A/B the two _capped_buckets strategies (VERDICT r4 item 1).

Interleaved best-of-N timing of every bucket-pair pipeline under the
"window" (r4) and "semijoin" (r5) cap shapes at $SPARK_GRAFT_SF_DIR.
Writes BENCH/capped_ab.json: per-query best wall time per strategy.
Benchmarks drift 2-3x on this VM -> interleave rounds and keep the
minimum (BENCH/BASELINE.md policy).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("capped-ab")
        .config("spark.sql.shuffle.partitions", str(max(8, CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.local.dir", "/dev/shm/spark-tmp")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from service1_text_extraction_spark.functions import dedup, similarity

    queries = {
        "dedup_minhash": dedup.minhash_band_candidates,
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        "dedup_simhash_neardup": dedup.simhash_neardup_pairs,
        "neardup_cosine": similarity.cosine_neardup_pairs,
        "semantic_dedup": similarity.semantic_dedup,
    }

    # warm the JVM + page cache once
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()

    best: dict[str, dict[str, float]] = {
        name: {} for name in queries
    }
    counts: dict[str, dict[str, int]] = {name: {} for name in queries}
    for rnd in range(ROUNDS):
        for strat in ("semijoin", "window"):
            dedup.CAP_STRATEGY = strat
            for name, fn in queries.items():
                spark.catalog.clearCache()  # level the persist field
                t0 = time.monotonic()
                n = fn(spark, SF_DIR).count()
                dt = time.monotonic() - t0
                cur = best[name].get(strat)
                if cur is None or dt < cur:
                    best[name][strat] = round(dt, 3)
                counts[name][strat] = n
                print(
                    f"r{rnd} {strat:8s} {name:22s} {dt:7.3f}s  rows={n}",
                    flush=True,
                )
    dedup.CAP_STRATEGY = "window"  # restore the module default

    # result parity: both strategies must produce identical row counts
    mismatch = {
        n: c for n, c in counts.items()
        if len(set(c.values())) != 1
    }
    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "rounds": ROUNDS,
        "best_sec": best,
        "row_counts": counts,
        "count_mismatch": mismatch,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    label = os.path.basename(SF_DIR.rstrip("/"))
    with open(
        os.path.join(REPO, "BENCH", f"capped_ab_{label}.json"), "w"
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
