#!/usr/bin/env python
"""A/B the two MinHash signature strategies (round 6).

Interleaved best-of-N timing of the MinHash family under the "sql"
(explode+distinct+groupBy) and "arrow" (per-doc Arrow map) signature
shapes at $SPARK_GRAFT_SF_DIR. Writes BENCH/minhash_ab_{label}.json:
per-query best wall time per strategy plus row-count parity.
Benchmarks drift 2-3x on this VM -> interleave rounds and keep the
minimum (BENCH/BASELINE.md policy). Materialization is a noop WRITE,
not count(): count() lets Catalyst prune the signature projection
entirely (the Arrow UDF would never run).
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
        .appName("minhash-ab")
        .config("spark.sql.shuffle.partitions", str(max(8, CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.local.dir", "/dev/shm/spark-tmp")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from service1_text_extraction_spark.functions import dedup

    queries = {
        "minhash_signatures": dedup.minhash_signatures,
        "dedup_minhash_candidates": dedup.minhash_band_candidates,
        "dedup_minhash_cc": dedup.minhash_connected_components,
    }

    # warm the JVM + page cache once
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    best: dict[str, dict[str, float]] = {name: {} for name in queries}
    counts: dict[str, dict[str, int]] = {name: {} for name in queries}
    for rnd in range(ROUNDS):
        for strat in ("sql", "arrow"):
            dedup.MINHASH_STRATEGY = strat
            for name, fn in queries.items():
                spark.catalog.clearCache()
                t0 = time.monotonic()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                n = df.count()
                cur = best[name].get(strat)
                if cur is None or dt < cur:
                    best[name][strat] = round(dt, 3)
                counts[name][strat] = n
                print(
                    f"r{rnd} {strat:6s} {name:26s} {dt:7.3f}s  rows={n}",
                    flush=True,
                )
    dedup.MINHASH_STRATEGY = "arrow"  # restore the module default

    mismatch = {
        n: c for n, c in counts.items() if len(set(c.values())) != 1
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
        os.path.join(REPO, "BENCH", f"minhash_ab_{label}.json"), "w"
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
