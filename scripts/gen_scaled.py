#!/usr/bin/env python
"""Deterministically scale the driver testdata for large-SF benching.

Writes .bench_cache/sf<label>/documents.parquet + embeddings.parquet:
REPLICAS copies of the sf0.1 tables with disjoint id ranges. Document
replicas append a per-replica salt token (so replicas are NEAR-dups —
the realistic stress for the banding/verify family, and no mega
duplicate clusters of exact copies); embedding replicas perturb one
deterministic coordinate by a tiny replica-dependent delta.

Pure id/text arithmetic — reproducible across runs and engines; no
randomness, no timestamps. Usage:
    python scripts/gen_scaled.py [REPLICAS]   # default 10 -> sf1
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")
ID_OFFSET = 10_000_000


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    label = f"sf1x{replicas}" if replicas != 10 else "sf1"
    out_dir = os.path.join(REPO, ".bench_cache", label)
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        # events.parquet was added to the replica set after the first
        # sf1 build: backfill it without regenerating docs/embeddings
        if not os.path.exists(os.path.join(out_dir, "events.parquet")):
            _gen_events(out_dir, replicas)
        print(out_dir)
        return

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("gen-scaled")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.local.dir", "/dev/shm/spark-tmp")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    text = F.when(F.col("rep") == 0, F.col("text")).otherwise(
        F.concat(
            F.col("text"),
            F.lit(" rep"),
            F.col("rep").cast("string"),
            F.lit(" salt"),
            ((F.col("doc_id") * 31 + F.col("rep")) % 9973).cast("string"),
        )
    )
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * ID_OFFSET).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).cast(docs.schema["n_chars"].dataType)
            .alias("n_chars"),
            "rep",
        )
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim_col = F.pmod(F.col("rep"), F.size("embedding")).cast("int")
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x
            + F.when(i == dim_col, F.col("rep").cast("float") * 0.001)
            .otherwise(F.lit(0.0))
            .cast("float")
        ).cast("float"),
    )
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * ID_OFFSET).alias("vec_id"),
            perturbed.alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )
    spark.stop()
    _gen_events(out_dir, replicas)
    with open(os.path.join(out_dir, "_DONE"), "w") as f:
        f.write(f"replicas={replicas} src={SRC}\n")
    print(out_dir)


def _gen_events(out_dir: str, replicas: int) -> None:
    """Replicate events with disjoint event_id AND user_id ranges —
    weak scaling over users (the realistic 100 TB shape: a bigger
    corpus has more users, not 10x the events per user), so per-user
    window/join sizes stay constant while total volume grows."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("gen-scaled-events")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.local.dir", "/dev/shm/spark-tmp")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * ID_OFFSET)
            .alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * ID_OFFSET)
            .alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "events.parquet"))
    )
    spark.stop()


if __name__ == "__main__":
    main()
