"""End-to-end corpus curation: the composition every pretraining
pipeline runs as its final assembly — quality gate x language filter x
exact-dedup keeper selection x deterministic train/test split.

Plan shape (the 100 TB question): quality, lang_pred, and split are
all per-row functions of one documents row, so they compute in ONE
projection over ONE scan (the reusable column forms in
:mod:`.textstats`); the only other input is the exact-dedup keeper
set, one hash-aggregate over a second scan, joined back on doc_id —
two scans, one shuffle join, no intermediate corpus materialized
(plan-tested in tests/test_plans.py).

Each ingredient is the already-driver-verified operator; the composed
oracle (``__spark_entry__``) is the identical join over the
ingredient oracles, so the composition itself is hash-checked too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup, textstats

MIN_QUALITY = 0.5


def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> curated (doc_id, lang_pred, quality, split):
    keep exact-dedup keepers whose quality clears MIN_QUALITY and
    whose language is identified."""
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id", "text", F.expr(textstats._TOKENS).alias("t")
        )
    )
    enriched = textstats.with_lang_pred(base, keep_scores=True).select(
        "doc_id",
        "lang_pred",
        # reuse the English stop-count the language vote just computed
        # instead of re-filtering the token array
        textstats.quality_expr(stop_en=F.col("sc_en")).alias("quality"),
        textstats.split_label_expr().alias("split"),
    )
    keepers = (
        dedup.exact_dedup(spark, sf_dir)
        .select(F.col("keeper_id").alias("doc_id"))
        .distinct()
    )
    return (
        enriched.join(keepers, "doc_id")
        .where(
            (F.col("quality") >= MIN_QUALITY)
            & (F.col("lang_pred") != "und")
        )
        .select("doc_id", "lang_pred", "quality", "split")
    )
