"""End-to-end corpus curation: the composition every pretraining
pipeline runs as its final assembly — quality gate x language filter x
exact-dedup keeper selection x deterministic train/test split — joined
into ONE declarative plan so Catalyst fuses the stages (all four
inputs scan the same table; the joins are doc_id-partitioned
hash joins with partial aggregation below them, no operator
materializes an intermediate corpus).

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
    q = textstats.quality_score(spark, sf_dir).select("doc_id", "quality")
    lang = textstats.lang_id(spark, sf_dir)
    keepers = (
        dedup.exact_dedup(spark, sf_dir)
        .select(F.col("keeper_id").alias("doc_id"))
        .distinct()
    )
    split = textstats.train_test_split(spark, sf_dir).select(
        "doc_id", "split"
    )
    return (
        q.join(lang, "doc_id")
        .join(keepers, "doc_id")
        .join(split, "doc_id")
        .where(
            (F.col("quality") >= MIN_QUALITY)
            & (F.col("lang_pred") != "und")
        )
        .select("doc_id", "lang_pred", "quality", "split")
    )
