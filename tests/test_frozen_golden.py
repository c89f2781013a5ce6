"""Frozen-fixture gate: the committed golden parquet locks the
extraction semantics across rounds.

Unlike test_pipeline.py (which generates goldens with the same
kernels at test time), these fixtures were frozen at commit time —
any later kernel change that alters extraction output for any of the
479 turns fails here, even if it is self-consistent."""

import os

from pyspark.sql import functions as F

from service1_text_extraction_spark.pipeline import run_extraction

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def test_frozen_golden_equality(spark):
    tdf = spark.read.parquet(f"{DATA}/golden_transcripts.parquet")
    gdf = spark.read.parquet(f"{DATA}/golden_turns.parquet")
    out = run_extraction(spark, tdf, n_buckets=16)
    joined = out.join(gdf, on=["conv_id", "turn_idx"], how="full_outer")
    bad = joined.where(
        ~F.col("text").eqNullSafe(F.col("expected_text"))
        | ~F.col("method").eqNullSafe(F.col("expected_method"))
        | ~F.col("chars_out").eqNullSafe(F.col("expected_chars_out"))
        | ~F.col("bytes_in").eqNullSafe(F.col("expected_bytes_in"))
        # null-safe: a NULL ratio on either side is a mismatch, not a
        # three-valued-logic escape
        | ~F.coalesce(
            F.abs(
                F.col("boilerplate_ratio")
                - F.col("expected_boilerplate_ratio")
            )
            <= 1e-12,
            F.lit(False),
        )
    )
    rows = bad.select(
        "conv_id", "turn_idx", "method", "expected_method",
        "text", "expected_text",
    ).limit(3).collect()
    assert not rows, rows
    assert out.count() == gdf.count() == 479


def _no_mismatch(spark, fresh, frozen, keys):
    j = fresh.join(frozen, on=keys, how="full_outer")
    conds = None
    for c in fresh.columns:
        if c in keys:
            continue
        bad = ~F.col(c).eqNullSafe(F.col(f"g_{c}"))
        conds = bad if conds is None else (conds | bad)
    rows = j.where(conds).limit(3).collect()
    assert not rows, rows


def test_frozen_assembled_docs(spark):
    """Full-output hash gate for the S6/S7 doc sink (no DuckDB oracle
    exists for the kernels): every document's assembled text md5, plus
    its metric rollup, must equal the committed golden."""
    import __spark_entry__ as entrymod

    fresh = entrymod._q_assemble_docs(spark, "/root/testdata/sf0.001")
    frozen = spark.read.parquet(f"{DATA}/golden_assembled.parquet")
    frozen = frozen.select(
        "conv_id", *[F.col(c).alias(f"g_{c}") for c in frozen.columns
                     if c != "conv_id"]
    )
    _no_mismatch(spark, fresh, frozen, ["conv_id"])
    assert fresh.count() == 500


def test_frozen_layout_text(spark):
    """Full-output hash gate for the S8 layout sink: per-PDF-turn
    layout_text md5 against the committed golden."""
    import __spark_entry__ as entrymod

    fresh = entrymod._q_layout_text(spark, "/root/testdata/sf0.001")
    frozen = spark.read.parquet(f"{DATA}/golden_layout.parquet")
    frozen = frozen.select(
        "conv_id", "turn_idx",
        *[F.col(c).alias(f"g_{c}") for c in frozen.columns
          if c not in ("conv_id", "turn_idx")],
    )
    _no_mismatch(spark, fresh, frozen, ["conv_id", "turn_idx"])
    assert fresh.count() == 307
