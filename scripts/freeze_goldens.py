#!/usr/bin/env python
"""Freeze full-output hash goldens for the non-SQL-expressible sinks.

``assemble_docs`` and ``layout_text`` have no DuckDB oracle (the
extraction kernels are not SQL); their driver rows are rows-only. This
script pins their FULL output at sf0.001 as md5-rollup parquet under
``tests/data`` — any later kernel/assembly change that alters one byte
of any document or layout artifact fails ``test_frozen_golden.py``
even if the row count is unchanged.

Rerun deliberately (and commit the diff) only when an output change is
intended and reviewed.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
DATA = os.path.join(REPO, "tests", "data")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # the driver queries now emit the golden schema directly (md5
    # rollups) — freezing is just materializing their output
    assembled = entrymod._q_assemble_docs(spark, SF_DIR)
    assembled.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(DATA, "golden_assembled.parquet")
    )

    layout = entrymod._q_layout_text(spark, SF_DIR)
    layout.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(DATA, "golden_layout.parquet")
    )
    print(
        "frozen:",
        assembled.count(),
        "assembled docs,",
        layout.count(),
        "layout turns",
    )
    spark.stop()


if __name__ == "__main__":
    main()
