#!/usr/bin/env python
"""Skewed-conversation scaling session (VERDICT r5 item 6).

The default `run_extraction` plan maps the extraction UDF over scan
splits, so ordinary conv_id skew is invisible to it — parquet splits
spread payload bytes evenly no matter how conversations are laid out.
The pathological layout the salted path exists for is a NON-SPLITTABLE
input partition that holds one giant conversation: a single parquet
file written as one row group (here via parquet.block.size=1g) must be
read by ONE task, so every payload byte of the mega-conversation
funnels through one core regardless of cluster size.

This script constructs exactly that corpus deterministically from the
cached sf0.1 transcripts (~60% of turns remapped to one conv_id and
written as a single 1-row-group file; the rest written normally), then
runs the SAME job four ways — {unsalted, salted} × {local[N],
local[4N]} — interleaved, and reports raw N-vs-4N scaling efficiency
per mode plus the salted/unsalted speedup at 4N.

Expected shape: unsalted efficiency collapses toward 1/4N (the serial
mega-task dominates wall clock at every level) while the salted path
(`pre_shuffle=True`: repartition by (bucket_id, turn_idx % salt)
before the UDF) restores near-linear scaling at the cost of one extra
exchange of the raw payload bytes.

Writes BENCH/skew_scaling.json and appends one entry per mode to
BENCH/scaling_history.jsonl (tagged scenario="zipf_skew_nonsplittable"
so the main scaling distribution can be segmented).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_CACHE = os.path.join(REPO, ".bench_cache", "transcripts_sf0.1")
SKEW_DIR = os.path.join(REPO, ".bench_cache", "skew_corpus")
LEVELS = tuple(
    int(x) for x in os.environ.get("SCALING_LEVELS", "4,16").split(",")
)
REPS = int(os.environ.get("SCALING_REPS", "2"))
# fraction of turns remapped into the single mega conversation
MEGA_FRAC = 0.6
SALT = 64

BUILD_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F, Window

spark = (SparkSession.builder.master("local[16]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
t = spark.read.parquet({src!r})
# deterministic 60% of conversations -> one mega conversation
is_mega = F.pmod(F.xxhash64("conv_id"), F.lit(10)) < F.lit(6)
mega = t.where(is_mega).withColumn(
    "conv_id", F.lit("megaconv")
).withColumn(
    # re-index turn_idx so the (conv_id, turn_idx) window key stays
    # unique; original order preserved for determinism
    "turn_idx",
    F.row_number().over(
        Window.partitionBy("conv_id").orderBy("turn_idx", "text")
    ),
)
# ONE file, ONE row group: parquet.block.size=1g makes the mega file
# non-splittable, so its scan is a single task at any core count
(mega.coalesce(1).write.mode("overwrite")
    .option("parquet.block.size", str(1 << 30))
    .parquet({skew!r} + "/mega"))
(t.where(~is_mega).repartition(32).write.mode("overwrite")
    .parquet({skew!r} + "/rest"))
spark.stop()
"""

RUN_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
cores = int(sys.argv[1])
salted = sys.argv[2] == "salted"
spark = (SparkSession.builder.master(f"local[{{cores}}]")
    .config("spark.sql.shuffle.partitions", str(4 * cores))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.local.dir", "/dev/shm/spark-tmp")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from service1_text_extraction_spark.pipeline import run_extraction
t = spark.read.parquet({skew!r} + "/mega", {skew!r} + "/rest")
n = t.count()
run_extraction(spark, t.limit(512), n_buckets=4).write.format(
    "noop").mode("overwrite").save()
kw = (dict(pre_shuffle=True, salt={salt}, shuffle_partitions=4 * cores)
      if salted else {{}})
t0 = time.perf_counter()
run_extraction(spark, t, n_buckets=64, **kw).write.format(
    "noop").mode("overwrite").save()
sec = time.perf_counter() - t0
print(json.dumps({{"cores": cores, "turns": n, "sec": round(sec, 2),
                   "turns_per_sec": round(n / sec, 1)}}))
spark.stop()
"""


def build_corpus() -> None:
    if os.path.exists(os.path.join(SKEW_DIR, "rest", "_SUCCESS")):
        return
    script = BUILD_CHILD.format(repo=REPO, src=SRC_CACHE, skew=SKEW_DIR)
    subprocess.run(
        [sys.executable, "-c", script], check=True, cwd=REPO
    )


def run_child(cores: int, mode: str) -> dict:
    script = RUN_CHILD.format(repo=REPO, skew=SKEW_DIR, salt=SALT)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), mode],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _best(runs: list[dict]) -> dict:
    return min(runs, key=lambda r: r["sec"])


def main() -> None:
    build_corpus()
    n, n4 = LEVELS
    runs: dict[tuple[str, int], list[dict]] = {}
    for _ in range(REPS):
        # interleave all four cells — this VM drifts 2-3x over minutes
        for mode in ("unsalted", "salted"):
            for cores in (n, n4):
                runs.setdefault((mode, cores), []).append(
                    run_child(cores, mode)
                )
                r = runs[(mode, cores)][-1]
                print(f"{mode} local[{cores}]: {r['sec']}s "
                      f"({r['turns_per_sec']} turns/s)", flush=True)

    summary: dict = {
        "scenario": "zipf_skew_nonsplittable",
        "mega_frac": MEGA_FRAC,
        "salt": SALT,
        "levels": {"N": n, "4N": n4},
        "input_turns": runs[("unsalted", n)][0]["turns"],
    }
    history = []
    for mode in ("unsalted", "salted"):
        lo, hi = _best(runs[(mode, n)]), _best(runs[(mode, n4)])
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (n4 / n)
        summary[mode] = {
            f"local[{n}]": lo,
            f"local[{n4}]": hi,
            "all_runs": {
                f"local[{n}]": [r["sec"] for r in runs[(mode, n)]],
                f"local[{n4}]": [r["sec"] for r in runs[(mode, n4)]],
            },
            "raw_efficiency": round(eff, 3),
        }
        history.append({
            "scenario": "zipf_skew_nonsplittable",
            "mode": mode,
            "levels": summary["levels"],
            "input_turns": summary["input_turns"],
            "spark": {f"local[{n}]": lo, f"local[{n4}]": hi},
            "raw_efficiency": round(eff, 3),
        })
    summary["salted_speedup_at_4N"] = round(
        summary["unsalted"][f"local[{n4}]"]["sec"]
        / summary["salted"][f"local[{n4}]"]["sec"],
        2,
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "skew_scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    with open(
        os.path.join(REPO, "BENCH", "scaling_history.jsonl"), "a"
    ) as f:
        for h in history:
            f.write(json.dumps(h) + "\n")
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
