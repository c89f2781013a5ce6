"""Similarity search over the embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline; LSH-bucketed
ANN (deterministic md5-seeded hyperplanes) is the scale path — at
10^12 rows the cross product is impossible, but hyperplane buckets
cut candidates by ~2^n_planes while staying pure DataFrame ops.
Dot products run JVM-side via ``zip_with``/``aggregate``; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_PLANES = 4


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y), "
        f"0D, (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> cast(x as double) * x), "
            f"0D, (acc, v) -> acc + v)"
        )
    )


def cosine_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k against one query vector (broadcast)."""
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q")
    )
    scored = (
        e.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot("embedding", "q")
                / (_norm("embedding") * _norm("q")),
                4,
            ).alias("cos"),
        )
    )
    return scored.orderBy(F.col("cos").desc(), F.col("vec_id")).limit(k)


def cosine_neardup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.30
) -> DataFrame:
    """Embedding near-dup pairs, blocked by label (at scale the block
    key would be a coarse LSH bucket; the label stands in for it)."""
    e = _emb(spark, sf_dir).select(
        "vec_id", "label", "embedding", _norm("embedding").alias("nrm")
    )
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.round(
                _dot("a.embedding", "b.embedding")
                / (F.col("a.nrm") * F.col("b.nrm")),
                4,
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def _bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every vector an LSH bucket: sign bits of dot products with
    N_PLANES md5-derived ±1 hyperplanes (deterministic, seedless)."""
    e = _emb(spark, sf_dir)
    exploded = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    )
    planes = exploded.select(
        "vec_id",
        "pos",
        "val",
        F.explode(F.sequence(F.lit(0), F.lit(N_PLANES - 1))).alias("plane"),
    )
    signed = planes.withColumn(
        "w",
        F.when(
            F.substring(
                F.md5(F.format_string("%d_%d", F.col("plane"), F.col("pos"))),
                1,
                1,
            )
            >= "8",
            F.col("val"),
        ).otherwise(-F.col("val")),
    )
    dots = signed.groupBy("vec_id", "plane").agg(F.sum("w").alias("dot"))
    bits = dots.groupBy("vec_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("plane", (F.col("dot") > 0).alias("bit"))
                    )
                ),
                lambda s: F.when(s["bit"], "1").otherwise("0"),
            ),
        ).alias("bucket")
    )
    return e.join(bits, "vec_id")


def lsh_ann_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """ANN: candidates restricted to the query's LSH bucket plus all
    Hamming-distance-1 buckets (multi-probe — the standard recall fix
    for hyperplane LSH), then exact cosine within the probe set."""
    bucketed = _bucketed(spark, sf_dir)
    # probe set: query bucket + each single-bit flip
    flips = [
        F.concat(
            F.substring("bucket", 1, j),
            F.when(F.substring("bucket", j + 1, 1) == "1", "0").otherwise("1"),
            F.substring("bucket", j + 2, N_PLANES),
        )
        for j in range(N_PLANES)
    ]
    q = bucketed.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q"),
        F.array(F.col("bucket"), *flips).alias("probes"),
    )
    cands = (
        bucketed.crossJoin(F.broadcast(q))
        .where(
            F.array_contains(F.col("probes"), F.col("bucket"))
            & (F.col("vec_id") != query_vec_id)
        )
        .select(
            "vec_id",
            F.round(
                _dot("embedding", "q") / (_norm("embedding") * _norm("q")), 4
            ).alias("cos"),
        )
    )
    return cands.orderBy(F.col("cos").desc(), F.col("vec_id")).limit(k)


def embedding_meanpool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 mean-pool (training_page_embedder.py:119-124 analogue):
    per-label centroid, emitted as (label, pos, avg_val) rows so the
    result stays a flat relational shape."""
    e = _emb(spark, sf_dir)
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .withColumn("pos", F.col("pos") + 1)
        .groupBy("label", "pos")
        .agg((F.round(F.avg("val"), 4) + F.lit(0.0)).alias("avg_val"))  # +0.0 kills -0.0
    )


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse quantizer: per-label centroids (IVF lists). At 10^12 rows
    the lists come from a sampled k-means; the label column stands in as
    the deterministic cluster structure of the test data."""
    e = _emb(spark, sf_dir)
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
        .select(F.col("label").alias("list_id"), "centroid")
    )


def ivf_ann_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style ANN: broadcast the centroid table, assign every vector
    to its nearest list, search only the query's ``n_probe`` nearest
    lists with exact cosine. One broadcast + one filter — no pairwise
    shuffle ever forms."""
    e = _emb(spark, sf_dir)
    cents = _centroids(spark, sf_dir)
    assigned = (
        e.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .withColumn("dist", _dot("embedding", "centroid"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("dist").desc(), F.col("list_id")
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "list_id")
    )
    q_lists = (
        e.where(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .crossJoin(F.broadcast(cents))
        .withColumn("dist", _dot("embedding", "centroid"))
        .orderBy(F.col("dist").desc(), F.col("list_id"))
        .limit(n_probe)
        .select("list_id")
    )
    q = e.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q")
    )
    cands = (
        assigned.join(F.broadcast(q_lists), on="list_id", how="left_semi")
        .where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot("embedding", "q") / (_norm("embedding") * _norm("q")), 4
            ).alias("cos"),
        )
    )
    return cands.orderBy(F.col("cos").desc(), F.col("vec_id")).limit(k)
