"""Similarity search over the embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline; LSH-bucketed
ANN (deterministic md5-seeded hyperplanes) is the scale path — at
10^12 rows the cross product is impossible, but hyperplane buckets
cut candidates by ~2^n_planes while staying pure DataFrame ops.
Pairwise dot products run JVM-side via ``zip_with``/``aggregate``
with one deliberate exception: the dense n x k centroid scoring at
large auto-k runs as an Arrow-batched numpy fold (``_fold_dots``) —
``zip_with``/``aggregate`` are interpreted (CodegenFallback) per row,
so expanding every vector to k>64 scored rows pays interpreted
expression eval AND an exchange, while the numpy fold is vectorized
over rows yet bit-equal to the JVM fold by construction (sequential
per-dimension accumulation — see ``_fold_dots``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

N_PLANES = 16
EMB_DIM = 64  # fixed test-table dimensionality (TESTDATA.md)
LSH_RADIUS = 4  # multi-probe Hamming radius


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .spread import spread_input

    return spread_input(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), key="vec_id"
    )


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * y), "
        f"0D, (acc, v) -> acc + v)"
    )


# Pair-scoring strategy for the candidate-pair cosine. "sql" (the
# measured default at the test tables' dim=64) evaluates the
# interpreted ``aggregate(zip_with(...))`` fold per pair; "arrow"
# ships both embedding columns through an Arrow batch and runs the
# numpy fold (dimension-sequential — identical IEEE operation order,
# bit-equal, pinned by test_pair_dot_paths_agree). Interleaved A/B at
# sf1.0 (20k vectors, dim 64): arrow LOST on every pair-heavy query
# (knn_join_multiprobe 3.1 -> 7.4 s, semantic_keepers 2.1 -> 4.9 s) —
# at 64 dims the per-pair Arrow transfer of two vectors outweighs the
# ~64 interpreted lambda steps it saves. At production dims (768+)
# the balance flips (the fold is 12x more work per transferred byte);
# flip the flag there — the kernel and its bit-equality pin ship
# ready.
PAIR_DOT_STRATEGY = "sql"


def _dot_pair_udf():
    @pandas_udf("double")
    def dotp(ea: pd.Series, eb: pd.Series) -> pd.Series:
        if len(ea) == 0:
            return pd.Series([], dtype="float64")
        A = _stack_emb(ea).astype(np.float64, copy=False)
        B = _stack_emb(eb).astype(np.float64, copy=False)
        acc = np.zeros(len(A), dtype=np.float64)
        for j in range(A.shape[1]):
            acc += A[:, j] * B[:, j]
        return pd.Series(acc)

    # pure, but the downstream cos-threshold filters must not be
    # pushed below the evaluation (guide §4.4)
    return dotp.asNondeterministic()


def _pair_dot(a: str, b: str) -> Column:
    if PAIR_DOT_STRATEGY == "arrow":
        return _dot_pair_udf()(F.col(a), F.col(b))
    return _dot(a, b)


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
    # the query's norm is a scalar: compute it once on the broadcast
    # side instead of re-deriving it for every candidate row
    q = e.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q"), _norm("embedding").alias("qn")
    )
    scored = (
        e.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot("embedding", "q")
                / (_norm("embedding") * F.col("qn")),
                4,
            ).alias("cos"),
        )
    )
    return scored.orderBy(F.col("cos").desc(), F.col("vec_id")).limit(k)


NEARDUP_BANDS = 4  # 4 bands x 4 sign bits from the 16 hyperplanes


def cosine_neardup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.30
) -> DataFrame:
    """Embedding near-dup pairs with hyperplane-LSH band blocking.

    Candidates must share at least one of ``NEARDUP_BANDS`` bands of
    sign bits (the same md5-derived plane family as ``lsh_ann_topk``);
    exact cosine is then computed only inside those bucket-local pairs.
    This is the blocking a 10^12-row corpus requires — no global
    pairwise join ever forms, and the ``MAX_BUCKET_DF`` cap bounds any
    one bucket's pair explosion (mirrored in the DuckDB oracle).
    Recall is the standard LSH trade: pairs approach probability 1 of
    sharing a band as cosine -> 1; at a loose threshold like 0.30 the
    blocking is intentionally lossy (round 1 blocked on the *label*
    column, which is a test-data crutch, not a computable key).
    At real scale, raise N_PLANES and the band width together (e.g. 64
    planes -> 4 bands of 16 bits) to keep buckets sparse."""
    from .dedup import MAX_BUCKET_DF, _bucket_pairs, _capped_buckets

    width = N_PLANES // NEARDUP_BANDS
    e = _emb(spark, sf_dir).select(
        "vec_id", "embedding", _norm("embedding").alias("nrm")
    ).localCheckpoint(eager=False)  # consumed by both pair-join sides
    eb = e.withColumn("bucket", _bucket_col())
    bands = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.substring("bucket", b * width + 1, width).alias("band_val"),
        )
        for b in range(NEARDUP_BANDS)
    ]
    exploded = eb.select(
        "vec_id", F.explode(F.array(*bands)).alias("b")
    ).select("vec_id", F.col("b.band_idx"), F.col("b.band_val"))
    buckets = _capped_buckets(
        exploded, ["band_idx", "band_val"], "vec_id", MAX_BUCKET_DF
    )
    pairs = _bucket_pairs(buckets).distinct()
    a = e.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    return (
        pairs.join(a, "a_id")
        .join(b, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                _pair_dot("ea", "eb") / (F.col("na") * F.col("nb")), 4
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def plane_weights(p: int, dim: int = EMB_DIM) -> list[float]:
    """Deterministic ±1 hyperplane p: sign of the first md5 hex digit of
    ``"{p}_{i}"`` per position (seedless; reproducible in any engine)."""
    return [
        1.0
        if hashlib.md5(f"{p}_{i}".encode()).hexdigest()[0] >= "8"
        else -1.0
        for i in range(dim)
    ]


def _bucket_col() -> Column:
    """Per-row LSH bucket: one sign bit per hyperplane, each computed as
    a single ``aggregate(zip_with(...))`` over a plane-weight array
    *literal* — zero explode, zero shuffle. (Round 1 computed these bits
    via rows × dim × planes double-explode + two shuffled groupBys: at
    10^9 vectors × 768 dims that shuffles 10^13 rows to derive a few
    bits per vector. This form is pure per-row projection.)"""
    bits = []
    for p in range(N_PLANES):
        w = F.array(*[F.lit(x) for x in plane_weights(p)])
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding"), w, lambda x, wv: x.cast("double") * wv
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).withColumn("bucket", _bucket_col())


def lsh_ann_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    radius: int = LSH_RADIUS,
) -> DataFrame:
    """ANN: multi-probe hyperplane LSH — candidates are vectors whose
    16-bit bucket lies within Hamming distance ``radius`` of the query's
    bucket, then exact cosine within the probe set.

    The Hamming predicate against the broadcast query bucket is the
    relational form of probing all C(16, <=radius) neighbor buckets. At
    100 TB the bucket is a materialized partition/cluster key and the
    probe set enumerates those buckets for partition pruning; candidate
    generation never forms a pairwise join either way."""
    bucketed = _bucketed(spark, sf_dir)
    q = bucketed.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q"),
        F.col("bucket").alias("qb"),
        _norm("embedding").alias("qn"),
    )
    hamming = sum(
        (F.substring("bucket", j + 1, 1) != F.substring("qb", j + 1, 1)).cast(
            "int"
        )
        for j in range(N_PLANES)
    )
    cands = (
        bucketed.crossJoin(F.broadcast(q))
        .where((F.col("vec_id") != query_vec_id) & (hamming <= radius))
        .select(
            "vec_id",
            F.round(
                _dot("embedding", "q") / (_norm("embedding") * F.col("qn")),
                4,
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


K_LISTS = 10
KMEANS_ITERS = 3
CENTROID_DP = 6  # fixed-point quantization of centroids per update

# --- corpus-adaptive quantizer size (VERDICT r5 item 1) -------------------
# A fixed k means cluster size grows linearly with the corpus until
# SEM_MAX_CLUSTER silently caps (or drops) every cluster — the
# SemDeDup/IVF recipe is k grows with n so clusters stay bounded.
# k='auto' resolves on a DETERMINISTIC doubling grid {K_LISTS * 2^i}:
# the smallest grid value whose average cluster n/k is at most
# AUTO_TARGET_CLUSTER. The grid (not ceil(n/target) itself) makes the
# resolved k — and therefore every downstream oracle — stable under
# small corpus-size drift, and reproduces k=10 exactly for the
# 500-vector driver tables, so the unrolled k=10 SQL oracles replay
# the auto path verbatim at every driver-checked scale.
AUTO_TARGET_CLUSTER = 50
AUTO_K_MAX = 65536  # driver holds k x dim doubles; beyond this a real
                    # deployment trains a hierarchical/balanced quantizer
_N_EMB_MEMO: dict[str, int] = {}


def _auto_k(n: int) -> int:
    k = K_LISTS
    while k * AUTO_TARGET_CLUSTER < n and k * 2 <= AUTO_K_MAX:
        k *= 2
    return k


def _resolve_k(spark: SparkSession, sf_dir: str, k) -> int:
    """'auto' -> grid k for this corpus (one memoized count — parquet
    row-group metadata, not a data scan); an int passes through."""
    if k == "auto":
        n = _N_EMB_MEMO.get(sf_dir)
        if n is None:
            n = _emb(spark, sf_dir).count()
            _N_EMB_MEMO[sf_dir] = n
        return _auto_k(n)
    return int(k)


def kmeans_assign(
    spark: SparkSession,
    sf_dir: str,
    k: int | str = K_LISTS,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """Deterministic spherical k-means (Lloyd's, inner-product
    assignment) trained entirely with DataFrame ops; returns the final
    (vec_id, list_id) assignment.

    Determinism at cluster scale: init = the ``k`` lowest vec_ids'
    embeddings, ties on the dot break to the lowest list id, and every
    centroid update is quantized to ``CENTROID_DP`` decimals — so the
    result is bit-identical regardless of partitioning/aggregation
    order (and reproducible in the DuckDB oracle). Each iteration
    collects only k x dim doubles to the driver (bounded by k, never by
    data) and re-broadcasts them as literal arrays, so assignment is a
    pure per-row projection — zero shuffle; the update is one
    hash-aggregate."""
    centroids = _kmeans_centroids(spark, sf_dir, k, iters)
    return _assigned(
        spark, _emb(spark, sf_dir).select("vec_id", "embedding"), centroids
    ).select("vec_id", "list_id")


# Above this k, centroid-literal expression trees stop scaling: a 10^4
# x 768 literal plan is megabytes of expression tree and Catalyst
# analysis blows up long before data does (VERDICT r3). The arrow path
# scores the k x dim centroid matrix in one numpy fold per Arrow
# batch; the join path (broadcast centroids as DATA) is kept as the
# UDF-free fallback and stays bit-equality-pinned against both.
ASSIGN_BROADCAST_K = 64
# Above this k, the Arrow fold beats the centroid-literal projection:
# the literal path's aggregate(zip_with(...)) chain is interpreted
# (CodegenFallback), so its per-row cost is k x dim interpreted lambda
# steps, while the fold is one vectorized numpy pass per batch.
# Interleaved A/B at k=40/dim=64 (sf0.1, BENCH/BASELINE.md):
# semantic_keepers 11.2 -> 2.5 s, ivf 9.1 -> 1.3 s, multiprobe
# 11.6 -> 3.4 s. k <= 16 keeps the literal projection — the
# K_LISTS=10 oracle regime stays UDF-free and plan-identical.
ASSIGN_ARROW_K = 16


def _fold_dots(emb: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, d) float32 x (k, d) float64 -> (n, k) float64 dot matrix,
    bit-equal to the JVM ``aggregate(zip_with(...))`` fold.

    The JVM fold computes ``((0.0 + x0*w0) + x1*w1) + ...`` — one IEEE
    double multiply-then-add per dimension, strictly in order. Looping
    the DIMENSION sequentially here while vectorizing over rows x
    centroids performs the identical operation sequence on every
    element (float32 -> double is exact; ``acc += X[:,j,None] *
    W[None,:,j]`` is one mul + one add per element), so every dot is
    bit-identical to the literal/join paths — no BLAS matmul, whose
    blocked/pairwise summation would differ in the last ulp and could
    flip argmax on near-ties."""
    acc = np.zeros((emb.shape[0], cents.shape[0]), dtype=np.float64)
    x = emb.astype(np.float64, copy=False)
    for j in range(x.shape[1]):
        acc += x[:, j, None] * cents[None, :, j]
    return acc


def _stack_emb(emb: pd.Series) -> np.ndarray:
    # keep the source dtype: float32 input widens exactly to double in
    # _fold_dots (mirroring the JVM's cast), while an already-double
    # embedding column must NOT round-trip through float32
    return np.stack([np.asarray(v) for v in emb])


def _assign_arrow_udf(centroids: list[list[float]]):
    """pandas_udf: embedding -> primary list_id (argmax dot, ties ->
    lowest list id — ``np.argmax`` returns the FIRST max index, which
    is exactly the house tie rule)."""
    cents = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int32")
        d = _fold_dots(_stack_emb(emb), cents)
        return pd.Series(np.argmax(d, axis=1).astype("int32"))

    # the function is pure, but the optimizer must NOT move filters
    # that reference its output below it (guide §4.4): IVF's
    # ``list_id IN (...)`` probe filter otherwise gets pushed under
    # the input-spread exchange and drags the ArrowEvalPython node
    # onto the unsplit scan — serializing the k x dim fold on one
    # core (measured: 4.9 s -> 0.9 s at sf1.0 with the marker)
    return assign.asNondeterministic()


def _probe_arrow_udf(centroids: list[list[float]], probes: int):
    """pandas_udf: embedding -> the ``probes`` nearest list_ids in
    probe order. Ordering is dot desc then list_id asc: ``-d`` is an
    exact IEEE sign flip and the STABLE argsort keeps ties in
    ascending-index order — identical to the JVM struct sort."""
    cents = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def probe(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="object")
        d = _fold_dots(_stack_emb(emb), cents)
        idx = np.argsort(-d, axis=1, kind="stable")[:, :probes]
        return pd.Series(list(idx.astype("int32")))

    return probe


def _assigned(
    spark: SparkSession,
    e: DataFrame,
    centroids: list[list[float]],
    use_join: bool | None = None,
) -> DataFrame:
    """``e`` (vec_id, embedding, ...) -> same columns + ``list_id``.

    Small k (the default/oracle regime): centroid-literal
    greatest-struct projection — zero shuffle, zero join. Large k
    (default): Arrow-batched numpy fold over the k x dim centroid
    matrix — still a pure per-row map (zero shuffle, no exchange) and
    bit-equal to the JVM fold by construction (``_fold_dots``).
    ``use_join=True`` selects the UDF-free fallback: broadcast the
    centroid table as data, expand each vector to k scored rows
    JVM-side, per-vector struct-max (partial agg collapses the k rows
    map-side; one exchange of one row per vector). All three paths
    compute the identical quantized dot with the identical tie-break
    (highest dot, then lowest list id), so results are bit-equal
    (pinned by tests/test_oracle_parity.py::test_assign_paths_agree
    and test_assign_arrow_large_k)."""
    if use_join is None:
        if len(centroids) > ASSIGN_ARROW_K:
            return e.withColumn(
                "list_id", _assign_arrow_udf(centroids)(F.col("embedding"))
            )
        use_join = False
    if not use_join:
        return e.withColumn(
            "list_id", _assign_col(centroids).cast("int")
        )
    cdf = spark.createDataFrame(
        [(li, [float(x) for x in c]) for li, c in enumerate(centroids)],
        "list_id int, centroid array<double>",
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"), F.col("centroid"),
            lambda x, w: x.cast("double") * w,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    others = [c for c in e.columns if c != "vec_id"]
    scored = e.join(F.broadcast(cdf)).select(
        *e.columns,
        F.struct(
            dot.alias("d"),
            (-F.col("list_id")).alias("neg"),
            F.col("list_id").alias("list_id"),
        ).alias("s"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max("s").alias("m"),
            *[F.first(c).alias(c) for c in others],
        )
        .select(
            "vec_id", *others, F.col("m.list_id").cast("int").alias("list_id")
        )
    )


def _assign_col(cents: list[list[float]]) -> Column:
    """argmax over k centroid dots via greatest-struct (pure per-row
    projection, zero shuffle); ties -> lowest list id. Small-k path of
    ``_assigned`` — see ASSIGN_ARROW_K for the large-k switch."""
    structs = []
    for li, c in enumerate(cents):
        arr = F.array(*[F.lit(x) for x in c])
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding"), arr,
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        structs.append(
            F.struct(
                dot.alias("d"),
                F.lit(-li).alias("neg"),
                F.lit(li).alias("list_id"),
            )
        )
    return F.greatest(*structs)["list_id"]


_KMEANS_MEMO: dict[tuple, list[list[float]]] = {}


def _kmeans_centroids(
    spark: SparkSession, sf_dir: str, k: int | str = K_LISTS,
    iters: int = KMEANS_ITERS,
) -> list[list[float]]:
    """Lloyd's loop; returns the final quantized centroids as plain
    Python lists (k x dim doubles — bounded by k, never by data).
    ``k='auto'`` resolves on the deterministic grid (``_auto_k``) so
    clusters stay ~AUTO_TARGET_CLUSTER-sized as the corpus grows.
    Memoized per (sf_dir, resolved k, iters): the quantizer is
    deterministic and in a real IVF deployment is trained once
    offline, then reused by every search."""
    k = _resolve_k(spark, sf_dir, k)
    memo_key = (sf_dir, k, iters)
    cached = _KMEANS_MEMO.get(memo_key)
    if cached is not None:
        return cached
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    init = e.orderBy("vec_id").limit(k).orderBy("vec_id").collect()
    # init stays unrounded: float32 -> double is exact in any engine,
    # while Python/Spark/DuckDB rounding modes differ at exact halves
    centroids = [[float(x) for x in r.embedding] for r in init]
    for _ in range(iters):
        assigned = _assigned(spark, e, centroids)
        upd = (
            assigned.select(
                "list_id", F.posexplode("embedding").alias("pos", "v")
            )
            .groupBy("list_id", "pos")
            .agg(F.round(F.avg("v"), CENTROID_DP).alias("c"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("centroid")
            )
            .collect()
        )
        new = {r.list_id: [float(x) for x in r.centroid] for r in upd}
        # a list that lost all members keeps its previous centroid
        centroids = [new.get(li, centroids[li]) for li in range(k)]
    _KMEANS_MEMO[memo_key] = centroids
    return centroids


def ivf_ann_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_probe: int = 2,
    quant_k: int | str = "auto",
) -> DataFrame:
    """IVF ANN on the k-means coarse quantizer (kmeans_assign's
    centroids - round 1 used the test data's label column as a
    stand-in): every vector's list assignment is a per-row expression
    over centroid literals (zero shuffle), the query's ``n_probe``
    nearest lists are computed driver-side from the same k x dim
    centroids, and candidates reduce to a literal ``list_id IN (...)``
    filter - partition-prunable when the table is laid out by list -
    followed by exact cosine. No window, no centroid shuffle, no
    pairwise join. ``quant_k='auto'`` (default) grows the coarse
    quantizer with the corpus (``_auto_k``); a production deployment
    scales ``n_probe`` with it to hold the probed fraction."""
    cents = _kmeans_centroids(spark, sf_dir, quant_k)
    e = _emb(spark, sf_dir)
    q_row = e.where(F.col("vec_id") == query_vec_id).first()
    if q_row is None:  # unknown query id -> empty result, not a crash
        return e.select(
            "vec_id", F.lit(0.0).alias("cos")
        ).where(F.lit(False))
    q_emb = [float(x) for x in q_row.embedding]
    # query's n_probe nearest lists, same dot + tie rule as assignment
    dots = [
        (sum(a * b for a, b in zip(q_emb, c)), li)
        for li, c in enumerate(cents)
    ]
    probe_lists = [
        li for _, li in sorted(dots, key=lambda t: (-t[0], t[1]))[:n_probe]
    ]
    # the query vector is already on the driver: score against literals
    # (no second table scan, no broadcast join) and fold its constant
    # norm in once instead of recomputing it per candidate row
    import math

    q_lit = F.array(*[F.lit(x) for x in q_emb])
    q_norm = math.sqrt(sum(x * x for x in q_emb))
    q_dot = F.aggregate(
        F.zip_with(
            F.col("embedding"), q_lit, lambda x, w: x.cast("double") * w
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cands = (
        # _assigned auto-switches to the broadcast-join path at large
        # k — the same Catalyst-blowup guard as kmeans_assign
        # (review r4); at the oracle k the literal projection is kept
        _assigned(spark, e.select("vec_id", "embedding"), cents)
        .where(
            F.col("list_id").isin(probe_lists)
            & (F.col("vec_id") != query_vec_id)
        )
        .select(
            "vec_id",
            F.round(
                q_dot / (_norm("embedding") * F.lit(q_norm)), 4
            ).alias("cos"),
        )
    )
    return cands.orderBy(F.col("cos").desc(), F.col("vec_id")).limit(k)


SEM_MAX_CLUSTER = 1000  # within-cluster pair cap for semantic dedup
SEM_THRESHOLD = 0.30


def semantic_dedup(
    spark: SparkSession, sf_dir: str, threshold: float = SEM_THRESHOLD,
    k: int | str = "auto",
) -> DataFrame:
    """SemDeDup-family semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then
    compute exact cosine ONLY within each cluster. Returned pairs
    (a_id < b_id by construction) are the semantic-duplicate edges: a
    removal policy drops each pair's b_id (or feeds the edges to the
    same label-propagation used by dedup_minhash_cc for transitive
    clusters).

    Scale shape: the cluster id is the blocking key, so no global
    pairwise join ever forms; within-cluster pairs expand
    bucket-locally capped at SEM_MAX_CLUSTER. Since r6 the default
    quantizer is ``k='auto'`` — k doubles along the deterministic
    grid as the corpus grows (``_auto_k``), holding average cluster
    size at ~AUTO_TARGET_CLUSTER so the cap stops binding at 10x+
    scale (exactly the SemDeDup recipe; the r5 VERDICT's fixed-k=10
    silent-cap finding). At driver scales auto resolves to k=10, so
    the unrolled k=10 SQL oracle replays the auto path verbatim.
    The quantizer is the same engine-deterministic k-means the IVF
    index uses."""
    from .dedup import _bucket_pairs, _capped_buckets

    assign = kmeans_assign(spark, sf_dir, k=k)  # (vec_id, list_id)
    e = _emb(spark, sf_dir).select(
        "vec_id", "embedding", _norm("embedding").alias("nrm")
    ).localCheckpoint(eager=False)  # consumed by both pair-join sides
    buckets = _capped_buckets(
        assign.select("vec_id", "list_id"),
        ["list_id"],
        "vec_id",
        SEM_MAX_CLUSTER,
    )
    pairs = _bucket_pairs(buckets, cap=SEM_MAX_CLUSTER)
    a = e.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    return (
        pairs.join(a, "a_id")
        .join(b, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                _pair_dot("ea", "eb") / (F.col("na") * F.col("nb")), 4
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def _cc_min_labels(
    edges: DataFrame, max_iters: int = 20,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """Connected components over an undirected pair list
    ``edges(a_id, b_id)`` by min-label propagation with pointer
    jumping: each round proposes the min neighbor label, then jumps
    ``label <- label(label)``. Labels are node ids and monotonically
    non-increasing, so the jump stays inside the component and halves
    its depth — O(log diameter) rounds, so ``max_iters = 20`` covers
    any component a real corpus can produce (the DuckDB oracles'
    recursive closures have no iteration cap to diverge from —
    review r4; convergence unit-tested on a 60-node path graph).
    Returns ``(vec_id, label)`` for every node that occurs in an
    edge.

    When the edge list is at most ``driver_max_edges`` (one bounded
    count — default dedup.DRIVER_CC_MAX_EDGES), the closure runs as
    driver union-find instead: identical labels, none of the
    per-round job overhead. Pass 0 to force the distributed loop."""
    from .dedup import DRIVER_CC_MAX_EDGES, _driver_cc_min_labels

    if driver_max_edges is None:
        driver_max_edges = DRIVER_CC_MAX_EDGES
    if driver_max_edges > 0:
        # ONE action both decides the branch and delivers the rows
        # (review r5): an oversized graph returns threshold+1 rows and
        # falls through to the distributed loop
        # Arrow transfer, not row-pickled take() — guide §6
        head = edges.limit(driver_max_edges + 1).toPandas()
        if len(head) <= driver_max_edges:
            rows = list(
                zip(head["a_id"].tolist(), head["b_id"].tolist())
            )
            nodes = {a for a, _ in rows} | {b for _, b in rows}
            labels = _driver_cc_min_labels(rows, nodes)
            spark = edges.sparkSession
            out = pd.DataFrame(
                {
                    "vec_id": [int(n) for n in labels],
                    "label": [int(v) for v in labels.values()],
                }
            )
            return spark.createDataFrame(out, "vec_id long, label long")
    adj = edges.selectExpr("a_id AS src", "b_id AS dst").union(
        edges.selectExpr("b_id AS src", "a_id AS dst")
    )
    labels = (
        adj.select(F.col("src").alias("vec_id"))
        .distinct()
        .select("vec_id", F.col("vec_id").cast("long").alias("label"))
    )
    for _ in range(max_iters):
        prop = (
            adj.join(labels.withColumnRenamed("vec_id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nl"))
            .withColumnRenamed("dst", "vec_id")
        ).localCheckpoint()
        # convergence read off the proposal itself — no new-vs-old join
        changed = (
            labels.join(prop, "vec_id")
            .where(F.col("nl") < F.col("label"))
            .count()
        )
        if changed == 0:
            break
        stepped = labels.join(prop, "vec_id", "left").select(
            "vec_id",
            F.least(
                F.col("label"), F.coalesce("nl", "label")
            ).alias("label"),
        )
        jump = stepped.selectExpr("vec_id AS j_id", "label AS j_label")
        labels = (
            stepped.join(
                jump, stepped.label == F.col("j_id"), "left"
            )
            .select(
                "vec_id",
                F.coalesce("j_label", "label").alias("label"),
            )
            .localCheckpoint()
        )
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} iterations"
        )
    return labels


def semantic_keepers(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = SEM_THRESHOLD,
    max_iters: int = 20,
    quant_k: int | str = "auto",
) -> DataFrame:
    """SemDeDup removal policy over ``semantic_dedup``'s duplicate
    edges: connected components by iterative min-label propagation
    (the same alternating-aggregation CC as
    dedup.minhash_connected_components, here over the symmetrized pair
    list), keeping the lowest vec_id of each component. Emits every
    vector with its component keeper and a keep flag — the training
    set is ``keep = 1``.

    Scale shape: the edge list is already bucket-capped upstream (no
    pair explosion); propagation runs over ONLY the vectors that occur
    in a duplicate edge (vectors with no edge are trivially their own
    keeper and join back at the end), so each round is one join + two
    hash-aggregates over the dup subgraph — a duplicate mega-component
    costs O(edges x diameter), never O(pairs), and a 10^12-vector
    corpus with 1% duplicates iterates over 1% of its rows.
    ``localCheckpoint`` cuts the growing loop lineage exactly as in
    the MinHash closure."""
    edges = (
        semantic_dedup(spark, sf_dir, threshold, k=quant_k)
        .select("a_id", "b_id")
        .localCheckpoint()
    )
    labels = _cc_min_labels(edges, max_iters)
    return (
        _emb(spark, sf_dir)
        .select("vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("label", F.col("vec_id").cast("long")).alias(
                "keeper_id"
            ),
            (F.col("vec_id") == F.coalesce("label", F.col("vec_id")))
            .cast("long")
            .alias("keep"),
        )
    )


KNN_K = 3  # neighbors per vector
KNN_PROBES = 2  # multi-probe default: lists searched per query vector


def _probe_lists(
    spark: SparkSession,
    e: DataFrame,
    centroids: list[list[float]],
    probes: int,
    use_join: bool | None = None,
) -> DataFrame:
    """``e`` (vec_id, embedding) -> (vec_id, probe_rank, list_id):
    each vector's ``probes`` nearest centroids under the house dot +
    tie rule (highest dot, then lowest list id — identical to
    ``_assigned``, so probe_rank 1 reproduces the primary assignment
    bit-for-bit).

    Small k: a pure per-row projection — k scored structs, array_sort
    (nd = -dot ascending == dot descending, then list_id), slice P,
    explode. Zero shuffle, zero join. Large k (> ASSIGN_ARROW_K,
    default): the Arrow fold ranks all k centroids per batch and
    returns the top-P array — still a per-row map + posexplode, zero
    exchange, bit-equal by construction (``_probe_arrow_udf``).
    ``use_join=True`` keeps the UDF-free fallback: broadcast the
    centroid TABLE and take row_number <= P over the per-vector
    scored rows — that path pays a full n x k exchange into the
    window, which is exactly why arrow is the default
    (test_probe_paths_agree pins all three bit-equal)."""
    if use_join is None and len(centroids) > ASSIGN_ARROW_K:
        probed = _probe_arrow_udf(centroids, probes)(F.col("embedding"))
        return e.select(
            "vec_id", F.posexplode(probed).alias("pos", "list_id")
        ).select(
            "vec_id",
            (F.col("pos") + 1).cast("int").alias("probe_rank"),
            F.col("list_id").cast("int").alias("list_id"),
        )
    if use_join:
        from pyspark.sql import Window

        cdf = spark.createDataFrame(
            [
                (li, [float(x) for x in c])
                for li, c in enumerate(centroids)
            ],
            "list_id int, centroid array<double>",
        )
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding"), F.col("centroid"),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("d").desc(), F.col("list_id")
        )
        return (
            e.join(F.broadcast(cdf))
            .select("vec_id", "list_id", dot.alias("d"))
            .withColumn("probe_rank", F.row_number().over(w))
            .where(F.col("probe_rank") <= probes)
            .select("vec_id", "probe_rank", "list_id")
        )
    structs = []
    for li, c in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding"), arr,
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        structs.append(
            F.struct((-dot).alias("nd"), F.lit(li).alias("list_id"))
        )
    probed = F.slice(F.array_sort(F.array(*structs)), 1, probes)
    return e.select(
        "vec_id", F.posexplode(probed).alias("pos", "p")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("int").alias("probe_rank"),
        F.col("p.list_id").cast("int").alias("list_id"),
    )


def knn_join_multiprobe(
    spark: SparkSession,
    sf_dir: str,
    k: int = KNN_K,
    probes: int = KNN_PROBES,
    quant_k: int | str = "auto",
) -> DataFrame:
    """Multi-probe upgrade of ``knn_join`` (VERDICT r4 item 3): every
    vector is INDEXED in its primary k-means list, but QUERIES its
    ``probes`` nearest lists — the standard IVF multi-probe recall
    recovery: neighbors just across a quantization boundary become
    visible without widening any cluster. probes=1 degenerates to the
    single-probe candidate set; recall@k grows monotonically with
    ``probes`` (pinned by test_multiprobe_recall_improves against a
    brute-force numpy oracle).

    Scale shape: index buckets are the capped primary-assignment
    arrays (cap BEFORE collect, same machinery as semantic_dedup but
    n_min=1 — a singleton bucket still serves OTHER vectors probing
    it); the probe table is `probes` rows per vector from a pure
    per-row projection (zero shuffle at driver k); candidates form
    only by probe-list join — never a global pairwise join — and each
    (a, b) pair arises exactly once because b lives in exactly one
    primary bucket (no distinct needed). Per-query cost is
    probes x cluster_size, the IVF knob. Zero-norm embeddings drop
    (NULL cosine; the oracle excludes them explicitly).

    Cosine economy: the candidate set splits into PRIMARY pairs
    (both sides share a primary cluster — symmetric by construction,
    so each unordered pair's cosine computes ONCE and mirrors into
    both directions, exactly knn_join's edge set) and FOREIGN probes
    (rank >= 2 — inherently directed: a probing b's cluster does not
    imply b probes a's). That removes a quarter of the cosine
    evaluations at probes=2 vs scoring every directed candidate
    (A/B in BENCH/BASELINE.md); results are bit-identical because
    FP dot products commute elementwise."""
    from pyspark.sql import Window

    from .dedup import _bucket_pairs, _capped_buckets

    cents = _kmeans_centroids(spark, sf_dir, quant_k)
    e = _emb(spark, sf_dir).select(
        "vec_id", "embedding", _norm("embedding").alias("nrm")
    ).localCheckpoint(eager=False)  # consumed by both pair-join sides
    ev = e.select("vec_id", "embedding")
    # the probe table feeds the primary buckets AND the foreign
    # probes — checkpoint so the Arrow ranking UDF runs once
    probe = _probe_lists(spark, ev, cents, probes).localCheckpoint(
        eager=False
    )
    primary = probe.where(F.col("probe_rank") == 1).select(
        "vec_id", "list_id"
    )
    foreign = probe.where(F.col("probe_rank") >= 2).select(
        "vec_id", "list_id"
    )
    buckets = _capped_buckets(
        primary, ["list_id"], "vec_id", SEM_MAX_CLUSTER, n_min=1
    )
    a = e.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )

    def _cos(cand: DataFrame) -> DataFrame:
        return (
            cand.join(a, "a_id")
            .join(b, "b_id")
            .select(
                "a_id",
                "b_id",
                F.round(
                    _pair_dot("ea", "eb") / (F.col("na") * F.col("nb")), 4
                ).alias("cos"),
            )
            .where(F.col("cos").isNotNull())
        )

    sym = _cos(_bucket_pairs(buckets, cap=SEM_MAX_CLUSTER))
    sym_bidi = sym.unionByName(
        sym.select(
            F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"), "cos"
        )
    )
    asym = _cos(
        foreign.join(buckets, "list_id")
        .select(
            F.col("vec_id").alias("a_id"), F.explode("ids").alias("b_id")
        )
        .where(F.col("a_id") != F.col("b_id"))
    )
    scored = sym_bidi.unionByName(asym)
    w = Window.partitionBy("a_id").orderBy(F.col("cos").desc(), F.col("b_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("a_id").alias("vec_id"),
            F.col("rank").cast("int").alias("rank"),
            F.col("b_id").alias("nn_id"),
            "cos",
        )
    )


def knn_join(
    spark: SparkSession, sf_dir: str, k: int = KNN_K,
    quant_k: int | str = "auto",
) -> DataFrame:
    """Cluster-blocked k-nearest-neighbor JOIN: the top-k cosine
    neighbors for EVERY vector (the general form of the single-query
    ANN searches), candidates restricted to the vector's k-means
    cluster — the same engine-deterministic quantizer the IVF index
    and SemDeDup use, so the oracle replays it exactly. Neighbors
    living in other clusters are unseen: the standard single-probe
    IVF trade-off, recall governed by quantizer quality.

    Scale shape: no global pairwise join — within-cluster candidate
    pairs expand bucket-locally under the SEM_MAX_CLUSTER cap
    (enforced BEFORE collect_list, same machinery as semantic_dedup);
    each undirected pair's cosine computes once and mirrors into both
    directions; the per-vector top-k is a bounded window partitioned
    by vec_id over each vector's own candidate list. Ties break on
    (cos desc, neighbor id asc) — engine-deterministic.

    A ZERO-NORM embedding has no defined cosine: its 0/0 evaluates to
    NULL and the ``cos >= -1.0`` filter drops every pair touching it,
    so such vectors emit no neighbor rows (the DuckDB oracle excludes
    zero-norm sides explicitly — its cosine returns -1.0 instead of
    NULL; pinned by test_knn_join_zero_norm_parity, ADVICE r4)."""
    from pyspark.sql import Window

    und = semantic_dedup(spark, sf_dir, threshold=-1.0, k=quant_k)
    edges = und.unionByName(
        und.select(
            F.col("b_id").alias("a_id"),
            F.col("a_id").alias("b_id"),
            "cos",
        )
    )
    w = Window.partitionBy("a_id").orderBy(
        F.col("cos").desc(), F.col("b_id")
    )
    return (
        edges.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("a_id").alias("vec_id"),
            F.col("rank").cast("int").alias("rank"),
            F.col("b_id").alias("nn_id"),
            "cos",
        )
    )


RRF_C = 60    # the standard RRF damping constant (Cormack et al. 2009)
RRF_K = 10    # fused results per query


def rrf_fusion(
    spark: SparkSession, sf_dir: str, k: int = RRF_K
) -> DataFrame:
    """Hybrid retrieval through reciprocal-rank fusion (Cormack,
    Clarke, Buettcher 2009): the lexical arm is ``bm25_topk`` and the
    vector arm is brute-force cosine over the embeddings table for
    the SAME query ids (doc_id < 3 == vec_id < 3 — the tables are
    row-aligned by construction); a document's fused score is
    sum(1/(RRF_C + rank)) over the arms that returned it, and each
    query reports the top ``RRF_K`` fused docs.

    Determinism: the fused score is the sum of at most TWO doubles —
    IEEE addition of two operands is commutative, so there is no
    partition-order hazard — computed from identical integer ranks in
    both engines and pinned to integer NANO units with floor(+0.5).

    Scale shape: both arms are top-k-bounded BEFORE fusion, so the
    fusion join and re-rank run over <= 2k rows per query — driver-
    free and broadcast-sized at any corpus size. The vector arm here
    is the brute baseline (one crossJoin against the BROADCAST 3-row
    query set, corpus scanned once); at 100 TB swap in
    ``ivf_ann_topk``'s probe path — the fusion itself is unchanged.
    The per-query re-rank windows partition by qid over k-bounded
    rows, never the corpus."""
    from pyspark.sql import Window

    from .textstats import bm25_topk

    nq = 3  # mirrors BM25_N_QUERIES
    bm = bm25_topk(spark, sf_dir).select(
        "qid", "doc_id", F.col("rank").alias("rb")
    )
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    q = e.where(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        _norm("embedding").alias("qn"),
    )
    # both arms retrieve from the SAME candidate universe: doc_id >=
    # nq (bm25 already excludes the query docs; the vector arm must
    # too, or a query doc could surface as another query's "result")
    scored = (
        e.where(F.col("vec_id") >= nq)
        .crossJoin(F.broadcast(q))
        .select(
            "qid",
            F.col("vec_id").alias("doc_id"),
            F.round(
                _dot("embedding", "qe")
                / (_norm("embedding") * F.col("qn")),
                4,
            ).alias("cos"),
        )
    )
    wv = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("doc_id")
    )
    vec = (
        scored.withColumn("rv", F.row_number().over(wv))
        .where(F.col("rv") <= k)
        .select("qid", "doc_id", "rv")
    )
    fused = bm.join(vec, ["qid", "doc_id"], "full_outer").select(
        "qid",
        "doc_id",
        F.floor(
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_C) + F.col("rb")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(RRF_C) + F.col("rv")), F.lit(0.0)
                )
            )
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long").alias("rrf_nano"),
    )
    wf = Window.partitionBy("qid").orderBy(
        F.col("rrf_nano").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            "rrf_nano",
        )
    )
