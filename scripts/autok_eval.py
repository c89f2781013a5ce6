#!/usr/bin/env python
"""A/B the fixed k=10 quantizer vs k='auto' on the 10x replica corpus
(VERDICT r5 item 1 done-criterion): report, per mode,

- the resolved k and the cluster-size distribution of the primary
  assignment, including the CAPPED fraction — the share of vectors in
  clusters larger than SEM_MAX_CLUSTER, which _capped_buckets DROPS
  (n_min..cap admission), so every vector in a capped cluster emits
  zero within-cluster candidates;
- recall@KNN_K of knn_join (single-probe) and knn_join_multiprobe
  (probes=2) against an exact blocked-numpy brute-force oracle;
- wall-clock for the knn_join run (construction + noop write).

Writes BENCH/autok_eval.json. Usage: python scripts/autok_eval.py
[replica_dir] (default .bench_cache/sf1 — generate with
scripts/gen_scaled.py first).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, ".bench_cache", "sf1"
)


def main() -> None:
    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from service1_text_extraction_spark.functions import similarity

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("autok-eval")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.local.dir", "/dev/shm/spark-tmp")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    n = len(ids)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    Xn = X / norms
    k_nn = similarity.KNN_K
    # blocked exact top-k (cos desc, then id asc — the house tie rule)
    true_nn: dict[int, set] = {}
    for s in range(0, n, 2048):
        S = Xn[s : s + 2048] @ Xn.T
        for bi in range(S.shape[0]):
            i = s + bi
            S[bi, i] = -np.inf
            order = np.lexsort((ids, -S[bi]))
            true_nn[int(ids[i])] = {int(ids[j]) for j in order[:k_nn]}

    def recall(df) -> float:
        got: dict[int, set] = {}
        for r in df.collect():
            got.setdefault(r.vec_id, set()).add(r.nn_id)
        hits = sum(len(got.get(v, set()) & t) for v, t in true_nn.items())
        return round(hits / (len(true_nn) * k_nn), 4)

    out = {"sf_dir": SF_DIR, "n_vectors": n,
           "sem_max_cluster": similarity.SEM_MAX_CLUSTER,
           "knn_k": k_nn, "modes": {}}
    for mode, qk in (("fixed10", similarity.K_LISTS), ("auto", "auto")):
        resolved = similarity._resolve_k(spark, SF_DIR, qk)
        t0 = time.perf_counter()
        cents = similarity._kmeans_centroids(spark, SF_DIR, qk)
        t_train = time.perf_counter() - t0
        sizes = (
            similarity.kmeans_assign(spark, SF_DIR, k=qk)
            .groupBy("list_id").count().collect()
        )
        counts = {r.list_id: r["count"] for r in sizes}
        capped_vec = sum(
            c for c in counts.values() if c > similarity.SEM_MAX_CLUSTER
        )
        t0 = time.perf_counter()
        knn = similarity.knn_join(spark, SF_DIR, quant_k=qk)
        knn.write.format("noop").mode("overwrite").save()
        t_knn = time.perf_counter() - t0
        out["modes"][mode] = {
            "resolved_k": resolved,
            "n_centroids": len(cents),
            "n_nonempty_clusters": len(counts),
            "max_cluster": max(counts.values()),
            "mean_cluster": round(n / max(1, len(counts)), 1),
            "capped_cluster_count": sum(
                1 for c in counts.values()
                if c > similarity.SEM_MAX_CLUSTER
            ),
            "capped_vector_frac": round(capped_vec / n, 4),
            "train_sec": round(t_train, 2),
            "knn_join_sec": round(t_knn, 2),
            "recall_knn_join": recall(
                similarity.knn_join(spark, SF_DIR, quant_k=qk)
            ),
            "recall_multiprobe2": recall(
                similarity.knn_join_multiprobe(
                    spark, SF_DIR, probes=2, quant_k=qk
                )
            ),
        }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "autok_eval.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
