"""Driver-contract parity: every oracle-backed query in
``__spark_entry__`` must match its DuckDB SQL on the same parquet —
the same comparison the round driver performs (row count + sorted
values under sorted column names)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        # round FIRST, then collapse -0.0: a value like -4e-07 rounds
        # to -0.0 and must compare equal to +0.0 at the 6-dp tolerance
        return f"{round(v, 6) + 0.0:.6f}"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


QUERY_KEYS = sorted(entry_mod.oracle_sql().keys())


def test_every_oracle_has_a_query():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


@pytest.mark.parametrize("key", QUERY_KEYS)
def test_parity(spark, sf_dir, ddb, key):
    q = entry_mod.queries()[key]
    sdf = q(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = ddb.execute(entry_mod.oracle_sql()[key])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert len(spark_rows) == len(duck_rows), (
        f"{key}: row count {len(spark_rows)} (spark) != {len(duck_rows)} (duckdb)"
    )
    s_norm, s_cols = _normalize(spark_rows, spark_cols)
    d_norm, d_cols = _normalize(duck_rows, duck_cols)
    assert s_cols == d_cols, f"{key}: columns {s_cols} != {d_cols}"
    mism = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mism, f"{key}: {len(mism)} mismatching rows, first: {mism[:3]}"


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without oracles must still execute and return rows."""
    qs = entry_mod.queries()
    no_oracle = set(qs) - set(entry_mod.oracle_sql())
    for key in sorted(no_oracle):
        n = qs[key](spark, sf_dir).count()
        assert n > 0, key  # empty results are regressions, not passes


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert df.count() > 0 and len(rows) > 0


def test_ann_variants_recall(spark, sf_dir):
    """Approximate searches must overlap the brute-force ground truth."""
    qs = entry_mod.queries()
    brute = [r.vec_id for r in qs["ann_cosine_topk"](spark, sf_dir).collect()]
    ivf = {r.vec_id for r in qs["ann_ivf_topk"](spark, sf_dir).collect()}
    lsh = {r.vec_id for r in qs["ann_lsh_topk"](spark, sf_dir).collect()}
    assert len(ivf & set(brute)) >= 3, (brute, ivf)
    assert len(lsh) > 0
    # IVF with all lists probed == exact brute force
    from service1_text_extraction_spark.functions import similarity

    exact = [
        r.vec_id
        for r in similarity.ivf_ann_topk(
            spark, sf_dir, n_probe=similarity.K_LISTS
        ).collect()
    ]
    assert exact == brute


def test_driver_cap_discipline():
    """The round driver's CORRECTNESS check covers only the FIRST 50
    queries() entries. Every query the driver has NEVER hash-verified
    must sit inside positions 1-50; the tail (51+) may hold only
    driver-green queries (still covered here by test_parity)."""
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    greens: dict[str, int] = {}
    for fn in sorted(os.listdir(repo)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            with open(os.path.join(repo, fn)) as f:
                for k, v in json.load(f).items():
                    if v.get("hash_match"):
                        greens[k] = greens.get(k, 0) + 1
    tail = list(entry_mod.queries())[50:]
    weak = [k for k in tail if greens.get(k, 0) < 1]
    assert not weak, (
        f"never-driver-verified queries outside the driver's 50-cap: "
        f"{weak} — rotate them into positions 1-50"
    )


def test_bench_keys_are_query_keys():
    """VERDICT r5 item 7: every timed key bench.py emits must be the
    exact queries() key of the function it times, so BENCH_r*.json
    rows join to CORRECTNESS_r*.json rows without a hand-kept map."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "bench.py")) as f:
        src = f.read()
    bench_keys = re.findall(
        r'^\s{8}"([a-z0-9_]+)": (?:q\(|bench_extract)', src, re.M
    )
    assert len(bench_keys) >= 40  # the headline suite, not a subset
    unmatched = [k for k in bench_keys if k not in entry_mod.queries()]
    assert not unmatched, unmatched


def test_assign_paths_agree(spark, sf_dir):
    """The literal-projection and broadcast-join centroid assignment
    paths must be bit-equal (same quantized dots, same tie-break) —
    the oracle covers the literal path; this pins the large-k path to
    it."""
    from service1_text_extraction_spark.functions import similarity

    e = similarity._emb(spark, sf_dir).select("vec_id", "embedding")
    cents = similarity._kmeans_centroids(spark, sf_dir)
    lit = similarity._assigned(spark, e, cents, use_join=False)
    join = similarity._assigned(spark, e, cents, use_join=True)
    a = {r.vec_id: r.list_id for r in lit.collect()}
    b = {r.vec_id: r.list_id for r in join.collect()}
    assert a == b


def test_decontaminate_two_table_form(spark, sf_dir, tmp_path):
    """decontaminate must accept a genuinely external benchmark table
    (VERDICT r3): grams from the supplied DataFrame, corpus untouched
    by any magic doc_id constant — and the production 13-gram width
    must be selectable."""
    from service1_text_extraction_spark.functions import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    one = docs.orderBy("doc_id").limit(1).collect()[0]
    bench = spark.createDataFrame([(one.text,)], "text string")
    out = dedup.decontaminate(spark, sf_dir, benchmark=bench)
    hits = {r.doc_id: r.n_hits for r in out.collect()}
    # the source document flags itself (verbatim contamination)
    assert hits.get(one.doc_id, 0) >= 1
    # 13-gram production width runs and can only tighten the match set
    out13 = dedup.decontaminate(
        spark, sf_dir, benchmark=bench, gram_len=dedup.DECON_GRAM_PROD
    )
    hits13 = {r.doc_id: r.n_hits for r in out13.collect()}
    assert set(hits13) <= set(hits) or hits13 == {}


def test_cc_propagation_converges_on_deep_chain(spark):
    """Review r4: min-label propagation alone needs diameter rounds;
    with pointer jumping a 60-node path (diameter 59 > max_iters=20)
    must still converge to the single component min."""
    from service1_text_extraction_spark.functions import similarity

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "a_id long, b_id long"
    )
    # driver_max_edges=0 forces the DISTRIBUTED loop — the r5 driver
    # union-find shortcut would otherwise absorb this small graph
    labels = {
        r.vec_id: r.label
        for r in similarity._cc_min_labels(
            edges, max_iters=20, driver_max_edges=0
        ).collect()
    }
    assert len(labels) == 60 and set(labels.values()) == {0}
    # two components + an isolated pair keep distinct minima
    edges2 = spark.createDataFrame(
        [(i, i + 1) for i in range(10)]
        + [(100 + i, 101 + i) for i in range(10)]
        + [(500, 501)],
        "a_id long, b_id long",
    )
    labels2 = {
        r.vec_id: r.label
        for r in similarity._cc_min_labels(
            edges2, driver_max_edges=0
        ).collect()
    }
    assert set(labels2.values()) == {0, 100, 500}


def test_cc_driver_and_distributed_agree(spark, sf_dir):
    """The r5 driver union-find shortcut is a pure execution knob:
    labels must be identical to the distributed fixpoint on a
    multi-component graph AND on the real minhash bucket graph."""
    from service1_text_extraction_spark.functions import (
        dedup,
        similarity,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(25)]
        + [(40, 41), (41, 42), (40, 42)]
        + [(77, 99), (99, 55)],
        "a_id long, b_id long",
    )
    drv = sorted(
        map(tuple, similarity._cc_min_labels(edges).collect())
    )
    dst = sorted(
        map(
            tuple,
            similarity._cc_min_labels(
                edges, driver_max_edges=0
            ).collect(),
        )
    )
    assert drv == dst and drv

    mh_drv = sorted(
        map(tuple, dedup.minhash_connected_components(spark, sf_dir).collect())
    )
    mh_dst = sorted(
        map(
            tuple,
            dedup.minhash_connected_components(
                spark, sf_dir, driver_max_edges=0
            ).collect(),
        )
    )
    assert mh_drv == mh_dst and mh_drv


def _mock_centroids(spark, sf_dir, k):
    """k > join/arrow thresholds: fake centroids shaped like real ones
    (6-dp-rounded doubles), so the large-k paths engage on the small
    test corpus."""
    from service1_text_extraction_spark.functions import similarity

    rows = (
        similarity._emb(spark, sf_dir)
        .orderBy("vec_id")
        .limit(k)
        .collect()
    )
    return [[round(float(x), 6) for x in r.embedding] for r in rows]


def test_assign_arrow_large_k(spark, sf_dir):
    """At k > ASSIGN_ARROW_K the default assignment path is the
    Arrow numpy fold; it must be bit-equal to BOTH the centroid-literal
    projection and the broadcast-join struct-max (the fold performs
    the identical IEEE op sequence per element — _fold_dots)."""
    from service1_text_extraction_spark.functions import similarity

    e = similarity._emb(spark, sf_dir).select("vec_id", "embedding")
    cents = _mock_centroids(spark, sf_dir, similarity.ASSIGN_BROADCAST_K + 6)
    arrow = {
        r.vec_id: r.list_id
        for r in similarity._assigned(spark, e, cents).collect()
    }
    lit = {
        r.vec_id: r.list_id
        for r in similarity._assigned(
            spark, e, cents, use_join=False
        ).collect()
    }
    join = {
        r.vec_id: r.list_id
        for r in similarity._assigned(
            spark, e, cents, use_join=True
        ).collect()
    }
    assert arrow == lit == join and arrow


def test_probe_paths_agree(spark, sf_dir):
    """_probe_lists' three strategies (literal structs, broadcast-join
    window, Arrow top-P) must produce the identical ranked probe table
    at large k, and probe_rank 1 must reproduce the
    primary assignment."""
    from service1_text_extraction_spark.functions import similarity

    e = similarity._emb(spark, sf_dir).select("vec_id", "embedding")
    cents = _mock_centroids(spark, sf_dir, similarity.ASSIGN_BROADCAST_K + 6)
    probes = 3

    def key(df):
        return sorted(
            (r.vec_id, r.probe_rank, r.list_id) for r in df.collect()
        )

    arrow = key(similarity._probe_lists(spark, e, cents, probes))
    small = key(
        similarity._probe_lists(spark, e, cents, probes, use_join=False)
    )
    join = key(
        similarity._probe_lists(spark, e, cents, probes, use_join=True)
    )
    assert arrow == small == join and arrow
    primary = {
        r.vec_id: r.list_id
        for r in similarity._assigned(spark, e, cents).collect()
    }
    rank1 = {v: li for (v, pr, li) in arrow if pr == 1}
    assert rank1 == primary


def test_simhash_paths_agree(spark, sf_dir):
    """The Arrow per-doc SimHash (default) and the SQL
    explode+distinct+groupBy shape must produce identical fingerprints
    and identical near-dup pairs — both are exact integer math over
    the same md5 nibbles, including Java-\\s-only tokenization and
    absent-row semantics for token-less documents."""
    from service1_text_extraction_spark.functions import dedup

    def both(fn):
        prev = dedup.SIMHASH_STRATEGY
        try:
            dedup.SIMHASH_STRATEGY = "arrow"
            a = sorted(map(tuple, fn().collect()))
            dedup.SIMHASH_STRATEGY = "sql"
            b = sorted(map(tuple, fn().collect()))
        finally:
            dedup.SIMHASH_STRATEGY = prev
        return a, b

    fa, fb = both(lambda: dedup.simhash_fingerprints(spark, sf_dir))
    assert fa == fb and fa
    pa, pb = both(lambda: dedup.simhash_neardup_pairs(spark, sf_dir))
    assert pa == pb


def test_simhash_arrow_tokenizer_edges(spark):
    """Arrow SimHash must replicate Spark's split semantics exactly:
    Java \\s is ASCII-only (a non-breaking space is NOT a separator),
    and null/whitespace-only docs are ABSENT (as the SQL explode emits
    no row), not null-fingerprinted."""
    from service1_text_extraction_spark.functions import dedup

    rows = [
        (1, "Hello\tWorld\nhello  world"),
        (2, "nbsp joined stays one-token"),
        (3, "   \t  "),
        (4, None),
        (5, "x"),
    ]
    import os
    import tempfile

    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "d")
        df.write.parquet(os.path.join(path, "documents.parquet"))
        prev = dedup.SIMHASH_STRATEGY
        try:
            dedup.SIMHASH_STRATEGY = "arrow"
            a = {r.doc_id: r.simhash
                 for r in dedup.simhash_fingerprints(spark, path).collect()}
            dedup.SIMHASH_STRATEGY = "sql"
            b = {r.doc_id: r.simhash
                 for r in dedup.simhash_fingerprints(spark, path).collect()}
        finally:
            dedup.SIMHASH_STRATEGY = prev
    assert a == b
    assert set(a) == {1, 2, 5}  # 3 (ws-only) and 4 (null) absent
    assert all(len(v) == 64 and set(v) <= {"0", "1"} for v in a.values())


def test_minhash_paths_agree(spark, sf_dir):
    """The Arrow per-doc MinHash (default) and the SQL
    explode+distinct+groupBy shape must produce identical signatures
    and identical band candidates — both are the same (a + i*b) mod
    2^32 integer math over the same md5 halves, and min() makes the
    SQL path's shingle dedup semantically inert."""
    from service1_text_extraction_spark.functions import dedup

    def both(fn):
        prev = dedup.MINHASH_STRATEGY
        try:
            dedup.MINHASH_STRATEGY = "arrow"
            a = sorted(map(tuple, fn().collect()))
            dedup.MINHASH_STRATEGY = "sql"
            b = sorted(map(tuple, fn().collect()))
        finally:
            dedup.MINHASH_STRATEGY = prev
        return a, b

    sa, sb = both(lambda: dedup.minhash_signatures(spark, sf_dir))
    assert sa == sb and sa
    ca, cb = both(lambda: dedup.minhash_band_candidates(spark, sf_dir))
    assert ca == cb


def test_minhash_arrow_shingle_edges(spark):
    """Arrow MinHash must replicate SHINGLES_OF_T's short-document
    fallback exactly: <3 tokens collapse to ONE concat_ws shingle —
    '' for null/whitespace-only docs (which therefore DO get a
    signature, unlike SimHash's absent rows), the bare token for
    1-token docs, 'a b' for 2-token docs — and Java-\\s-only splitting
    (NBSP and U+2028 do NOT separate tokens)."""
    from service1_text_extraction_spark.functions import dedup

    rows = [
        (1, "one two three four"),     # 2 shingles
        (2, "one two"),                # single joined shingle
        (3, "solo"),                   # bare-token shingle
        (4, "   \t  "),                # token-less -> '' shingle
        (5, None),                     # null -> '' shingle
        (6, "nbsp pair stays one token"),
        (7, "line sep also one token"),
    ]
    import os
    import tempfile

    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "d")
        df.write.parquet(os.path.join(path, "documents.parquet"))

        prev = dedup.MINHASH_STRATEGY
        try:
            dedup.MINHASH_STRATEGY = "arrow"
            a = sorted(
                map(tuple, dedup.minhash_signatures(spark, path).collect())
            )
            dedup.MINHASH_STRATEGY = "sql"
            b = sorted(
                map(tuple, dedup.minhash_signatures(spark, path).collect())
            )
        finally:
            dedup.MINHASH_STRATEGY = prev
    assert a == b
    assert [r[0] for r in a] == [1, 2, 3, 4, 5, 6, 7]
    # 4 and 5 share the '' shingle, hence identical signatures
    assert a[3][1:] == a[4][1:]


def test_pair_dot_paths_agree(spark, sf_dir):
    """The Arrow pair-dot fold must be bit-equal to the interpreted
    JVM ``aggregate(zip_with(...))`` form (sequential per-dimension
    accumulation — the _fold_dots argument applied to pairs): the
    semantic-dedup edge set, with its 4dp-rounded cosines, must be
    identical under both strategies."""
    from service1_text_extraction_spark.functions import similarity

    prev = similarity.PAIR_DOT_STRATEGY
    try:
        similarity.PAIR_DOT_STRATEGY = "arrow"
        arrow = {
            (r.a_id, r.b_id): r.cos
            for r in similarity.semantic_dedup(spark, sf_dir).collect()
        }
        similarity.PAIR_DOT_STRATEGY = "sql"
        sql = {
            (r.a_id, r.b_id): r.cos
            for r in similarity.semantic_dedup(spark, sf_dir).collect()
        }
    finally:
        similarity.PAIR_DOT_STRATEGY = prev
    assert arrow == sql


def test_fingerprint_paths_agree(spark, sf_dir):
    """The Arrow min-md5-8-gram kernel must emit the identical hex
    fingerprint as the SQL transform/array_min form (min-by-digest ==
    min-by-hex: hex encoding is byte-wise monotone), including the
    short-text (single truncated gram) fallback."""
    from service1_text_extraction_spark.functions import textstats

    prev = textstats.FP_STRATEGY
    try:
        textstats.FP_STRATEGY = "arrow"
        arrow = {
            r.doc_id: r.fingerprint
            for r in textstats.doc_fingerprint(spark, sf_dir).collect()
        }
        textstats.FP_STRATEGY = "sql"
        sql = {
            r.doc_id: r.fingerprint
            for r in textstats.doc_fingerprint(spark, sf_dir).collect()
        }
    finally:
        textstats.FP_STRATEGY = prev
    assert arrow == sql


def test_verified_pairs_affix_trim_matches_plain_lev(spark, sf_dir):
    """The common-affix-stripped Levenshtein must reproduce the plain
    full-text DP bit-for-bit (distance is invariant under common
    prefix/suffix removal), banded and unbanded."""
    from service1_text_extraction_spark.functions import dedup

    plain = dedup.minhash_verified_pairs(spark, sf_dir)
    banded = dedup.minhash_verified_pairs(spark, sf_dir, banded=True)
    a = {(r.a_id, r.b_id): (r.lev, r.dist_frac) for r in plain.collect()}
    b = {(r.a_id, r.b_id): (r.lev, r.dist_frac) for r in banded.collect()}
    assert a == b


def test_shingle_sketch_paths_agree(spark, sf_dir):
    """The Arrow shingle-sketch kernel must reproduce the SQL
    explode+md5 derivation exactly: identical HLL estimates and OPH
    stripe-Jaccard rows under both strategies (the sketch merges are
    order-free integer max/sum/min, so equality is structural)."""
    from service1_text_extraction_spark.functions import dedup

    prev = dedup.SHINGLE_SKETCH_STRATEGY
    out = {}
    try:
        for strat in ("arrow", "sql"):
            dedup.SHINGLE_SKETCH_STRATEGY = strat
            hll = sorted(
                map(
                    tuple,
                    dedup.hll_distinct_shingles(spark, sf_dir).collect(),
                )
            )
            oph = sorted(
                map(
                    tuple,
                    dedup.minhash_source_jaccard(spark, sf_dir).collect(),
                )
            )
            ovl = sorted(
                map(
                    tuple,
                    dedup.source_overlap_stats(spark, sf_dir).collect(),
                )
            )
            out[strat] = (hll, oph, ovl)
    finally:
        dedup.SHINGLE_SKETCH_STRATEGY = prev
    assert out["arrow"] == out["sql"]
