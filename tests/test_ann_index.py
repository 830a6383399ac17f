"""Incremental IVF index maintenance: batch-equivalence, exactly-once
replay, per-index counter isolation (the vector-index analog of the
incremental MinHash tests)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from obmp_psql_spark.operators.similarity import incremental_ivf_assignments
from obmp_psql_spark.state import TxnStateStore

from .conftest import SF_SMALL


def _vecs(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet") \
        .select("vec_id", "embedding").limit(60)


def _assignments(store):
    return {(r.vec_id, r.centroid)
            for r in store.read("ivf_assignments").collect()}


def test_incremental_ivf_split_invariant(spark):
    """Two different batch splits sharing the SAME first batch (which
    fixes the codebook seeds) accumulate identical assignment sets;
    replays are no-ops and nothing is assigned twice."""
    v = _vecs(spark)
    batch_expr = F.pmod(F.col("vec_id"), F.lit(3))

    a = TxnStateStore(spark, tempfile.mkdtemp(prefix="ivf_sp3_"))
    for b in range(3):
        incremental_ivf_assignments(a, v.filter(batch_expr == b),
                                    batch_id=b, n_centroids=4)
    for b in range(3):  # replay every batch: all must be no-ops
        incremental_ivf_assignments(a, v.filter(batch_expr == b),
                                    batch_id=b, n_centroids=4)

    b_ = TxnStateStore(spark, tempfile.mkdtemp(prefix="ivf_sp2_"))
    incremental_ivf_assignments(b_, v.filter(batch_expr == 0),
                                batch_id=0, n_centroids=4)
    incremental_ivf_assignments(b_, v.filter(batch_expr != 0),
                                batch_id=1, n_centroids=4)

    got = _assignments(a)
    assert got == _assignments(b_)
    n = a.read("ivf_assignments").count()
    assert n == v.count()  # every vector assigned...
    assert len(got) == n   # ...exactly once (no duplicate rows)


def test_incremental_ivf_two_indexes_one_store(spark):
    """Two indexes in one store keep independent replay counters and
    independent codebooks."""
    v = _vecs(spark)
    store = TxnStateStore(spark, tempfile.mkdtemp(prefix="ivf_two_"))
    incremental_ivf_assignments(store, v, batch_id=0, n_centroids=4)
    # batch 0 of a second index must not be skipped as a replay
    incremental_ivf_assignments(store, v, batch_id=0, n_centroids=4,
                                centroids_table="alt_cents",
                                assign_table="alt_assign")
    assert store.read("alt_assign").count() == v.count()
    base = _assignments(store)
    alt = {(r.vec_id, r.centroid)
           for r in store.read("alt_assign").collect()}
    assert alt == base  # same corpus, same params => same index


def test_incremental_ivf_assignment_deterministic(spark):
    """Re-building the same index twice yields identical rows — the
    6dp-rounded distance + lowest-cid tie-break pins the argmin."""
    v = _vecs(spark)
    a = TxnStateStore(spark, tempfile.mkdtemp(prefix="ivf_a_"))
    b = TxnStateStore(spark, tempfile.mkdtemp(prefix="ivf_b_"))
    incremental_ivf_assignments(a, v, batch_id=0, n_centroids=4)
    incremental_ivf_assignments(b, v, batch_id=0, n_centroids=4)
    assert _assignments(a) == _assignments(b)


def test_minhash_estimate_within_sketch_bound(spark):
    """The signature-agreement estimate the gate hands off must
    actually track the exact Jaccard: with 16 hashes the standard
    error is sqrt(J(1-J)/16) <= 0.125, so a 0.15 mean absolute error
    (150k ppm) is a generous ceiling over banding-selected pairs
    (which skew toward high J, where the estimator is tightest)."""
    from pyspark.sql import functions as F

    from obmp_psql_spark.queries_text import q_minhash_est_gate

    rows = q_minhash_est_gate(spark, SF_SMALL)
    stats = rows.agg(F.avg("err_ppm").alias("mean_err"),
                     F.count(F.lit(1)).alias("n")).collect()[0]
    assert stats.n > 0
    assert stats.mean_err <= 150_000, stats.mean_err


def test_lsh_topk_auto_cap_equivalence(spark):
    """lsh_topk's work-budget auto cap: 'auto' produces the identical
    result to passing max(FLOOR, ceil(sqrt(MULT*N))) explicitly, and on
    a one-cluster corpus (every vector in the same sign bucket) the
    shard column actually engages when N exceeds the cap."""
    import math

    from obmp_psql_spark.operators.similarity import (
        LSH_AUTO_CAP_FLOOR,
        LSH_AUTO_CAP_MULT,
        lsh_topk,
    )

    # all-positive vectors share every hyperplane sign -> one bucket
    n = 200
    rows = [(i, [1.0 + (i % 7) * 0.01, 2.0 + (i % 5) * 0.01,
                 0.5 + (i % 3) * 0.01, 1.5]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cap = max(LSH_AUTO_CAP_FLOOR,
              math.ceil(math.sqrt(LSH_AUTO_CAP_MULT * n)))
    kw = dict(id_col="vec_id", vec_col="embedding", dims=4, n_planes=4, k=3)
    auto = {(r.query_id, r.neighbor_id, r.rank)
            for r in lsh_topk(df, max_bucket_size="auto", **kw).collect()}
    manual = {(r.query_id, r.neighbor_id, r.rank)
              for r in lsh_topk(df, max_bucket_size=cap, **kw).collect()}
    assert auto == manual
    assert len({q for q, _, _ in auto}) == n  # every query keeps candidates
    # the shard bound is real: no candidate set exceeds the cap
    from pyspark.sql import functions as F
    cand = lsh_topk(df, max_bucket_size="auto", **kw) \
        .groupBy("query_id").agg(F.count(F.lit(1)).alias("c"))
    assert cand.agg(F.max("c")).collect()[0][0] <= 3  # k bound holds


def test_ivf_refine_arrow_expression_parity(spark):
    """_kmeans_refine's size-gated assignment (round 11): the Arrow
    BLAS argmax path (codebook above arrow_threshold) and the
    broadcast-crossJoin expression path walk the same Lloyd
    trajectory on well-separated data, so ivf_topk returns the same
    neighbor sets either way (ties up to float ulps aside)."""
    from obmp_psql_spark.operators.cache import build_artifacts
    from obmp_psql_spark.operators.similarity import ivf_topk

    v = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet") \
        .select("vec_id", "embedding").limit(120)
    kw = dict(n_centroids=8, nprobe=2, k=3, train_iters=2, max_queries=30)
    with build_artifacts():
        expr = {(r.query_id, r.neighbor_id) for r in
                ivf_topk(v, arrow_threshold=1000, **kw).collect()}
    with build_artifacts():
        arrow = {(r.query_id, r.neighbor_id) for r in
                 ivf_topk(v, arrow_threshold=0, **kw).collect()}
    agree = len(expr & arrow) / max(len(expr), 1)
    assert agree >= 0.98, f"paths agree on only {agree:.1%}"
