"""SemDeDup semantic dedup: clone co-clustering, keep-lowest-id drop
rule, and representative chaining invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from obmp_psql_spark.operators.cache import build_artifacts
from obmp_psql_spark.operators.similarity import (
    kmeans_assign, semantic_dedup_within)

from .conftest import SF_SMALL


def _aug(spark, n=60):
    e = (spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
         .select("vec_id", "embedding").filter(F.col("vec_id") < n))
    return e.unionByName(
        e.filter(F.col("vec_id") % 3 == 0)
         .withColumn("vec_id", F.col("vec_id") + 10000))


def test_clones_cocluster_and_drop(spark):
    """An exact clone lands in its source's cluster and is dropped
    with the source (lower id) as representative; every dropped row
    names a lower-id rep in the same cluster."""
    aug = _aug(spark)
    with build_artifacts():
        assigned = kmeans_assign(aug, n_clusters=4, train_iters=1)
        rows = semantic_dedup_within(assigned, aug,
                                     threshold=0.95).collect()
    by_id = {r.vec_id: r for r in rows}
    assert len(by_id) == len(rows)  # one verdict per vector
    clones = [r for r in rows if r.vec_id >= 10000]
    assert clones, "clone injection produced no rows"
    for c in clones:
        src = by_id[c.vec_id - 10000]
        assert c.cluster_id == src.cluster_id  # identical vec, same top-1
        assert c.kept == 0 and c.dup_of is not None
        assert c.dup_of <= c.vec_id - 10000
    for r in rows:
        if r.kept == 0:
            rep = by_id[r.dup_of]
            assert r.dup_of < r.vec_id
            assert rep.cluster_id == r.cluster_id


def test_no_threshold_no_drops(spark):
    """With an impossible threshold nothing is dropped: kept=1,
    dup_of NULL for every row."""
    aug = _aug(spark, n=30)
    with build_artifacts():
        assigned = kmeans_assign(aug, n_clusters=3, train_iters=0)
        rows = semantic_dedup_within(assigned, aug,
                                     threshold=1.5).collect()
    assert rows and all(r.kept == 1 and r.dup_of is None for r in rows)
