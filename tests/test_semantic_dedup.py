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


def test_shard_oversized_clusters(spark):
    """Clusters over the cap split into bounded hash shards; clusters
    under the cap keep one shard; ids never move between clusters."""
    from obmp_psql_spark.operators.similarity import shard_oversized_clusters
    rows = [(i, 1) for i in range(120)] + [(1000 + i, 2) for i in range(20)]
    a = spark.createDataFrame(rows, "vec_id long, cluster_id long")
    out = shard_oversized_clusters(a, max_cluster_size=50).collect()
    assert len(out) == 140
    big = {r.cluster_id for r in out if r.vec_id < 1000}
    small = {r.cluster_id for r in out if r.vec_id >= 1000}
    assert all(c // 65536 == 1 for c in big)
    assert small == {2 * 65536}            # under cap -> single shard 0
    assert 1 < len(big) <= 3               # ceil(120/50) = 3 shards
    from collections import Counter
    occ = Counter(r.cluster_id for r in out if r.vec_id < 1000)
    assert max(occ.values()) <= 90         # hash-balanced, well under 120


def test_arrow_and_expression_paths_agree(spark):
    """The size-gated scoring paths (expression crossJoin+window vs
    Arrow argmax) must produce the same assignment on well-separated
    data (ties up to float ulps aside)."""
    from obmp_psql_spark.operators.similarity import kmeans_assign
    aug = _aug(spark, n=60)
    with build_artifacts():
        expr = {(r.vec_id, r.cluster_id) for r in
                kmeans_assign(aug, n_clusters=4, train_iters=1,
                              arrow_threshold=1000).collect()}
        arrow = {(r.vec_id, r.cluster_id) for r in
                 kmeans_assign(aug, n_clusters=4, train_iters=1,
                               arrow_threshold=0).collect()}
    agree = len(expr & arrow) / len(expr)
    assert agree >= 0.98, f"paths agree on only {agree:.1%}"


def test_embed_outliers_bottom_band(spark):
    """The percentile cut flags ~5% of vectors, each flagged cosine
    is below every kept cosine, and every vector gets one verdict."""
    from obmp_psql_spark.registry import all_specs
    rows = all_specs()["q_embed_outliers"].fn(spark, SF_SMALL).collect()
    n = len(rows)
    out = [r for r in rows if r.is_outlier == 1]
    assert n > 0 and 0 < len(out) <= max(1, int(n * 0.07))
    worst_kept = min(r.cos_centroid for r in rows if r.is_outlier == 0)
    assert all(r.cos_centroid < worst_kept for r in out)
    assert len({r.vec_id for r in rows}) == n


def test_incremental_semantic_dedup_replay_and_crossbatch(spark):
    """Clones arriving a batch after their source are dropped with
    the source as representative; a replayed batch appends nothing;
    batch-0 rows are all kept (nothing earlier exists)."""
    import tempfile

    from obmp_psql_spark.operators.similarity import \
        incremental_semantic_dedup
    from obmp_psql_spark.state import TxnStateStore

    aug = _aug(spark, n=45)  # clones (+10000) land in batch 1
    store = TxnStateStore(spark, tempfile.mkdtemp(prefix="semdd_t_"))
    for b in range(3):
        incremental_semantic_dedup(
            store, aug.filter(F.col("vec_id") % 3 == b),
            batch_id=b, n_centroids=4, threshold=0.95)
    before = store.read("semdedup_verdicts").count()
    incremental_semantic_dedup(  # replay
        store, aug.filter(F.col("vec_id") % 3 == 1),
        batch_id=1, n_centroids=4, threshold=0.95)
    rows = store.read("semdedup_verdicts").collect()
    assert len(rows) == before  # replay appended nothing
    by_id = {r.vec_id: r for r in rows}
    clones = [r for r in rows if r.vec_id >= 10000]
    assert clones and all(c.kept == 0 and c.dup_of == c.vec_id - 10000
                          for c in clones)
    assert all(r.kept == 1 for r in rows if r.batch_id == 0)
    for c in clones:  # same cluster as the source (identical vector)
        assert by_id[c.dup_of].cluster_id == c.cluster_id


def test_band_oversized_clusters_coband_and_cap(spark):
    """Centered-LSH pre-banding: near-identical vectors in an
    oversized cluster land in the SAME sub-block (the recall
    property), opposite-side vectors split, under-cap clusters pass
    through whole, and the residual hash cap bounds occupancy."""
    import numpy as np
    from collections import Counter

    from obmp_psql_spark.operators.similarity import band_oversized_clusters

    rng = np.random.RandomState(3)
    rows = []
    # oversized cluster 1: two tight antipodal lobes around a centroid
    for i in range(60):
        v = (np.array([10.0, 0.0, 0.0])
             + (1 if i % 2 == 0 else -1) * np.array([1.0, 1.0, 1.0])
             + rng.normal(0, 0.01, 3))
        rows.append((i, 1, [float(x) for x in v]))
    # near-duplicate pair injected into the same lobe
    rows.append((900, 1, [11.0, 1.0, 1.0]))
    rows.append((901, 1, [11.0, 1.0, 1.0001]))
    # under-cap cluster 2
    for i in range(10):
        rows.append((1000 + i, 2, [0.0, 5.0, float(i) * 0.01]))
    df = spark.createDataFrame(rows,
                               "vec_id long, cluster_id long, "
                               "embedding array<double>")
    assigned = df.select("vec_id", "cluster_id")
    out = band_oversized_clusters(assigned, df, max_cluster_size=40,
                                  n_planes=2).collect()
    assert len(out) == len(rows)
    key = {r.vec_id: r.cluster_id for r in out}
    # the near-dup pair co-bands (this is the whole point)
    assert key[900] == key[901]
    # under-cap cluster: exactly one block
    assert len({key[1000 + i] for i in range(10)}) == 1
    # residual cap holds
    occ = Counter(key.values())
    assert max(occ.values()) <= 40
    # banding actually split the oversized cluster
    big_blocks = {key[i] for i in range(60)}
    assert len(big_blocks) >= 2
    # an assignment row with NO vector must survive into the published
    # blocking table (round-8 review regression: inner join dropped it)
    assigned2 = assigned.unionByName(
        spark.createDataFrame([(5000, 1)], "vec_id long, cluster_id long"))
    out2 = band_oversized_clusters(assigned2, df, max_cluster_size=40,
                                   n_planes=2).collect()
    assert len(out2) == len(rows) + 1
    assert any(r.vec_id == 5000 for r in out2)


def test_shard_oversized_clusters_auto_cap(spark):
    """'auto' applies the lsh_topk work-budget law: identical sharding
    to passing max(FLOOR, ceil(sqrt(MULT*N))) explicitly."""
    import math

    from obmp_psql_spark.operators.similarity import (
        LSH_AUTO_CAP_FLOOR,
        LSH_AUTO_CAP_MULT,
        shard_oversized_clusters,
    )
    n = 400
    rows = [(i, 1) for i in range(n - 20)] + \
           [(10_000 + i, 2) for i in range(20)]
    a = spark.createDataFrame(rows, "vec_id long, cluster_id long")
    cap = max(LSH_AUTO_CAP_FLOOR,
              math.ceil(math.sqrt(LSH_AUTO_CAP_MULT * n)))
    auto = {(r.vec_id, r.cluster_id) for r in
            shard_oversized_clusters(a, max_cluster_size="auto").collect()}
    manual = {(r.vec_id, r.cluster_id) for r in
              shard_oversized_clusters(a, max_cluster_size=cap).collect()}
    assert auto == manual
    shards = {c for _, c in auto if c // 65536 == 1}
    assert len(shards) == math.ceil((n - 20) / cap)  # cap really engaged
