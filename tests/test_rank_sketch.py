"""Unit tests for the distributed global-rank operator and the
Misra-Gries heavy-hitters sketch."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from obmp_psql_spark.operators.cache import release_build_artifacts
from obmp_psql_spark.operators.rank import global_rank
from obmp_psql_spark.operators.sketch import misra_gries


def test_global_rank_matches_single_window(spark):
    # skewed values + shuffled insertion order + more partitions than
    # distinct range buckets will need
    vals = [(i * 37 % 101, i) for i in range(1000)]
    df = spark.createDataFrame(vals, "v int, id int").repartition(16)
    try:
        got = {r["id"]: r["rn"]
               for r in global_rank(df, ["v", "id"]).collect()}
    finally:
        release_build_artifacts()
    want = {r["id"]: r["rn"] for r in df.withColumn(
        "rn", F.row_number().over(W.orderBy("v", "id"))).collect()}
    assert got == want
    assert sorted(got.values()) == list(range(1, 1001))  # contiguous


def test_global_rank_empty_buckets(spark):
    # 3 rows across 8 requested buckets: most buckets empty; offsets
    # must still be contiguous
    df = spark.createDataFrame([(5, 1), (1, 2), (9, 3)], "v int, id int")
    try:
        rows = global_rank(df, ["v", "id"], num_partitions=8) \
            .orderBy("rn").collect()
    finally:
        release_build_artifacts()
    assert [(r["v"], r["rn"]) for r in rows] == [(1, 1), (5, 2), (9, 3)]


def _zipf_stream():
    # item i appears ~1000/i times: a few heavy keys, a long tail
    out = []
    for i in range(1, 200):
        out.extend([f"item{i}"] * (1000 // i))
    return out


def test_misra_gries_guarantees(spark):
    stream = _zipf_stream()
    exact = Counter(stream)
    n_total = len(stream)
    k = 10
    df = spark.createDataFrame([(s,) for s in stream], "item string") \
        .repartition(8)
    summary = {r["item"]: r["est"]
               for r in misra_gries(df, "item", k).collect()}
    retained = sum(summary.values())
    slack = n_total - retained
    # (1) never overestimates
    for item, est in summary.items():
        assert est <= exact[item]
        # (2) mergeable-summaries undercount bound
        assert (exact[item] - est) * (k + 1) <= slack
    # (3) every guaranteed heavy hitter is present
    for item, c in exact.items():
        if c * (k + 1) > slack:
            assert item in summary, f"{item} (count {c}) missing"


def test_misra_gries_small_input_is_exact(spark):
    # fewer distinct keys than k: sketch must equal exact counts
    df = spark.createDataFrame(
        [("a",), ("b",), ("a",), ("c",), ("a",), ("b",)], "item string")
    summary = {r["item"]: r["est"]
               for r in misra_gries(df, "item", 10).collect()}
    assert summary == {"a": 3, "b": 2, "c": 1}


def _py_z(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference(spark):
    from pyspark.sql import functions as F

    from obmp_psql_spark.operators.layout import z_value

    pts = [(x, y) for x in (0, 1, 5, 255, 37) for y in (0, 3, 128, 254)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y",
                     z_value(F.col("x"), F.col("y"), 8).alias("z")).collect()
    for r in rows:
        assert r["z"] == _py_z(r["x"], r["y"], 8), (r["x"], r["y"])


def test_quantize_bounds(spark):
    from pyspark.sql import functions as F

    from obmp_psql_spark.operators.layout import quantize

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (280.5,), (560.9999,), (561.0,), (9999.0,)],
        "v double")
    got = [r["q"] for r in
           df.select(quantize(F.col("v"), 0.0, 561.0, 8).alias("q"))
           .collect()]
    assert got[0] == 0          # clamped below
    assert got[1] == 0
    assert 0 < got[2] < 255     # interior
    assert got[3] == 255        # top cell
    assert got[4] == 255        # hi boundary clamps into the top cell
    assert got[5] == 255        # clamped above


def test_quantile_summary_bound_on_hard_distributions(spark):
    """Rank error of the merged summary stays within 3N/k on skewed,
    heavy-tied, and pre-sorted inputs, at a deliberately tiny k."""
    import numpy as np
    from pyspark.sql import functions as F

    from obmp_psql_spark.operators.sketch import (quantile_estimates,
                                                  quantile_summary)

    k = 32
    rng = np.random.RandomState(11)
    cases = {
        "skewed": np.concatenate([rng.exponential(1, 4000),
                                  rng.exponential(100, 400)]),
        "ties": np.repeat(np.arange(40.0), 120),
        "sorted": np.arange(5000, dtype="float64"),
    }
    for name, data in cases.items():
        df = spark.createDataFrame([(float(v),) for v in data],
                                   "v double").repartition(8)
        ests = quantile_estimates(quantile_summary(df, "v", k),
                                  [100_000, 500_000, 900_000])
        xs = np.sort(data)
        n = len(xs)
        for q, est in ests:
            target = q * n // 1_000_000
            r_lt = int(np.searchsorted(xs, est, side="left"))
            r_le = int(np.searchsorted(xs, est, side="right"))
            err = 0 if r_lt <= target <= r_le \
                else min(abs(r_lt - target), abs(r_le - target))
            assert err * k <= 3 * n, (name, q, err, n)


def test_incremental_quantile_replay_is_noop(spark, tmp_path):
    from obmp_psql_spark.operators.sketch import (
        incremental_quantile_update, quantile_estimates)
    from obmp_psql_spark.state import TxnStateStore

    store = TxnStateStore(spark, str(tmp_path / "qs"))
    df = spark.createDataFrame([(float(i),) for i in range(1000)],
                               "v double")
    incremental_quantile_update(store, df, "v", 64, batch_id=0)
    before = store.read("quantile_partials").count()
    incremental_quantile_update(store, df, "v", 64, batch_id=0)  # replay
    assert store.read("quantile_partials").count() == before
    (q, est), = quantile_estimates(store.read("quantile_partials"),
                                   [500_000])
    assert abs(est - 500.0) <= 1000 * 3 / 64


def test_cap_in_edges_deterministic_topk(spark):
    """Supernode neighbor cap: nodes at/below the cap keep every
    in-edge; above it, exactly the cap smallest md5(src-dst) digests
    survive — the same subset any engine derives, so capped LPA
    rounds stay hash-gateable."""
    import hashlib

    from obmp_psql_spark.queries_curate import cap_in_edges

    edges = [(s, 99) for s in range(10)] + [(1, 7), (2, 7)]
    sym = spark.createDataFrame(edges, "src long, dst long")
    out = cap_in_edges(sym, 3).collect()
    got_hub = sorted(r.src for r in out if r.dst == 99)
    want = sorted(range(10),
                  key=lambda s: hashlib.md5(f"{s}-99".encode()).hexdigest())[:3]
    assert got_hub == sorted(want)
    # the low-degree node is untouched (no window ran over it)
    assert sorted(r.src for r in out if r.dst == 7) == [1, 2]
