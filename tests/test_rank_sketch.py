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
