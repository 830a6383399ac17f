"""The O(L) Arrow scan UDFs (_ewma_scan / _hw_scan) replaced the
O(L^2) F.aggregate concat-folds in round 14; these tests pin them
against independent sequential Python models — including seeded
resume state, decreasing series that drive the Holt-Winters trend
negative (floor-vs-truncate divergence territory), empty series, and
single-element series."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def ewma_model(init: int, cnts: list[int]) -> tuple[int, list]:
    e = init
    eps: list = []
    for x in cnts:
        eps.append(None if e < 0 else e)
        e = x if e < 0 else (3 * e + x) // 4
    return e, eps


def hw_model(cnts_milli: list[int]) -> tuple[list, list]:
    seen, lev, tr = False, 0, 0
    fs: list = []
    ts: list = []
    for x in cnts_milli:
        if not seen:
            fs.append(None)
            ts.append(None)
            lev, tr, seen = x, 0, True
        else:
            fs.append(lev + tr)
            ts.append(tr)
            new_lev = (3 * (lev + tr) + x) // 4
            tr = (new_lev - lev + 7 * tr) // 8
            lev = new_lev
    return fs, ts


SERIES = [
    [],
    [7],
    [0, 0, 0, 0],
    [5, 9, 2, 40, 1, 1, 1],
    list(range(100, 0, -7)),          # steadily decreasing -> negative trend
    [10_000, 1, 10_000, 1, 10_000],   # oscillating
    [3] * 50,
]


@pytest.mark.parametrize("init", [-1, 0, 5, 123])
def test_ewma_scan_matches_model(spark, init):
    from obmp_psql_spark.queries_olap import _ewma_scan

    rows = [(i, s) for i, s in enumerate(SERIES)]
    df = spark.createDataFrame(rows, "k int, cs array<long>")
    out = df.select(
        "k", _ewma_scan(F.lit(init).cast("long"), F.col("cs")).alias("s"))
    got = {r["k"]: (r["s"]["e"], list(r["s"]["eps"])) for r in out.collect()}
    for i, s in enumerate(SERIES):
        want_e, want_eps = ewma_model(init, s)
        assert got[i] == (want_e, want_eps), (init, s)


def test_hw_scan_matches_model(spark):
    from obmp_psql_spark.queries_olap import _hw_scan

    rows = [(i, [x * 1000 for x in s]) for i, s in enumerate(SERIES)]
    df = spark.createDataFrame(rows, "k int, cs array<long>")
    out = df.select("k", _hw_scan(F.col("cs")).alias("s"))
    got = {r["k"]: (list(r["s"]["fs"]), list(r["s"]["ts"]))
           for r in out.collect()}
    for i, s in enumerate(SERIES):
        want = hw_model([x * 1000 for x in s])
        assert got[i] == want, s
    # the decreasing series must actually exercise a negative trend,
    # or the floor-division pin proves nothing
    neg_fs, neg_ts = hw_model([x * 1000 for x in SERIES[4]])
    assert any(t is not None and t < 0 for t in neg_ts)


def test_hw_scan_matches_legacy_fold(spark):
    """Bit-equality with the ORIGINAL F.aggregate concat-fold the scan
    replaced (kept here as the independent in-engine reference)."""
    from obmp_psql_spark.queries_olap import _hw_scan

    rows = [(i, [x * 1000 for x in s]) for i, s in enumerate(SERIES) if s]
    df = spark.createDataFrame(rows, "k int, cs array<long>")
    nul = F.lit(None).cast("long")
    folded = F.aggregate(
        F.col("cs"),
        F.struct(F.lit(False).alias("seen"),
                 F.lit(0).cast("long").alias("lev"),
                 F.lit(0).cast("long").alias("tr"),
                 F.array().cast("array<long>").alias("fs"),
                 F.array().cast("array<long>").alias("ts")),
        lambda acc, x: F.struct(
            F.lit(True).alias("seen"),
            F.when(~acc["seen"], x)
             .otherwise(F.floor((3 * (acc["lev"] + acc["tr"]) + x) / 4)
                        .cast("long")).alias("lev"),
            F.when(~acc["seen"], F.lit(0).cast("long"))
             .otherwise(F.floor(
                 (F.floor((3 * (acc["lev"] + acc["tr"]) + x) / 4)
                  .cast("long") - acc["lev"] + 7 * acc["tr"]) / 8)
                 .cast("long")).alias("tr"),
            F.concat(acc["fs"], F.array(
                F.when(~acc["seen"], nul)
                 .otherwise(acc["lev"] + acc["tr"]))).alias("fs"),
            F.concat(acc["ts"], F.array(
                F.when(~acc["seen"], nul)
                 .otherwise(acc["tr"]))).alias("ts")))
    out = df.select(
        "k",
        folded["fs"].alias("ffs"), folded["ts"].alias("fts"),
        _hw_scan(F.col("cs")).alias("s")).collect()
    for r in out:
        assert list(r["s"]["fs"]) == list(r["ffs"])
        assert list(r["s"]["ts"]) == list(r["fts"])


def test_empty_df_has_zero_partitions(spark):
    from obmp_psql_spark.session import empty_df

    e = empty_df(spark, "a long, b string")
    assert e.rdd.getNumPartitions() == 0
    assert e.count() == 0
    assert [f.name for f in e.schema.fields] == ["a", "b"]
