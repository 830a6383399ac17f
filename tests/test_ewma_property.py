"""Property: the q_rate_anomaly EWMA fold (array aggregate with
integer floor division) must match a sequential Python reference on
arbitrary per-key count series — including single-bucket keys,
constant series, and spikes."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def model(cnts: list[int]) -> list[tuple]:
    e = None
    out = []
    for x in cnts:
        flag = int(e is not None and x > 2 * e)
        out.append((x, e, flag))
        e = x if e is None else (3 * e + x) // 4
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(st.integers(min_value=0, max_value=10_000),
                         min_size=1, max_size=12),
                min_size=1, max_size=3))
def test_ewma_fold_matches_sequential_model(spark_session_holder, series):
    spark = spark_session_holder
    rows = [(f"k{k}", i, int(c))
            for k, cnts in enumerate(series)
            for i, c in enumerate(cnts)]
    cnts = spark.createDataFrame(rows,
                                 "peer string, minute_epoch long, cnt long")
    g = cnts.groupBy("peer").agg(
        F.sort_array(F.collect_list(F.struct("minute_epoch", "cnt")))
         .alias("arr"))
    cs = F.transform("arr", lambda s: s["cnt"])
    folded = F.aggregate(
        cs,
        F.struct(F.lit(-1).cast("long").alias("e"),
                 F.array().cast("array<long>").alias("eps")),
        lambda acc, x: F.struct(
            F.when(acc["e"] < 0, x)
             .otherwise(F.floor((acc["e"] * 3 + x) / 4).cast("long"))
             .alias("e"),
            F.concat(acc["eps"],
                     F.array(F.when(acc["e"] < 0,
                                    F.lit(None).cast("long"))
                             .otherwise(acc["e"]))).alias("eps")))
    got = {r["peer"]: list(zip(r["cs"], r["eps"]))
           for r in g.select("peer", cs.alias("cs"),
                             folded["eps"].alias("eps")).collect()}
    for k, cnts_k in enumerate(series):
        want = [(x, e) for x, e, _ in model(cnts_k)]
        assert got[f"k{k}"] == want, (k, cnts_k)


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark
