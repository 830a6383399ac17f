"""Distributed logistic regression: learns a separable rule, scoring
parity shape, degenerate inputs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from obmp_psql_spark.operators.classifier import logreg_train
from obmp_psql_spark.registry import all_specs

from .conftest import SF_SMALL


def test_learns_separable_rule(spark):
    """On linearly separable data gradient descent must achieve high
    training accuracy within a few rounds."""
    rows = [(i, 1.0, (i % 100) / 100.0, 1 if (i % 100) >= 50 else 0)
            for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x0 double, x1 double, "
                                     "label int").repartition(8)
    w = logreg_train(df, ["x0", "x1"], "label", iters=25, lr=8.0)
    z = F.lit(w[0]) * F.col("x0") + F.lit(w[1]) * F.col("x1")
    acc = (df.select(((z >= 0).cast("int") == F.col("label"))
                     .cast("int").alias("ok"))
           .agg(F.avg("ok")).collect()[0][0])
    assert acc >= 0.95, f"training accuracy {acc}"
    assert w[1] > 0  # rule is monotone-increasing in x1


def test_empty_features_raise(spark):
    df = spark.createDataFrame([(1, 0)], "id long, label int")
    with pytest.raises(ValueError, match="non-empty"):
        logreg_train(df, [], "label")


def test_quality_classifier_beats_majority(spark):
    """The end-to-end query's predictions must actually track the
    label rule (not collapse to one class)."""
    fn = all_specs()["q_quality_classifier"].fn
    out = fn(spark, SF_SMALL).select("pred", "label").collect()
    acc = sum(1 for r in out if r.pred == r.label) / len(out)
    majority = max(sum(r.label for r in out),
                   sum(1 - r.label for r in out)) / len(out)
    assert acc >= 0.9 and acc > majority, (acc, majority)


def test_dsir_prefers_target_domain(spark):
    """DSIR importance selection must pick target-domain (src0) docs
    at a substantially higher rate than the corpus average."""
    from pyspark.sql import functions as F
    out = all_specs()["q_dsir_select"].fn(spark, SF_SMALL)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet") \
        .select("doc_id", "source")
    rates = {r["src0"]: (r["rate"], r["n"]) for r in
             out.join(docs, "doc_id")
                .groupBy((F.col("source") == "src0").alias("src0"))
                .agg(F.avg("selected").alias("rate"),
                     F.count(F.lit(1)).alias("n")).collect()}
    assert rates[True][0] > rates[False][0] + 0.2, rates
