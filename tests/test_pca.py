"""Distributed PCA: Gram-partial reduction correctness vs numpy,
component ordering, sign normalization."""

from __future__ import annotations

import numpy as np
import pytest

from obmp_psql_spark.operators.pca import pca_fit


def _fit_and_reference(spark, data):
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        "id long, vec array<double>")
    mean, comps, eig = pca_fit(df.repartition(4), "vec",
                               dims=data.shape[1], n_components=2)
    x = np.asarray(data, dtype=np.float64)
    ref_mean = x.mean(axis=0)
    ref_cov = (x - ref_mean).T @ (x - ref_mean) / x.shape[0]
    return np.array(mean), [np.array(c) for c in comps], eig, \
        ref_mean, ref_cov


def test_matches_numpy_eig(spark):
    rng = np.random.RandomState(7)
    # dominant variance along a fixed direction + small isotropic noise
    d = 8
    axis = np.zeros(d)
    axis[3] = 1.0
    data = rng.randn(200, 1) * 5.0 @ axis[None, :] + rng.randn(200, d) * 0.1
    mean, comps, eig, ref_mean, ref_cov = _fit_and_reference(spark, data)
    assert np.allclose(mean, ref_mean, atol=1e-9)
    ev, evec = np.linalg.eigh(ref_cov)
    top = evec[:, np.argmax(ev)]
    # same axis up to sign; fitted is sign-normalized
    assert abs(abs(np.dot(comps[0], top)) - 1.0) < 1e-6
    assert comps[0][int(np.argmax(np.abs(comps[0])))] > 0
    assert eig[0] >= eig[1] > 0


def test_partition_invariance(spark):
    """The Gram reduction must give the same covariance no matter how
    rows are split across partitions (up to float-sum jitter)."""
    rng = np.random.RandomState(11)
    data = rng.randn(120, 6)
    df1 = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(data)],
        "id long, vec array<double>")
    m1, c1, _ = pca_fit(df1.repartition(1), "vec", dims=6)
    m2, c2, _ = pca_fit(df1.repartition(13), "vec", dims=6)
    assert np.allclose(m1, m2, atol=1e-9)
    assert np.allclose(c1[0], c2[0], atol=1e-6)


def test_too_few_rows(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0])], "id long, vec array<double>")
    with pytest.raises(ValueError, match=">= 2 rows"):
        pca_fit(df, "vec", dims=2)


def test_incremental_gram_split_invariance_and_replay(spark):
    """Any batch split accumulates the identical sufficient
    statistics (sums commute); a replayed batch_id must no-op so
    at-least-once delivery never double-counts the covariance."""
    import tempfile

    from obmp_psql_spark.operators.pca import (incremental_gram_update,
                                               pca_fit, pca_fit_from_store)
    from obmp_psql_spark.state import TxnStateStore

    rng = np.random.RandomState(3)
    data = rng.randn(90, 6)
    df = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(data)],
        "id long, vec array<double>")

    store = TxnStateStore(spark, tempfile.mkdtemp(prefix="pcagram_t_"))
    import pyspark.sql.functions as F
    for b in range(3):
        incremental_gram_update(store, df.filter(F.col("id") % 3 == b),
                                "vec", 6, batch_id=b)
    incremental_gram_update(store, df.filter(F.col("id") % 3 == 0),
                            "vec", 6, batch_id=0)  # replay
    m_inc, c_inc, e_inc = pca_fit_from_store(store, 6)
    m_bat, c_bat, e_bat = pca_fit(df, "vec", dims=6)
    assert np.allclose(m_inc, m_bat, atol=1e-9)
    assert np.allclose(c_inc[0], c_bat[0], atol=1e-6)
    assert np.allclose(e_inc, e_bat, atol=1e-9)
