"""Distributed PCA over an embedding column.

The training-data use: whiten / reduce embeddings before ANN indexing
or semantic clustering (OPQ-style rotation in PQ pipelines, component
pruning before IVF). The Spark-first shape is a map-side Gram
reduction — the only thing that crosses the shuffle is one d x d
partial second-moment matrix per partition (plus the d-vector sum and
a count), so network cost is O(partitions * d^2), INDEPENDENT of row
count: the same plan at 100 TB ships exactly the same few MB. The
eigendecomposition runs driver-side on the d x d covariance (d is
64-1024 for real embedding tables — microseconds in LAPACK), the
same split MLlib's PCA uses (RowMatrix.computePrincipalComponents).

The Gram partials are the one place Python touches the data, and it
is an Arrow-batched ``mapInPandas`` doing a single BLAS ``X.T @ X``
per batch — vectorized, never per-row.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_partials(df: DataFrame, vec_col: str, dims: int) -> DataFrame:
    """Per-partition second-moment partials, flattened to (pos, val)
    rows: pos 0 = row count, pos 1..d = per-dimension sums, pos
    d+1 .. d+d^2 = row-major X^T X entries. One groupBy(pos).sum
    combines the partitions (d^2+d+1 rows per partition in flight —
    4161 at d=64)."""
    import numpy as np  # noqa: F401  (worker-side import below)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        n = 0
        s = np.zeros(dims)
        g = np.zeros((dims, dims))
        for b in batches:
            if not len(b):
                continue
            x = np.asarray(
                np.stack(b[vec_col].to_numpy()), dtype=np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n == 0:
            return
        pos = np.arange(1 + dims + dims * dims, dtype=np.int64)
        val = np.concatenate(([float(n)], s, g.reshape(-1)))
        yield pd.DataFrame({"pos": pos, "val": val})

    return (df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
            .mapInPandas(part, schema="pos long, val double")
            .groupBy("pos").agg(F.sum("val").alias("val")))


def pca_fit(df: DataFrame, vec_col: str, dims: int,
            n_components: int = 2):
    """Fit PCA: returns (mean, components, eigvals) as plain Python
    lists — ``components`` is ``n_components`` rows of length
    ``dims``, eigenvalue-descending, each sign-normalized so its
    largest-|entry| coordinate is positive (eigenvectors are
    sign-ambiguous; without the convention two runs could publish
    negated, equally-valid axes).

    Downstream consumers treat the fitted model as a PUBLISHED
    artifact (parquet handoff): run-to-run float-sum variation in
    the distributed partials never has to be reproducible, only the
    projection computed FROM the published matrix does — the same
    contract as ``kmeans_assign``."""
    import numpy as np

    rows = gram_partials(df, vec_col, dims).collect()  # d^2+d+1 rows
    flat = np.zeros(1 + dims + dims * dims)
    for r in rows:
        flat[r["pos"]] = r["val"]
    n = flat[0]
    if n < 2:
        raise ValueError(f"PCA needs >= 2 rows, got {int(n)}")
    mean = flat[1:1 + dims] / n
    second = flat[1 + dims:].reshape(dims, dims) / n
    cov = second - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:n_components]
    comps = []
    for i in order:
        v = eigvecs[:, i]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return ([float(x) for x in mean], comps,
            [float(eigvals[i]) for i in order])
