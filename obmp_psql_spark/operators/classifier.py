"""Distributed logistic-regression training for model-based quality
filtering.

The training-data use: CCNet / fastText-style quality classifiers —
train a tiny linear model on cheap per-document features, score the
whole corpus, keep the top band. At 100 TB the SCORING pass is the
expensive part and must stay JVM-side; this module keeps it to pure
column arithmetic from a published weight vector. TRAINING is
batch gradient descent where each iteration is ONE distributed
aggregation (map-side partial sums of the d gradient components, a
1-row collect) — the weight vector lives driver-side between rounds,
the data never moves. d is tiny (feature count), iterations are few,
so training cost is `iters` scans with full map-side combine; at
scale you train on a hash-sampled slice (pass a sampled df) and
score everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logreg_train(df: DataFrame, feature_cols: list[str],
                 label_col: str, iters: int = 12,
                 lr: float = 4.0) -> list[float]:
    """Train logistic regression by full-batch gradient descent;
    returns the learned weights (one per feature column — include a
    literal 1.0 column for the bias).

    Each round computes grad_j = mean((sigmoid(w.x) - y) * x_j) for
    all j in a single groupBy().agg (d avg expressions, one job,
    map-side partials) and updates w driver-side. Weights start at
    zero, so the first-round scores are 0.5 for every row and the
    path is deterministic given the data (up to distributed float-sum
    jitter — consumers publish the fitted weights as an artifact and
    gate everything computed FROM the dump, the same contract as
    ``pca_fit`` / ``kmeans_assign``)."""
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    w = [0.0] * len(feature_cols)
    y = F.col(label_col).cast("double")
    for _ in range(iters):
        z = sum((F.lit(wj) * F.col(c) for wj, c in
                 zip(w[1:], feature_cols[1:])),
                start=F.lit(w[0]) * F.col(feature_cols[0]))
        resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - y
        row = df.agg(*[F.avg(resid * F.col(c)).alias(f"g{j}")
                       for j, c in enumerate(feature_cols)]).collect()[0]
        w = [wj - lr * row[f"g{j}"] for j, wj in enumerate(w)]
    return w
