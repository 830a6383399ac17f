"""Misra-Gries heavy-hitters sketch: mergeable frequency summaries.

The missing member of the sketch family next to HLL (distinct count,
``hll_sketch_agg``) and GK (quantiles): a bounded-memory frequency
summary whose merge is associative, so 1000 executors can each
summarize their shard and a tree of merges yields a global summary
with the SAME error guarantee (Agarwal et al., "Mergeable
Summaries", PODS 2012, Thm 1):

    for every item:  0 <= exact - est <= (N - M) / (k + 1)

where N is the stream length and M the summary's retained mass.
Consequently every item with exact > (N - M)/(k+1) is guaranteed
present — the heavy-hitters contract.

Implementation is the classic k-counter algorithm, batch-reduced:
counting within a partition is exact until the map exceeds k keys,
then the (k+1)-th largest count m is subtracted from every counter
(equivalent to m rounds of Misra-Gries decrement-all) and non-
positive counters drop. Partials merge by plain per-key sum followed
by one final subtract-reduce. Every step is order-free (dict sums
and a sorted-values threshold), so the summary is deterministic for
a given partition layout — which the recall-handshake oracle relies
on.

100 TB shape: one Arrow-batched pass per partition (state = k
counters, independent of partition size), a k*P-row shuffle, and a
k-row result. The full exact groupBy this replaces shuffles the
entire key universe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _reduce_counters(counters: dict, k: int) -> dict:
    """Batch Misra-Gries reduction: if more than k keys survive,
    subtract the (k+1)-th largest count from all (== that many
    decrement-all rounds) and drop the non-positive ones."""
    if len(counters) <= k:
        return counters
    m = sorted(counters.values(), reverse=True)[k]
    return {t: c - m for t, c in counters.items() if c > m}


def misra_gries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Build a merged Misra-Gries summary of ``df[col]``.

    Returns a DataFrame ``(item string, est long)`` with at most ~k
    rows (ties at the reduction threshold may keep a few extra —
    the error bound is unaffected).
    """
    def summarize(batches):
        import pandas as pd
        counters: dict = {}
        for pdf in batches:
            for item, c in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            counters = _reduce_counters(counters, k)
        yield pd.DataFrame(
            {"item": list(counters.keys()),
             "est": list(counters.values())})

    partials = df.select(F.col(col).cast("string").alias(col)) \
        .mapInPandas(summarize, schema="item string, est long")
    merged = partials.groupBy("item").agg(F.sum("est").alias("est"))
    # final reduction back to ~k keys: the (k+1)-th largest merged
    # count is a bounded collect (k+1 rows), never the data.
    top = merged.orderBy(F.desc("est"), "item").limit(k + 1).collect()
    m = top[-1]["est"] if len(top) == k + 1 else 0
    return (merged.select("item", (F.col("est") - F.lit(m)).alias("est"))
            .filter(F.col("est") > 0))
