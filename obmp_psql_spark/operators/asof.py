"""As-of (point-in-time) join.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do). The BMP domain
needs it for time-travel enrichment: "which peer STATE was in effect
when this RIB event arrived" — the reference approximates it with
trigger-time lookups (9_triggers.sql:43-85 reads the dimension row
current at trigger execution); a batch replay needs the explicit
point-in-time semantics. Training-data pipelines need the same shape
(join each sample to the latest upstream snapshot at sample time).

Implementation is the union-window plan, NOT a range join:

1. tag left rows (probe) and right rows (quote) and union them on a
   common schema, right payload packed into one struct column;
2. one shuffle: partition by the equi-keys, order by (ts, side)
   with quotes sorting BEFORE probes at equal ts (inclusive match);
3. ``last_value(payload, ignoreNulls)`` over rows UNBOUNDED
   PRECEDING..CURRENT ROW gives every probe the most recent quote;
4. keep probe rows, unpack the struct.

Scale: exactly ONE hash-partition shuffle + per-partition sort —
O((|L|+|R|) log) like a sort-merge join, with none of the
quadratic blowup a `l.ts >= r.ts` range join risks (a theta join
over a hot key would replicate every quote against every probe
before filtering). Skewed keys fall out of AQE skew handling on the
single exchange. This is the same plan Flink's temporal join and
Delta's MERGE-by-time tricks lower to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              how: str = "left", tolerance=None) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key group
    (backward as-of, inclusive — DuckDB ``ASOF JOIN`` semantics).

    ``how``: "left" keeps unmatched probes with NULL right columns;
    "inner" drops them. ``tolerance`` (a Column/interval-compatible
    value in the same unit as the timestamps, e.g.
    ``F.expr("INTERVAL 1 HOUR")``) bounds the staleness of the match.

    Right columns other than keys/timestamp come back with their own
    names; the matched quote timestamp is exposed as ``__asof_ts``.
    Right rows must be unique per (keys, right_ts) — pre-dedup with
    ``dedup_latest`` otherwise (the match would be ambiguous).
    """
    payload_cols = [c for c in right.columns
                    if c not in on and c != right_ts]
    quote = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(F.col(right_ts).alias("__asof_ts"),
                 *payload_cols).alias("__q"),
    )
    probe = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(quote.schema["__q"].dataType).alias("__q"),
        F.struct(*left.columns).alias("__l"),
    )
    quote = quote.withColumn(
        "__l", F.lit(None).cast(probe.schema["__l"].dataType))
    u = probe.unionByName(quote)
    # quotes (__side 0) sort before probes (__side 1) at equal __t,
    # making the match inclusive
    w = (W.partitionBy(*on).orderBy("__t", "__side")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    matched = (u.withColumn("__m", F.last("__q", ignorenulls=True).over(w))
               .filter(F.col("__side") == 1))
    if tolerance is not None:
        matched = matched.withColumn(
            "__m",
            F.when(F.col("__m.__asof_ts") >= F.col("__t") - tolerance,
                   F.col("__m")))
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join: how={how!r} not supported")
    return matched.select(
        "__l.*",
        F.col("__m.__asof_ts").alias("__asof_ts"),
        *(F.col(f"__m.{c}").alias(c) for c in payload_cols),
    )
