"""Scalable contiguous global rank (the two-pass range-sort pattern).

A plain ``row_number() OVER (ORDER BY ...)`` with no partition key
moves the whole input through ONE task — correct at gate scale,
fatal at 100 TB. The distributed classic (TeraSort numbering) is:

1. range-repartition on the order key (balanced buckets, sampled
   boundaries),
2. count each bucket (a tiny bounded collect: one row per bucket),
3. rank = in-bucket row_number + the exclusive prefix sum of the
   bucket sizes.

The result is identical to the single-partition window whenever the
order key is a total order (callers must include a unique tiebreak
column), because every key in bucket i sorts before every key in
bucket i+1 regardless of where the sampled boundaries fell.

Reference analog: none (the reference ranks inside PostgreSQL, which
has the same single-stream limitation); this is the Spark-native
primitive that unlocks sorted-neighborhood joins and percentile
positioning at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .cache import owned_persist


def global_rank(df: DataFrame, order_cols: list[str],
                rank_col: str = "rn",
                num_partitions: int | None = None) -> DataFrame:
    """Add a contiguous 1-based global rank over ``order_cols``.

    ``order_cols`` must define a total order (include a unique id as
    the last column) — with duplicate sort keys the rank of the
    duplicates would depend on bucket boundaries.

    Cost: one range shuffle + one count per bucket (the collect is
    bounded by the partition count, never the data) + one in-bucket
    sort. No stage ever sees more than one bucket.
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    part = owned_persist(df.repartitionByRange(n, *order_cols))
    sizes = {r["__pid"]: r["cnt"] for r in
             part.groupBy(F.spark_partition_id().alias("__pid"))
                 .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in range(n):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)
    off_expr = F.create_map(
        *[lit for pid, off in offsets.items()
          for lit in (F.lit(pid), F.lit(off))])
    w = W.partitionBy("__pid").orderBy(*order_cols)
    return (part.withColumn("__pid", F.spark_partition_id())
            .withColumn(rank_col,
                        (F.row_number().over(w)
                         + off_expr[F.col("__pid")]).cast("long"))
            .drop("__pid"))
