"""Z-order (Morton curve) data layout for multi-dimensional skipping.

Parquet/lakehouse scans prune ROW GROUPS by min/max statistics; a
table sorted on one column skips well on that column and not at all
on any other. Interleaving the bits of two (or more) quantized sort
keys into a single Morton code and range-sorting on IT gives every
participating dimension locality: a box predicate (x BETWEEN ...
AND y BETWEEN ...) touches only the row groups whose z-range
intersects the query box — the layout trick behind Delta/Iceberg
``OPTIMIZE ZORDER BY`` (public feature of both formats), expressed
here as plain Spark expressions + repartitionByRange.

Everything is integer arithmetic on quantized coordinates, so the
code is engine-reproducible (the z-value oracle in q_zorder_cluster
recomputes it in SQL) and JVM-codegen-friendly (a 2*bits-term
bit-twiddling expression tree, no UDF).

At 100 TB: z-clustering is a one-off (or compaction-time) range
shuffle; every subsequent box scan reads the intersecting groups
only — the bench probe measures the actual row-group count via
parquet footer statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Morton code: bit i of x lands at position 2i, bit
    i of y at 2i+1. Pure integer expressions — whole-stage codegen,
    bit-identical on any engine."""
    terms = []
    for i in range(bits):
        # x & (1<<i) sits at position i; shifting by i lands it at 2i
        # (and i+1 lands y's bit at 2i+1) without isolating the bit
        terms.append(F.shiftleft(x.bitwiseAND(F.lit(1 << i)), i))
        terms.append(F.shiftleft(y.bitwiseAND(F.lit(1 << i)), i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def quantize(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into the [0, 2^bits) integer grid —
    the coordinate normalization step before interleaving. Clamps
    out-of-range values; floor division keeps it integer-exact for
    the oracle."""
    cells = (1 << bits) - 1
    scaled = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(cells + 1))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(cells)).cast("long")


def cluster_by_zorder(df: DataFrame, zcol: Column,
                      num_partitions: int = 32) -> DataFrame:
    """Range-partition + in-partition sort on the Morton code: rows
    near each other in (x, y) land in the same parquet row groups,
    so min/max footer stats prune BOTH dimensions. One shuffle, done
    once at write/compaction time."""
    return (df.withColumn("__z", zcol)
            .repartitionByRange(num_partitions, "__z")
            .sortWithinPartitions("__z")
            .drop("__z"))
