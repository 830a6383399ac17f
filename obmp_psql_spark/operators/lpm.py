"""Longest-prefix-match and containment (range) joins.

Reference semantics:
- J5 ``find_geo_ip(ip)``: most-specific geo_ip prefix containing an
  address — ``WHERE ip && $1 ORDER BY ip DESC LIMIT 1``
  (1_base.sql:66-81), applied per-row by triggers (9_triggers.sql:16).
- J7 RPKI validation: ROA ``prefix >>= rib.prefix AND rib.prefix_len
  BETWEEN roa.prefix_len AND roa.prefix_len_max``
  (2_aggregations.sql:260-265).

Postgres executes these with a GIST index nested loop. The Spark-first
plan avoids a broadcast-nested-loop theta join by bucketing the
address space: every prefix is exploded onto the fixed-width blocks
it covers (a /16 covers one /16 block; a /8 covers 256), probes map to
exactly one block, and the join becomes an equi-join on the block key
with the range test as a residual predicate — hash join, AQE-skew
aware, scales linearly. For small prefix tables (geo/ROA fit in MBs)
``broadcast=True`` skips the shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def explode_buckets(prefixes: DataFrame, start: str, end: str,
                    bucket_bits: int = 16, addr_bits: int = 32) -> DataFrame:
    """Add a ``__bucket`` column, one row per fixed-width block the
    [start, end] range covers. Prefixes narrower than the block width
    yield exactly one row; a /0 default route yields 2^bucket_bits —
    keep defaults in a separate broadcast pass if that matters."""
    shift = addr_bits - bucket_bits
    lo = F.shiftrightunsigned(F.col(start), shift)
    hi = F.shiftrightunsigned(F.col(end), shift)
    return prefixes.withColumn("__bucket", F.explode(F.sequence(lo, hi)))


def containment_join(
    probes: DataFrame,
    probe_addr: str,
    prefixes: DataFrame,
    start: str = "prefix_start",
    end: str = "prefix_end",
    bucket_bits: int = 16,
    addr_bits: int = 32,
    broadcast: bool = False,
    extra_pred: Column | None = None,
) -> DataFrame:
    """All (probe, prefix) pairs with start <= addr <= end, executed
    as a bucketed hash equi-join (see module doc). Returns probe
    columns + prefix columns."""
    shift = addr_bits - bucket_bits
    p = probes.withColumn("__bucket", F.shiftrightunsigned(F.col(probe_addr), shift))
    x = explode_buckets(prefixes, start, end, bucket_bits, addr_bits)
    if broadcast:
        x = F.broadcast(x)
    cond = (
        (p["__bucket"] == x["__bucket"])
        & (F.col(probe_addr) >= F.col(start))
        & (F.col(probe_addr) <= F.col(end))
    )
    if extra_pred is not None:
        cond = cond & extra_pred
    return p.join(x, cond).drop("__bucket")


def lpm_join(
    probes: DataFrame,
    probe_key: list[str],
    probe_addr: str,
    prefixes: DataFrame,
    masklen_col: str = "masklen",
    start: str = "prefix_start",
    end: str = "prefix_end",
    tiebreak: list[Column] | None = None,
    bucket_bits: int = 16,
    addr_bits: int = 32,
    broadcast: bool = True,
) -> DataFrame:
    """Longest-prefix match: per probe, the most-specific containing
    prefix (max masklen). find_geo_ip's ORDER BY ip DESC LIMIT 1
    (1_base.sql:73-77) as a windowed top-1 over the containment join."""
    matched = containment_join(
        probes, probe_addr, prefixes, start, end,
        bucket_bits, addr_bits, broadcast)
    order = [F.col(masklen_col).desc()] + list(tiebreak or [F.col(start).asc()])
    w = W.partitionBy(*probe_key).orderBy(*order)
    return (
        matched.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
