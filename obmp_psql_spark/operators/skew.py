"""Skew mitigation helpers (SURVEY §4: salting for hot keys; AQE
skew-join handles the join side automatically, these cover
aggregations whose single hot key would bottleneck one reducer).

``salted_agg`` runs the classic two-phase aggregation: partial
aggregate on (keys, salt) — spreading a hot key over ``n_salt``
reducers — then final aggregate on the keys. Only algebraic
aggregates (sum/count/min/max) compose across phases; avg is derived
from sum/count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PHASE2 = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PHASE1 = {"sum": F.sum, "count": lambda c: F.count(c), "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    sum|count|min|max. The salt derives from a deterministic hash of
    the whole row (no rand(): keeps retries/resume reproducible).
    """
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salt)).alias("__salt")
    phase1 = df.groupBy(*keys, salt).agg(*[
        _PHASE1[fn](col).alias(out) for out, (col, fn) in aggs.items()
    ])
    return phase1.groupBy(*keys).agg(*[
        _PHASE2[fn](out).alias(out) for out, (_, fn) in aggs.items()
    ])
