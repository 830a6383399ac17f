"""Snapshot diff: classify per-key changes between two versions of a
keyed table (the lakehouse "CDC between VERSION AS OF snapshots" —
Delta's table_changes / Iceberg's changelog scan, over our
TxnStateStore.read_at). The reference exposes history only as trigger
-written log tables (database/9_triggers.sql); a commit-log store can
derive the same answer between ANY two retained versions after the
fact, without having declared the log up front.

Output = one row per added/changed/removed key with old/new values of
the compared columns; unchanged keys are dropped, so at 100 TB the
result is O(churn), not O(state). The join keys on the state's merge
key — with the store's hash-bucketed layout both sides are
co-partitioned, so no extra shuffle beyond the bucket-aligned read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """Full-outer join old/new on ``keys``; classify each key as
    added (no old row), removed (no new row), or changed (any compare
    column IS DISTINCT FROM its old value); emit old_*/new_* value
    pairs. Unchanged keys are filtered out."""
    # literal presence markers, NOT key nullability: the join is
    # null-safe on purpose, so a legitimately-NULL key value must not
    # read as "row absent on this side"
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        F.lit(True).alias("__old_present"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols])
    n = new.select(
        *keys, F.lit(True).alias("__new_present"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols])
    cond = None
    for k in keys:
        eq = F.col(k).eqNullSafe(F.col(f"__ok_{k}"))
        cond = eq if cond is None else cond & eq
    j = n.join(o, cond, "full_outer")

    new_present = F.col("__new_present").isNotNull()
    old_present = F.col("__old_present").isNotNull()
    differs = None
    for c in compare_cols:
        d = ~F.col(f"new_{c}").eqNullSafe(F.col(f"old_{c}"))
        differs = d if differs is None else differs | d
    change = (F.when(~old_present, "added")
              .when(~new_present, "removed")
              .when(differs, "changed").otherwise("unchanged"))
    out_keys = [F.coalesce(F.col(k), F.col(f"__ok_{k}")).alias(k)
                for k in keys]
    return (j.select(*out_keys, change.alias("change"),
                     *[F.col(f"old_{c}") for c in compare_cols],
                     *[F.col(f"new_{c}") for c in compare_cols])
            .filter(F.col("change") != "unchanged"))
