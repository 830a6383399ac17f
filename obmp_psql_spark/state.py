"""Parquet-backed state store emulating lakehouse MERGE targets.

The reference maintains mutable Postgres tables (UPSERTs at 3k
rows/300ms, WriterRunnable.java:77-176). The Spark-native equivalent
is Delta/Iceberg ``MERGE INTO``; this container has no lakehouse
jars, so state lives in parquet directories with atomic
versioned-directory swap. The operator layer is pure (DataFrame in ->
DataFrame out), so swapping this store for Delta changes one class.

Scale notes: at 100 TB the state tables are partitioned (ip_rib by
peer_hash_id bucket; logs by hour) and MERGE touches only matched
files (Delta data skipping on hash_id). The overwrite-swap here is
the local-mode stand-in; the operator outputs and the pipeline
orchestration are unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .schemas import TABLE_SCHEMAS


class ParquetStateStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _current(self, table: str) -> str | None:
        d = self._dir(table)
        link = os.path.join(d, "_CURRENT")
        if os.path.exists(link):
            with open(link) as f:
                return os.path.join(d, f.read().strip())
        return None

    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame:
        """Current state, or an empty typed DataFrame if never written
        (including a version dir that holds no parquet files — an
        empty partitioned append writes nothing)."""
        cur = self._current(table)
        if cur and os.path.exists(cur):
            try:
                return self.spark.read.parquet(cur)
            except Exception:
                pass  # no files in the version dir -> fall through
        schema = schema or TABLE_SCHEMAS[table]
        return self.spark.createDataFrame([], schema)

    def overwrite(self, table: str, df: DataFrame) -> None:
        """Write a new version directory, then atomically repoint
        _CURRENT (the stand-in for a Delta commit).

        GC keeps the two most recent versions: Spark plans are lazy,
        so a DataFrame derived from the previous version (e.g. a log
        append computed from the pre-merge state) may execute AFTER
        this overwrite — deleting its input files mid-plan is the
        classic lazy-read hazard (Delta solves this with snapshot
        retention + VACUUM; same policy here, window of 2)."""
        d = self._dir(table)
        os.makedirs(d, exist_ok=True)
        existing = sorted(n for n in os.listdir(d) if n.startswith("v_"))
        seq = int(existing[-1][2:8]) + 1 if existing else 0
        version = f"v_{seq:06d}_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(os.path.join(d, version))
        tmp = os.path.join(d, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, os.path.join(d, "_CURRENT"))
        for name in sorted(n for n in os.listdir(d) if n.startswith("v_"))[:-2]:
            shutil.rmtree(os.path.join(d, name), ignore_errors=True)

    def append(self, table: str, df: DataFrame,
               partition_by: str | None = None) -> None:
        """Append-only tables (logs): parquet append, optionally
        hive-partitioned (the hypertable-chunk equivalent,
        1_base.sql:367 — hour partitions give time-predicate pruning
        and cheap retention drops at 100 TB)."""
        cur = self._current(table)
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        if cur is None:
            d = self._dir(table)
            os.makedirs(d, exist_ok=True)
            version = "v_000000_init"
            writer.parquet(os.path.join(d, version))
            tmp = os.path.join(d, "_CURRENT.tmp")
            with open(tmp, "w") as f:
                f.write(version)
            os.replace(tmp, os.path.join(d, "_CURRENT"))
            return
        writer.parquet(cur)
