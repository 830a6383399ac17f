"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
same config block is what we would ship to a 1000-executor cluster,
minus the master/memory lines which come from the cluster manager.

Scale notes (100 TB design):
- AQE on: runtime coalescing, skew-join splitting, dynamic join
  strategy switch replace hand-tuned shuffle partition counts.
- ``spark.sql.shuffle.partitions`` is only the AQE *initial* value;
  on a real cluster set it to 2-3x total cores and let AQE coalesce.
- Session timezone pinned UTC: the reference stores all timestamps
  as UTC-naive (obmp-psql ``timestamp without time zone``, e.g.
  /root/reference/database/1_base.sql:319) and the DuckDB oracle is
  UTC-naive too.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_APP = "obmp-psql-spark"


def get_spark(app_name: str = _APP, extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelism-first coalescing floor: the default 1MB floor
        # collapses sub-32MB shuffles to a handful of partitions, which
        # serializes window/join stages on small-to-mid batches (measured:
        # the two-batch ingest merge ran its window+merge on ONE core for
        # ~5s at sf0.1). 64KB keeps those stages at full parallelism; at
        # 100 TB the 64MB advisory target governs, so large shuffles are
        # unaffected.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # driver testdata stores events.ts as TIMESTAMP(NANOS); Spark
        # has no ns timestamps — read as long and convert in load_tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# (session id, sf_dir) -> {table name: DataFrame}. A *plan* memo, not a
# data cache: the returned DataFrames are immutable lazy plans and every
# action over them still scans the parquet inputs. Building the plan
# costs ~0.1-1 s of py4j/py-side work (read.parquet footer + schema
# probe + ts normalization + temp view), and nearly every registered
# query pays it at least once per bench pass — ~45 s across a 153-query
# pass before this memo. Keyed by id(spark) like _cached_pipeline; a
# dead session is detected by the conf probe below and its entry
# rebuilt under the new session's id.
_TABLE_CACHE: dict = {}


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Load the driver-generated parquet tables and register temp views.

    Returns a dict name -> DataFrame.
    """
    all_names = (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )
    key = (id(spark), sf_dir)
    try:
        # The caller may hand us a session we didn't build (the driver
        # does); events.ts is TIMESTAMP(NANOS) which Spark only reads
        # with this runtime conf. Doubles as a liveness probe for the
        # memo: a dead session throws here and drops its entry.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        _TABLE_CACHE.pop(key, None)
        raise
    cached = _TABLE_CACHE.setdefault(key, {})
    out = {}
    for name in names or all_names:
        df = cached.get(name)
        if df is None:
            path = f"{sf_dir}/{name}.parquet"
            df = normalize_ts(spark.read.parquet(path))
            df.createOrReplaceTempView(name)
            cached[name] = df
        out[name] = df
    return out


def empty_df(spark: SparkSession, schema):
    """Zero-partition empty DataFrame (state seeds, store-read
    fallbacks). ``spark.createDataFrame([], schema)`` parallelizes
    the empty list through Python into ``defaultParallelism`` EMPTY
    Python partitions, and every downstream action then pays one
    Python-worker round-trip per partition (measured 0.5 s per
    action at local[32], +1.6 s on a 100k-row join against the
    seed); an empty JVM-side RDD plans zero tasks (0.07 s)."""
    return spark.createDataFrame(spark.sparkContext.emptyRDD(), schema)


def tiny_df(spark: SparkSession, rows, schema):
    """Single-partition DataFrame for driver-scale literal row sets
    (seeds, published estimate lists, collected codebook re-pins).
    ``spark.createDataFrame(rows, schema)`` parallelizes even a
    1-row list into ``defaultParallelism`` Python partitions, and
    every downstream action then pays one Python-worker round-trip
    per partition (measured 0.32 s/action at local[32] for one row,
    1.29 s cold, vs 0.20 s at one partition). One partition also
    broadcasts/joins identically — these frames are dims by nature."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)


def fan_out(df, spark: SparkSession):
    """Restore source parallelism for compute-heavy map stages.

    The driver fixtures are single-row-group parquet files, so Spark
    plans a ONE-task scan regardless of maxPartitionBytes (a row
    group is the split atom) and every map-side operator above it —
    the v6 Arrow parse, shingle/md5 signatures, embedding math — runs
    on one core. A production table at this engine's target scale has
    thousands of row groups (and a Kafka source has N partitions), so
    the scan itself parallelizes; this helper restores that with one
    round-robin exchange of the raw rows.

    Deliberately NOT applied inside ``load_tables``: pipelines whose
    per-row map work is cheap (plain filters/aggregations) lose more
    to the extra exchange than they gain (measured ~+0.5s per query
    at sf0.1 across ~25 cheap queries), while the parse- and
    hash-heavy pipelines gain 1.5-3x. Call it at the load site of the
    heavy pipelines only.
    """
    return df.repartition(spark.sparkContext.defaultParallelism)


def normalize_ts(df):
    """Coerce any ``ts`` column to session-tz TimestampType.

    The driver has shipped events.ts as TIMESTAMP(NANOS) (surfaced as
    LongType epoch-nanos under nanosAsLong), TIMESTAMP_NTZ(µs), and
    plain TIMESTAMP across rounds; queries assume TimestampType.
    Session tz is pinned UTC, so the NTZ cast is value-preserving and
    matches DuckDB's naive-timestamp reading of the same file.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    for f in df.schema.fields:
        if f.name != "ts":
            continue
        if isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
