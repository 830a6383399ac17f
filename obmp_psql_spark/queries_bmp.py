"""End-to-end BMP engine parity queries for the driver gate.

BMP messages are synthesized deterministically from the events table,
split into two batches, and pushed through the REAL ingest path
(``apply_unicast_prefix`` twice: insert batch then merge batch). The
DuckDB oracle independently re-derives the reference's ON CONFLICT
CASE matrix (UnicastPrefixQuery.java:35-40) and the AFTER UPDATE
trigger log (9_triggers.sql:89-126) in pure SQL — a differential test
of the merge + CDC semantics, not just of a query shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ingest import apply_unicast_prefix
from .registry import register
from .schemas import TABLE_SCHEMAS
from .session import load_tables

# deterministic message synthesis from events (ts made unique by
# adding event_id µs — dedup-latest tiebreaks must not matter)
_MSG_SQL = """
m AS (
  SELECT 'p' || CAST(user_id % 10 AS VARCHAR) AS peer,
         'h' || CAST(user_id AS VARCHAR) || '-' || CAST(event_id % 5 AS VARCHAR) AS h,
         CASE WHEN value < 5 THEN NULL
              ELSE 'a' || CAST(event_id % 20 AS VARCHAR) END AS attr,
         value < 5 AS wd,
         ts + to_microseconds(CAST(event_id AS BIGINT)) AS mts,
         event_id,
         CAST(65000 + user_id % 50 AS BIGINT) AS origin,
         '10.' || CAST(user_id % 200 AS VARCHAR) || '.0.0' AS prefix
  FROM ev
)
"""


def _messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.select(
        F.when(F.col("value") < 5, "del").otherwise("add").alias("action"),
        F.concat(F.lit("h"), F.col("user_id").cast("string"), F.lit("-"),
                 (F.col("event_id") % 5).cast("string")).alias("hash"),
        F.concat(F.lit("p"), (F.col("user_id") % 10).cast("string")).alias("peer_hash"),
        F.when(F.col("value") < 5, F.lit(""))
         .otherwise(F.concat(F.lit("a"), (F.col("event_id") % 20).cast("string")))
         .alias("base_attr_hash"),
        F.lit(True).alias("is_ipv4"),
        (65000 + F.col("user_id") % 50).cast("long").alias("origin_asn"),
        F.concat(F.lit("10."), (F.col("user_id") % 200).cast("string"),
                 F.lit(".0.0")).alias("prefix"),
        F.lit(16).cast("short").alias("prefix_len"),
        (F.col("value") < 5).alias("is_withdrawn"),
        F.lit(0).cast("long").alias("path_id"),
        F.lit("").alias("labels"),
        F.lit(False).alias("is_pre_policy"),
        F.lit(True).alias("is_adj_rib_in"),
        F.timestamp_micros(F.unix_micros("ts") + F.col("event_id")).alias("timestamp"),
        F.col("event_id"),
    )


def _run_pipeline(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    msgs = _messages(spark, sf_dir)
    b1 = msgs.filter(F.col("event_id") % 2 == 0).drop("event_id")
    b2 = msgs.filter(F.col("event_id") % 2 == 1).drop("event_id")
    empty = spark.createDataFrame([], TABLE_SCHEMAS["ip_rib"])
    state1, _ = apply_unicast_prefix(empty, b1)
    state2, log = apply_unicast_prefix(state1, b2)
    return state2, log


_EV = "ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"

_STATE_CTES = f"""{_EV},
{_MSG_SQL},
l1 AS (
  SELECT * FROM (
    SELECT m.*, row_number() OVER (PARTITION BY peer, h ORDER BY mts DESC) AS rn
    FROM m WHERE event_id % 2 = 0) WHERE rn = 1
),
l2 AS (
  SELECT * FROM (
    SELECT m.*, row_number() OVER (PARTITION BY peer, h ORDER BY mts DESC) AS rn
    FROM m WHERE event_id % 2 = 1) WHERE rn = 1
)"""

_STATE_SELECT = """
SELECT coalesce(l2.peer, l1.peer) AS peer_hash_id,
       coalesce(l2.h, l1.h) AS hash_id,
       CASE WHEN l2.h IS NULL THEN l1.attr
            WHEN l1.h IS NULL THEN l2.attr
            WHEN l2.wd THEN l1.attr ELSE l2.attr END AS base_attr_hash_id,
       CASE WHEN l2.h IS NULL THEN l1.origin
            WHEN l1.h IS NULL THEN l2.origin
            WHEN l2.wd THEN l1.origin ELSE l2.origin END AS origin_as,
       coalesce(l2.wd, l1.wd) AS is_withdrawn,
       coalesce(l2.mts, l1.mts) AS timestamp,
       CASE WHEN l1.h IS NOT NULL THEN l1.mts ELSE l2.mts END AS first_added_timestamp,
       coalesce(l2.prefix, l1.prefix) AS prefix
FROM l1 FULL OUTER JOIN l2 ON l1.peer = l2.peer AND l1.h = l2.h
"""

_MERGE_ORACLE = f"WITH {_STATE_CTES}\n{_STATE_SELECT}"


@register(
    "q_bmp_rib_merge",
    oracle=_MERGE_ORACLE,
    survey_ref="S2/P1/P7/W2/A9/T7 end-to-end (UnicastPrefixQuery.java:24-51)",
    doc="two-batch ip_rib merge through the real ingest path vs SQL-derived oracle",
)
def q_bmp_rib_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    state, _ = _run_pipeline(spark, sf_dir)
    return state.select("peer_hash_id", "hash_id", "base_attr_hash_id",
                        "origin_as", "is_withdrawn", "timestamp",
                        "first_added_timestamp", "prefix")


_LOG_ORACLE = f"""
WITH {_EV},
{_MSG_SQL},
l1 AS (
  SELECT * FROM (
    SELECT m.*, row_number() OVER (PARTITION BY peer, h ORDER BY mts DESC) AS rn
    FROM m WHERE event_id % 2 = 0) WHERE rn = 1
),
l2 AS (
  SELECT * FROM (
    SELECT m.*, row_number() OVER (PARTITION BY peer, h ORDER BY mts DESC) AS rn
    FROM m WHERE event_id % 2 = 1) WHERE rn = 1
)
SELECT l2.wd AS is_withdrawn,
       l2.prefix AS prefix,
       CASE WHEN l2.wd THEN l1.attr ELSE l2.attr END AS base_attr_hash_id,
       l2.peer AS peer_hash_id,
       CASE WHEN l2.wd THEN l1.origin ELSE l2.origin END AS origin_as,
       l2.mts AS timestamp
FROM l1 JOIN l2 ON l1.peer = l2.peer AND l1.h = l2.h
WHERE (l2.wd <> l1.wd) OR (NOT l2.wd AND l2.attr <> l1.attr)
"""


@register(
    "q_bmp_cdc_log",
    oracle=_LOG_ORACLE,
    survey_ref="G3 end-to-end (9_triggers.sql:89-126 t_ip_rib_update)",
    doc="trigger-CDC change log through the real ingest path vs SQL-derived oracle",
)
def q_bmp_cdc_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, log = _run_pipeline(spark, sf_dir)
    return log.select("is_withdrawn", "prefix", "base_attr_hash_id",
                      "peer_hash_id", "origin_as", "timestamp")


# ---------------------------------------------------------------------------
# A1 through the engine: rollup.chg_stats_bypeer over the pipeline's
# own CDC log, oracled by the reference SQL shape re-derived in DuckDB
# ---------------------------------------------------------------------------

_CHG_ORACLE = f"""
WITH log_rows AS ({_LOG_ORACLE})
SELECT make_timestamp(CAST(floor(epoch(timestamp)/60)*60 AS BIGINT)*1000000) AS interval_time,
       peer_hash_id,
       CAST(count(CASE WHEN is_withdrawn THEN 1 END) AS BIGINT) AS withdraws,
       CAST(count(CASE WHEN NOT is_withdrawn THEN 1 END) AS BIGINT) AS updates
FROM log_rows
WHERE timestamp >= TIMESTAMP '2020-01-01 00:00:00'
  AND timestamp < TIMESTAMP '2030-01-01 00:00:00'
GROUP BY 1, 2
"""


@register(
    "q_bmp_chg_stats",
    oracle=_CHG_ORACLE,
    survey_ref="A1 end-to-end (2_aggregations.sql:91-102 update_chg_stats)",
    doc="engine rollup over the pipeline's own CDC log vs reference SQL oracle",
)
def q_bmp_chg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as dt

    from .operators.rollup import chg_stats_bypeer

    _, log = _run_pipeline(spark, sf_dir)
    # fixed deterministic window covering all synthetic timestamps
    return chg_stats_bypeer(
        log, now=dt.datetime(2030, 1, 1),
        window=dt.timedelta(days=3653))


# ---------------------------------------------------------------------------
# A5 through the engine: update_global_ip_rib over the pipeline state
# ---------------------------------------------------------------------------

_GLOBAL_ORACLE = f"""
WITH {_STATE_CTES},
state AS ({_STATE_SELECT})
SELECT prefix,
       CAST(16 AS SMALLINT) AS prefix_len,
       origin_as AS recv_origin_as,
       bool_and(is_withdrawn) AS is_withdrawn,
       max(timestamp) AS timestamp,
       min(first_added_timestamp) AS first_added_timestamp,
       CAST(count(DISTINCT peer_hash_id) AS BIGINT) AS num_peers,
       CAST(count(DISTINCT CASE WHEN NOT is_withdrawn THEN peer_hash_id END) AS BIGINT)
         AS advertising_peers,
       CAST(count(DISTINCT CASE WHEN is_withdrawn THEN peer_hash_id END) AS BIGINT)
         AS withdrawn_peers
FROM state
WHERE origin_as <> 23456
GROUP BY prefix, origin_as
"""


@register(
    "q_bmp_global_rib",
    oracle=_GLOBAL_ORACLE,
    survey_ref="A5/A10/P2 end-to-end (2_aggregations.sql:181-275 update_global_ip_rib)",
    doc="global RIB consolidation over the real pipeline state vs SQL oracle",
)
def q_bmp_global_rib(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as dt

    from .operators.global_rib import update_global_ip_rib

    state, _ = _run_pipeline(spark, sf_dir)
    out = update_global_ip_rib(
        spark.createDataFrame([], TABLE_SCHEMAS["global_ip_rib"]), state,
        now=dt.datetime(2030, 1, 1),
        max_interval=dt.timedelta(days=36500))
    return out.select("prefix", "prefix_len", "recv_origin_as", "is_withdrawn",
                      "timestamp", "first_added_timestamp", "num_peers",
                      "advertising_peers", "withdrawn_peers")
