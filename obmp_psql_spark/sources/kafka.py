"""Kafka source builders (S1; reference consumer:
ConsumerRunnable.java:253-308, topics obmp-psql.yml:113-121).

The spark-sql-kafka connector jar is not in this container, so
``read_stream`` raises a clear error at ``load()`` time if the
package is missing — the plan construction itself is the production
shape:

- one stream per message type (topic ``openbmp.parsed.<type>``), so
  each type gets its own trigger/rate (replaces the reference's
  per-topic pause/resume backpressure, T4);
- ``maxOffsetsPerTrigger`` bounds the micro-batch (the reference's
  max.poll.records=1000 / writer queue backpressure);
- the Kafka record key (peer hash, ConsumerRunnable.java:562) rides
  along as ``kafka_key`` for per-peer diagnostics — ordering within
  a key is preserved by the per-batch dedup-latest + timestamp-guard
  merges, not by partition routing (T3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tsv import parse_tsv

TOPIC_PREFIX = "openbmp.parsed."


def read_stream(
    spark: SparkSession,
    msg_type: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int = 100_000,
) -> DataFrame:
    """readStream for one parsed-message topic -> typed message rows."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", f"{TOPIC_PREFIX}{msg_type}")
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        .load()
    )
    return parse_tsv(raw, msg_type).withColumn(
        "kafka_key", raw["key"].cast("string"))


def read_stream_all(
    spark: SparkSession, bootstrap_servers: str, **kw
) -> DataFrame:
    """Pattern-subscribe variant (S1 regex subscribe); downstream
    must dispatch on the ``topic`` column."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", f"{TOPIC_PREFIX}.*")
        .load()
    )
