"""Kafka source builders (S1; reference consumer:
ConsumerRunnable.java:253-308, topics obmp-psql.yml:113-121).

The spark-sql-kafka connector jar is not in this container, so the
``.load()`` call in ``read_stream`` is the ONLY line of this path
that never executes in-container. Everything around it is executed
test surface:

- ``reader_options`` (pure) pins the option wiring — topic name,
  offset reset, ``maxOffsetsPerTrigger`` value threading;
- ``decode_kafka_records`` is the whole post-``load()`` stage
  (kafka record schema -> typed message rows) and is driven E2E by
  the file-source stand-in in ``BmpStreamingIngest.
  start_kafka_shaped_stream`` (tests/test_streaming.py).

Plan shape notes:

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
from pyspark.sql import functions as F

from .tsv import parse_tsv

TOPIC_PREFIX = "openbmp.parsed."


def reader_options(
    msg_type: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int = 100_000,
) -> dict[str, str]:
    """The exact option map ``read_stream`` hands the connector —
    factored pure so the wiring (topic name derivation, int->str
    threading of the trigger bound) is pinned by unit test without
    the connector jar.

    ``max_offsets_per_trigger`` is a RATE CAP (the reference's
    pause/resume backpressure, ConsumerRunnable.java:253-308), not a
    data-derived sizing constant: its right value is the sink's
    sustained per-trigger capacity, a property of the deployment's
    executor count — so it stays a caller-tunable default (100k/
    trigger ≈ 36× the reference's 2.8k msg/s at a 1 s trigger)
    rather than deriving from input volume like the partition knobs
    (finding 40 scope)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": f"{TOPIC_PREFIX}{msg_type}",
        "startingOffsets": starting_offsets,
        "maxOffsetsPerTrigger": str(max_offsets_per_trigger),
    }


def decode_kafka_records(raw: DataFrame, msg_type: str) -> DataFrame:
    """Kafka record schema (key BINARY, value BINARY, topic STRING,
    timestamp, ...) -> typed message rows + ``kafka_key``. This is
    the ENTIRE post-``load()`` stage, shared verbatim between the
    production connector stream and any stand-in source exposing the
    same columns (file/rate/memory) — how the path gets executed
    evidence in a container without the connector jar."""
    # keep= threads the record key THROUGH the parse projection: a
    # parent-plan attribute reference (raw["key"]) fails analysis on
    # streaming relations — a latent bug in the never-executed
    # original wrapper that the stand-in E2E test caught (the point
    # of executing this path in-container)
    return (parse_tsv(raw, msg_type, keep=("key",))
            .withColumn("kafka_key", F.col("key").cast("string"))
            .drop("key"))


def read_stream(
    spark: SparkSession,
    msg_type: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int = 100_000,
) -> DataFrame:
    """readStream for one parsed-message topic -> typed message rows.
    Thin wrapper: connector ``load()`` + the shared decode stage."""
    raw = (
        spark.readStream.format("kafka")
        .options(**reader_options(msg_type, bootstrap_servers,
                                  starting_offsets,
                                  max_offsets_per_trigger))
        .load()
    )
    return decode_kafka_records(raw, msg_type)


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
