"""Structured Streaming ingest (reference hot path: Kafka consumer ->
writer threads -> bulk upsert, ConsumerRunnable.java +
WriterRunnable.java; SURVEY §2.8, §3.1).

Spark shape: one stream per message type ->
``foreachBatch(apply_<type>)`` against the state store. The micro
-batch IS the reference's 300 ms/3000-row writer batch (T1); the
within-batch ``dedup_latest`` in each apply function IS its
state-compression map (T2/A9); checkpointing replaces Kafka group
offsets (T8); MERGE idempotency + the batch-id guard replace the
attr dedup cache (T5/J10).

Kafka is the production source (sources/kafka.py); tests drive the
same pipeline from a file stream — the sink logic is identical, which
is the point of foreachBatch.

Ordering note (SURVEY §7 known-hard #2): the reference serializes
per-peer via sticky consumer threads; here control messages
(collector/router/peer) are applied by their own streams, and within
a micro-batch the apply functions handle ordering (e.g. the peer
flush uses timestamp guards, so a prefix newer than the peer-up
survives regardless of apply order). Cross-batch eventual consistency
matches the reference's cross-thread behavior.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .. import ingest, ingest_ls
from ..schemas import MESSAGE_SCHEMAS
from ..state import ParquetStateStore


class BmpStreamingIngest:
    """foreachBatch glue: message batch -> apply -> state store.

    Appends (logs) are written BEFORE the state overwrite so their
    lazy plans read the pre-merge state version; the store retains
    two versions as a safety net (see state.py)."""

    def __init__(self, spark: SparkSession, store: ParquetStateStore,
                 geo_ip: DataFrame | None = None):
        self.spark = spark
        self.store = store
        self.geo_ip = geo_ip

    # -- batch-id guard: exactly-once effect under foreachBatch retry --
    def _guard_path(self, name: str) -> str:
        return os.path.join(self.store.root, f"_applied_{name}.json")

    def _already_applied(self, name: str, batch_id: int) -> bool:
        p = self._guard_path(name)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)["batch_id"] >= batch_id
        return False

    def _mark_applied(self, name: str, batch_id: int) -> None:
        with open(self._guard_path(name), "w") as f:
            json.dump({"batch_id": batch_id}, f)

    # -- per-type batch handlers ---------------------------------------
    def unicast_prefix_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._already_applied("unicast_prefix", batch_id):
            return
        from pyspark.sql import functions as F
        state = self.store.read("ip_rib")
        new_state, log = ingest.apply_unicast_prefix(state, batch)
        # hour partitions: Timescale 1-hour chunks (1_base.sql:367)
        self.store.append(
            "ip_rib_log",
            log.withColumn("log_hour", F.date_trunc("hour", "timestamp")),
            partition_by="log_hour")
        self.store.overwrite("ip_rib", new_state)
        self._mark_applied("unicast_prefix", batch_id)

    def base_attribute_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._already_applied("base_attribute", batch_id):
            return
        self.store.overwrite(
            "base_attrs",
            ingest.apply_base_attribute(self.store.read("base_attrs"), batch))
        self._mark_applied("base_attribute", batch_id)

    def peer_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._already_applied("peer", batch_id):
            return
        peers, rib, log = ingest.apply_peer(
            self.store.read("bgp_peers"), self.store.read("ip_rib"),
            self.store.read("routers"), batch, self.geo_ip)
        self.store.append("peer_event_log", log)
        self.store.overwrite("bgp_peers", peers)
        self.store.overwrite("ip_rib", rib)
        self._mark_applied("peer", batch_id)

    def router_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._already_applied("router", batch_id):
            return
        routers, peers = ingest.apply_router(
            self.store.read("routers"), self.store.read("bgp_peers"),
            batch, self.geo_ip)
        self.store.overwrite("routers", routers)
        self.store.overwrite("bgp_peers", peers)
        self._mark_applied("router", batch_id)

    def collector_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._already_applied("collector", batch_id):
            return
        collectors, routers = ingest.apply_collector(
            self.store.read("collectors"), self.store.read("routers"), batch)
        self.store.overwrite("collectors", collectors)
        self.store.overwrite("routers", routers)
        self._mark_applied("collector", batch_id)

    def bmp_stat_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._already_applied("bmp_stat", batch_id):
            return
        self.store.append("stat_reports", ingest.prepare_bmp_stat(batch))
        self._mark_applied("bmp_stat", batch_id)

    def ls_node_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._already_applied("ls_node", batch_id):
            return
        state, log = ingest_ls.apply_ls_node(self.store.read("ls_nodes"), batch)
        self.store.append("ls_nodes_log", log)
        self.store.overwrite("ls_nodes", state)
        self._mark_applied("ls_node", batch_id)

    def ls_link_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._already_applied("ls_link", batch_id):
            return
        state, log = ingest_ls.apply_ls_link(self.store.read("ls_links"), batch)
        self.store.append("ls_links_log", log)
        self.store.overwrite("ls_links", state)
        self._mark_applied("ls_link", batch_id)

    def ls_prefix_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._already_applied("ls_prefix", batch_id):
            return
        state, log = ingest_ls.apply_ls_prefix(self.store.read("ls_prefixes"), batch)
        self.store.append("ls_prefixes_log", log)
        self.store.overwrite("ls_prefixes", state)
        self._mark_applied("ls_prefix", batch_id)

    def l3vpn_batch(self, batch: DataFrame, batch_id: int) -> None:
        if self._already_applied("l3vpn", batch_id):
            return
        state, log = ingest_ls.apply_l3vpn(self.store.read("l3vpn_rib"), batch)
        self.store.append("l3vpn_rib_log", log)
        self.store.overwrite("l3vpn_rib", state)
        self._mark_applied("l3vpn", batch_id)

    HANDLERS = {
        "unicast_prefix": unicast_prefix_batch,
        "base_attribute": base_attribute_batch,
        "peer": peer_batch,
        "router": router_batch,
        "collector": collector_batch,
        "bmp_stat": bmp_stat_batch,
        "ls_node": ls_node_batch,
        "ls_link": ls_link_batch,
        "ls_prefix": ls_prefix_batch,
        "l3vpn": l3vpn_batch,
    }

    def start_kafka_stream(self, msg_type: str, bootstrap_servers: str,
                           checkpoint_dir: str, **kafka_opts):
        """Production entry point: Kafka topic -> parse_tsv -> the
        same foreachBatch handler as the file stream (S1 + S2 + T8).
        Requires the spark-sql-kafka connector on the classpath."""
        from ..sources.kafka import read_stream

        handler = self.HANDLERS[msg_type].__get__(self)
        typed = read_stream(self.spark, msg_type, bootstrap_servers,
                            **kafka_opts).drop("kafka_key")
        return (
            typed.writeStream
            .foreachBatch(handler)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime="1 second")
            .start()
        )

    def start_file_stream(self, msg_type: str, source_dir: str,
                          checkpoint_dir: str, available_now: bool = True):
        """Drive the pipeline from a parquet file stream (tests /
        backfill). The production Kafka entry point builds the same
        writeStream with sources.kafka.read_stream instead."""
        handler = self.HANDLERS[msg_type].__get__(self)
        reader = (
            self.spark.readStream.schema(MESSAGE_SCHEMAS[msg_type])
            .parquet(source_dir)
        )
        trigger = {"availableNow": True} if available_now \
            else {"processingTime": "1 second"}
        return (
            reader.writeStream
            .foreachBatch(handler)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**trigger)
            .start()
        )
