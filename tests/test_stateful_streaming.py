"""Custom stateful streaming operator (applyInPandasWithState):
running per-peer counters survive across micro-batches."""

from __future__ import annotations

import os

from obmp_psql_spark.streaming.stateful import peer_activity_counter

from .test_bmp_ingest import msgs, ts, upx


def test_peer_activity_counter_accumulates(spark, tmp_path):
    src_dir = str(tmp_path / "msgs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)

    msgs(spark, "unicast_prefix", [
        upx("add", "r1", "p1", "a1", ts(0)),
        upx("add", "r2", "p1", "a2", ts(1)),
        upx("del", "r3", "p2", "", ts(2)),
    ]).coalesce(1).write.mode("append").parquet(src_dir)

    from obmp_psql_spark.schemas import MESSAGE_SCHEMAS
    stream = spark.readStream.schema(MESSAGE_SCHEMAS["unicast_prefix"]) \
        .parquet(src_dir)
    out = peer_activity_counter(stream)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName("peer_counts").option("checkpointLocation", ckpt)
         .trigger(processingTime="500 milliseconds").start())
    try:
        q.processAllAvailable()
        first = {r.peer_hash_id: (r.updates, r.withdraws)
                 for r in spark.table("peer_counts").collect()}
        assert first == {"p1": (2, 0), "p2": (0, 1)}

        # second wave: state must carry over, not reset
        msgs(spark, "unicast_prefix", [
            upx("del", "r1", "p1", "", ts(3)),
            upx("add", "r4", "p2", "a3", ts(4)),
        ]).coalesce(1).write.mode("append").parquet(src_dir)
        q.processAllAvailable()
        rows = spark.table("peer_counts").collect()
        latest = {}
        for r in rows:  # update mode appends; last emission per key wins
            latest[r.peer_hash_id] = (r.updates, r.withdraws)
        assert latest == {"p1": (2, 1), "p2": (1, 1)}
    finally:
        q.stop()
