"""A/B the volume-derived streaming state-partition count at the tier
where it diverges from the old fixed 8 (round-13 finding 44a):
`_with_stream_partitions` now sizes `spark.sql.shuffle.partitions` —
the number of state-store instances for the checkpoint's lifetime —
by the batch gates' clamp(source bytes / 32MB, 8, 256) law. At sf0.1
that is the floor (8, behavior unchanged); at sf100 (2.1 GB source)
it derives 66. This probe pushes the full sf100 events stream
(100M rows) through a stateful dropDuplicates into a noop sink with
both settings and reports walls.

Keyspace is bounded (event_type x user_id % 5M ≈ 5M keys) so state
fits comfortably while the shuffle + per-instance state commit still
carries the full 100M-row volume — the cost the knob governs.

Usage: python tools/bench_stream_parts.py [sf_dir=/tmp/sf100]
Writes BENCH_stream_parts.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    from obmp_psql_spark.queries_bmp import _gate_shuffle_partitions
    from obmp_psql_spark.session import get_spark, normalize_ts

    spark = get_spark("bench-stream-parts")
    spark.range(10000).selectExpr("id % 7 k").groupBy("k").count() \
        .write.format("noop").mode("overwrite").save()
    derived = _gate_shuffle_partitions(sf_dir)
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def run(parts: int) -> float:
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        ckpt = tempfile.mkdtemp(prefix=f"sparts_{parts}_")
        try:
            src = (spark.readStream.schema(batch_schema)
                   .option("pathGlobFilter", "events.parquet")
                   .parquet(sf_dir))
            ev = normalize_ts(src)
            dedup = (ev.withColumn("ukey", F.pmod("user_id",
                                                  F.lit(5_000_000)))
                     .withWatermark("ts", "1 hour")
                     .dropDuplicates(["ukey", "event_type"])
                     .select("ukey", "event_type"))
            t0 = time.perf_counter()
            q = (dedup.writeStream.outputMode("append")
                 .format("noop")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            return round(time.perf_counter() - t0, 3)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    results = {}
    # alternate arms to cancel warm-up order effects
    for parts in (8, derived, 8, derived):
        key = f"parts_{parts}"
        w = run(parts)
        results.setdefault(key, []).append(w)
        print(f"{key}: {w}s", flush=True)

    out = {
        "metric": "stream_state_partitions_ab",
        "sf_dir": sf_dir,
        "derived_parts": derived,
        "walls_s": results,
        "min_s": {k: min(v) for k, v in results.items()},
        "note": "100M-row availableNow stream -> stateful "
                "dropDuplicates (~5M keys) -> noop sink; "
                "spark.sql.shuffle.partitions fixes the state-store "
                "instance count; arms alternated, fresh checkpoint "
                "per run",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_stream_parts.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
