"""Streaming freshness probe: file-landed -> committed-visible latency
of the real ingest path across micro-batch trigger intervals.

The reference claims <100 ms steady-state consumer latency
(README.md:91-92) because every message UPSERTs row-at-a-time into
Postgres. Spark Structured Streaming trades that for micro-batch
throughput: a message becomes visible after (wait for the next
trigger) + (micro-batch plan/merge/commit). This probe MEASURES that
floor instead of hand-waving it: for each trigger interval it drops
gate-scale message files into a watched directory and polls the txn
store's commit log for the moment the data is atomically visible.

Method: messages synthesized from events (the q_bmp_rib_merge
fixture), pre-split into per-round parquet files; each round one file
is os.rename'd into the source dir (atomic on the same fs — the
stream never sees a half-written file), and the driver polls the
commit-log listing at 5 ms. The first round after stream start is
JIT/warmup and reported separately; steady-state stats use the rest.

Usage: python tools/bench_latency.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TRIGGERS = ["200 milliseconds", "1 second", "5 seconds"]
ROUNDS = 8  # per trigger interval (+1 warmup)


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_latency.json"
    from pyspark.sql import functions as F

    from obmp_psql_spark.queries_bmp import _messages
    from obmp_psql_spark.session import get_spark
    from obmp_psql_spark.state import TxnStateStore
    from obmp_psql_spark.streaming.pipeline import BmpStreamingIngest

    spark = get_spark("bench-latency")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    # pre-stage per-round message files (written OUTSIDE the watched
    # dir; one file each so a round lands atomically via rename)
    stage = tempfile.mkdtemp(prefix="lat_stage_")
    msgs = _messages(spark, SF_DIR)
    n_rounds_total = ROUNDS + 1
    per_round = []
    for r in range(n_rounds_total):
        part = msgs.filter(F.col("event_id") % n_rounds_total == r) \
            .drop("event_id")
        d = os.path.join(stage, f"r{r}")
        part.coalesce(1).write.parquet(d)
        src = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        per_round.append((os.path.join(d, src), part.count()))

    results: dict = {"sf_dir": SF_DIR, "rounds": ROUNDS,
                     "msgs_per_round": per_round[1][1],
                     "load_before": [round(x, 2) for x in os.getloadavg()],
                     "triggers": {}}

    # (trigger, rib_buckets): the bucketed sink variant runs at the
    # representative 1 s trigger — merge_buckets rewrites only the
    # buckets the batch touches, trading a bucket-prune distinct for
    # smaller writes; this measures which side wins at gate scale
    configs = [(t, None) for t in TRIGGERS] + [("1 second", 32)]
    for trig, buckets in configs:
        tag = trig if buckets is None else f"{trig} bucketed"
        root = tempfile.mkdtemp(prefix="lat_store_")
        srcdir = tempfile.mkdtemp(prefix="lat_src_")
        ckpt = tempfile.mkdtemp(prefix="lat_ckpt_")
        store = TxnStateStore(spark, root)
        ing = BmpStreamingIngest(spark, store, rib_buckets=buckets)
        q = ing.start_file_stream("unicast_prefix", srcdir, ckpt,
                                  available_now=False,
                                  trigger_interval=trig)
        log_dir = os.path.join(root, "_txn_log")

        def n_commits() -> int:
            # count only commits that made DATA visible — an empty
            # micro-batch (trigger fired, no new file) still writes a
            # commit record, which would register as instant latency
            n = 0
            for name in os.listdir(log_dir):
                # skip the committer's fsync'd .tmp_* staging entry —
                # it transiently holds the SAME content as the final
                # linked name and otherwise double-counts an in-flight
                # commit (observed as false ~0 ms rounds)
                if not name.endswith(".json") or name.startswith("."):
                    continue
                try:
                    with open(os.path.join(log_dir, name)) as f:
                        c = json.load(f)
                except (OSError, ValueError):
                    continue
                if any(a.get("has_files") for a in c.get("actions", [])):
                    n += 1
            return n

        lats = []
        try:
            for r, (path, _cnt) in enumerate(per_round):
                before = n_commits()
                # stage a copy beside the watched dir, then rename in
                # (atomic same-fs move; the original stays for the
                # next trigger interval's run)
                tmp = os.path.join(srcdir, f".b{r}.parquet.tmp")
                shutil.copy(path, tmp)
                dst = os.path.join(srcdir, f"b{r}.parquet")
                os.rename(tmp, dst)
                t0 = time.perf_counter()
                deadline = t0 + 120
                while n_commits() == before:
                    if time.perf_counter() > deadline:
                        raise TimeoutError(f"{trig}: round {r} never "
                                           "became visible")
                    time.sleep(0.005)
                lats.append(round(time.perf_counter() - t0, 3))
        finally:
            q.stop()
        warm, steady = lats[0], lats[1:]
        results["triggers"][tag] = {
            "warmup_s": warm,
            "min_s": min(steady),
            "median_s": round(statistics.median(steady), 3),
            # nearest-rank p95 (ceil), not a floor index — with 8
            # samples this is the max, never one rank too optimistic
            "p95_s": round(sorted(steady)[
                min(len(steady) - 1,
                    -(-95 * len(steady) // 100) - 1)], 3),
            "all_s": steady,
        }
        print(tag, json.dumps(results["triggers"][tag]), flush=True)
        shutil.rmtree(ckpt, ignore_errors=True)

    results["load_after"] = [round(x, 2) for x in os.getloadavg()]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name) \
        if not os.path.isabs(out_name) else out_name
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({t: {k: v for k, v in r.items() if k != "all_s"}
                      for t, r in results["triggers"].items()}))


if __name__ == "__main__":
    main()
