"""Time-travel replay-cost probe (round-9 verdict #7): how does
snapshot_at/read_at/snapshot_diff cost grow with commit-log length,
and what does checkpoint_log buy?

For N committed appends (N = 10/100/1000 — two decades over the
2-commit gate scale):
- replay_ms: wall of ``snapshot_at(mid)`` — pure driver-side JSON
  log replay, the O(commits) component the checkpoint bounds;
- diff_s: end-to-end ``snapshot_diff(read_at(mid), read()).count()``
  — replay + multi-root parquet assembly + the full-outer diff join
  (this one also carries the small-files tax of N append dirs, which
  optimize(), not checkpoint_log, removes);
- after ``checkpoint_log(keep=20)``: replay_ck_ms of a recent
  version — the bounded-window cost any later read pays.

Writes BENCH_diff.json. Usage: python tools/bench_diff_scale.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [10, 100, 1000]
BATCH = 200
KEEP = 20


def main() -> None:
    from pyspark.sql import functions as F

    from obmp_psql_spark.operators.diff import snapshot_diff
    from obmp_psql_spark.session import get_spark
    from obmp_psql_spark.state import TxnStateStore

    spark = get_spark("bench-diff-scale")
    if os.environ.get("DIFF_SCALES"):
        global SCALES
        SCALES = [int(x) for x in os.environ["DIFF_SCALES"].split(",")]
    out: dict = {"batch_rows": BATCH, "keep": KEEP, "scales": {}}
    for n_commits in SCALES:
        store = TxnStateStore(
            spark, tempfile.mkdtemp(prefix=f"diffprobe{n_commits}_"))
        for i in range(n_commits):
            # half the keys churn every commit, half are fresh
            batch = spark.range(BATCH).select(
                (F.col("id") + (i % 2) * 100_000_000
                 + i * (BATCH // 2)).alias("k"),
                F.lit(i).cast("long").alias("v"))
            with store.transaction() as txn:
                txn.append("t", batch.coalesce(1))
        latest = store.snapshot().version
        mid = latest - n_commits // 2
        t0 = time.monotonic()
        store.snapshot_at(mid)
        replay_ms = round((time.monotonic() - t0) * 1000, 1)
        old = store.read_at("t", mid, schema=batch.schema) \
            .groupBy("k").agg(F.max("v").alias("v"))
        new = store.read("t", schema=batch.schema) \
            .groupBy("k").agg(F.max("v").alias("v"))
        t0 = time.monotonic()
        n_changed = snapshot_diff(old, new, keys=["k"],
                                  compare_cols=["v"]).count()
        diff_s = round(time.monotonic() - t0, 3)
        store.checkpoint_log(keep=KEEP)
        t0 = time.monotonic()
        store.snapshot_at(latest - KEEP // 2)
        replay_ck_ms = round((time.monotonic() - t0) * 1000, 1)
        rec = {"commits": n_commits, "replay_ms": replay_ms,
               "diff_s": diff_s, "n_changed": n_changed,
               "replay_after_checkpoint_ms": replay_ck_ms}
        out["scales"][str(n_commits)] = rec
        print(n_commits, rec, flush=True)
    path = "/root/repo/BENCH_diff.json"
    if os.path.exists(path):  # merge partial runs (DIFF_SCALES subsets)
        try:
            with open(path) as fh:
                old = json.load(fh)
            if old.get("keep") == KEEP and old.get("batch_rows") == BATCH:
                out["scales"] = {**old.get("scales", {}), **out["scales"]}
        except Exception:
            pass
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
