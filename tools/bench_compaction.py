"""Compaction payoff probe: the small-files tax, measured.

Builds a txn-store table the way a micro-batch pipeline actually
fragments it — many small append commits — then measures a full scan
and an aggregate before and after ``TxnStateStore.optimize``,
alongside the physical file count. The wall gap IS the per-file
open/footer/schedule overhead that motivates OPTIMIZE; at 100 TB the
same fragmentation (thousands of KB files per partition) is the
difference between a scan that schedules millions of splits and one
that reads target-sized files.

Usage: python tools/bench_compaction.py [out=BENCH_compaction.json]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_APPENDS = 200
ROWS_PER_APPEND = 5000


def _files(store, table: str) -> int:
    return sum(len(glob.glob(os.path.join(p, "*.parquet")))
               for p in store.current_paths(table))


def _scan_wall(spark, store, table: str) -> float:
    t0 = time.monotonic()
    store.read(table).agg({"v": "sum", "k": "count"}).collect()
    return round(time.monotonic() - t0, 3)


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_compaction.json"
    from pyspark.sql import functions as F

    from obmp_psql_spark.session import get_spark
    from obmp_psql_spark.state import TxnStateStore

    spark = get_spark("bench-compaction")
    root = "/tmp/compaction_probe"
    shutil.rmtree(root, ignore_errors=True)
    store = TxnStateStore(spark, root)

    base = spark.range(ROWS_PER_APPEND)
    for i in range(N_APPENDS):
        store.append("t", base.select(
            F.concat(F.lit(f"b{i}_"), F.col("id").cast("string"))
            .alias("k"),
            (F.col("id") + i).cast("long").alias("v")))

    frag_files = _files(store, "t")
    frag_walls = [_scan_wall(spark, store, "t") for _ in range(3)]

    t0 = time.monotonic()
    store.optimize("t", num_files=8)
    optimize_wall = round(time.monotonic() - t0, 3)

    compact_files = _files(store, "t")
    compact_walls = [_scan_wall(spark, store, "t") for _ in range(3)]

    out = {
        "n_appends": N_APPENDS,
        "rows_total": N_APPENDS * ROWS_PER_APPEND,
        "fragmented": {"files": frag_files,
                       "scan_walls_s": frag_walls,
                       "scan_wall_min_s": min(frag_walls)},
        "optimize_wall_s": optimize_wall,
        "compacted": {"files": compact_files,
                      "scan_walls_s": compact_walls,
                      "scan_wall_min_s": min(compact_walls)},
        "scan_speedup": round(min(frag_walls) / min(compact_walls), 2),
    }
    shutil.rmtree(root, ignore_errors=True)
    with open(out_name, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print("wrote", out_name)


if __name__ == "__main__":
    main()
