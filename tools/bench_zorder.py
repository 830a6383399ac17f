"""Z-order layout probe: measure actual parquet row-group pruning.

Writes the events table twice with small row groups — once in append
(timestamp) order, once Morton-clustered on quantized
(user_id, value) via operators/layout.py — then counts, from the
parquet FOOTER STATISTICS (DuckDB parquet_metadata), how many row
groups a 2-D box predicate actually has to touch in each layout, and
times the same box scan in Spark.

The claim being measured: a single-column sort prunes one dimension
and leaves the other unpruned; the Morton layout gives BOTH columns
min/max locality, so the touched-group count drops multiplicatively.
This is footer math, not wall-clock noise — the same statistics any
engine (Spark, DuckDB, Trino, Delta/Iceberg readers) prunes with at
100 TB.

Usage: python tools/bench_zorder.py [out=BENCH_zorder.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [("100k", "/root/testdata/sf0.1"),
          ("1M", "/tmp/sf1")]
BITS = 16
# box: a narrow user slice x a broad value band — the mixed
# selectivity where single-column layouts fail on one side
X_LO, X_HI = 1000, 1200
Y_LO, Y_HI = 10000, 20000


def _touched(con, path: str) -> tuple[int, int]:
    q = f"""
    WITH s AS (
      SELECT row_group_id, file_name,
             max(CASE WHEN path_in_schema = 'x'
                 THEN CAST(stats_min_value AS BIGINT) END) AS x_min,
             max(CASE WHEN path_in_schema = 'x'
                 THEN CAST(stats_max_value AS BIGINT) END) AS x_max,
             max(CASE WHEN path_in_schema = 'y'
                 THEN CAST(stats_min_value AS BIGINT) END) AS y_min,
             max(CASE WHEN path_in_schema = 'y'
                 THEN CAST(stats_max_value AS BIGINT) END) AS y_max
      FROM parquet_metadata('{path}/*.parquet')
      GROUP BY row_group_id, file_name
    )
    SELECT count(*) AS total,
           count(*) FILTER (x_max >= {X_LO} AND x_min <= {X_HI}
                            AND y_max >= {Y_LO} AND y_min <= {Y_HI})
             AS touched
    FROM s
    """
    total, touched = con.execute(q).fetchone()
    return int(total), int(touched)


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_zorder.json"
    import duckdb
    from pyspark.sql import functions as F

    from obmp_psql_spark.operators.layout import (cluster_by_zorder,
                                                  quantize, z_value)
    from obmp_psql_spark.session import get_spark, load_tables

    spark = get_spark("bench-zorder")
    con = duckdb.connect()
    out: dict = {"bits": BITS, "box": [X_LO, X_HI, Y_LO, Y_HI]}

    for tag, sf in SCALES:
        if not os.path.isdir(sf):
            print(f"skip {tag}: {sf} missing"); continue
        ev = load_tables(spark, sf, ("events",))["events"]
        base = ev.select(
            "event_id", "ts",
            F.pmod(F.col("user_id"), F.lit(1 << BITS)).cast("long")
            .alias("x"),
            quantize(F.col("value"), 0.0, 561.0, BITS).alias("y"),
            "value")
        res: dict = {}
        for layout in ("linear", "zorder"):
            path = f"/tmp/zorder_probe_{tag}_{layout}"
            shutil.rmtree(path, ignore_errors=True)
            df = (base.repartitionByRange(8, "ts").sortWithinPartitions("ts")
                  if layout == "linear" else
                  cluster_by_zorder(base, z_value(F.col("x"), F.col("y"),
                                                  BITS), 8))
            (df.write.option("parquet.block.size", 131072)
             .parquet(path))
            total, touched = _touched(con, path)
            t0 = time.monotonic()
            n = (spark.read.parquet(path)
                 .filter((F.col("x").between(X_LO, X_HI))
                         & (F.col("y").between(Y_LO, Y_HI)))
                 .count())
            wall = round(time.monotonic() - t0, 3)
            res[layout] = {"row_groups_total": total,
                           "row_groups_touched": touched,
                           "box_rows": int(n), "scan_wall_s": wall}
        res["pruning_gain"] = round(
            res["linear"]["row_groups_touched"]
            / max(1, res["zorder"]["row_groups_touched"]), 2)
        out[tag] = res
        print(tag, json.dumps(res))

    with open(out_name, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_name)


if __name__ == "__main__":
    main()
