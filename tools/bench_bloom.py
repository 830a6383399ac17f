"""Point-lookup pruning probe: parquet bloom filters on the store's
high-cardinality merge key.

Why this matters at 100 TB: an equality predicate on ``hash_id``
(md5-shaped, so dictionary encoding falls back to plain and dictionary
-page pruning stops working) otherwise scans every row group of every
file. A bloom filter per column chunk lets the reader skip whole row
groups for absent keys — the point-lookup complement to z-order's
min/max range pruning (BENCH_zorder.json). The probe measures warm
lookups, so the delta shown here is decode work only; on cold storage
the skipped IO is the real win.

Usage: python tools/bench_bloom.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 8_000_000
FILES = 8
LOOKUPS = 10


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_bloom.json"
    from pyspark.sql import functions as F

    from obmp_psql_spark.session import get_spark
    from obmp_psql_spark.state import TxnStateStore

    spark = get_spark("bench-bloom")
    df = spark.range(N).select(
        F.md5(F.col("id").cast("string")).alias("hash_id"),
        (F.col("id") % 1000).alias("v"))
    results: dict = {"n_rows": N, "files": FILES, "lookups": LOOKUPS,
                     "load_before": [round(x, 2) for x in os.getloadavg()]}

    absent = [spark.sql(f"SELECT md5('absent-{i}')").collect()[0][0]
              for i in range(LOOKUPS)]
    for tag, cols in (("plain", None), ("bloom", ["hash_id"])):
        store = TxnStateStore(spark, tempfile.mkdtemp(prefix=f"blb_{tag}_"))
        store.append("t", df)
        t0 = time.time()
        store.optimize("t", num_files=FILES, bloom_cols=cols,
                       bloom_ndv=N // FILES)
        compact_s = round(time.time() - t0, 3)
        d = store.read("t")
        d.filter(F.col("hash_id") == absent[0]).count()  # warm
        t0 = time.time()
        for k in absent:
            d.filter(F.col("hash_id") == k).count()
        per = round((time.time() - t0) / LOOKUPS, 4)
        size = sum(os.path.getsize(os.path.join(dp, f))
                   for p in store.current_paths("t")
                   for dp, _, fs in os.walk(p)
                   for f in fs if f.endswith(".parquet"))
        results[tag] = {"lookup_s": per, "compact_s": compact_s,
                        "bytes": size}
        print(tag, json.dumps(results[tag]), flush=True)

    results["speedup"] = round(
        results["plain"]["lookup_s"] / results["bloom"]["lookup_s"], 2)
    results["size_overhead_pct"] = round(
        100 * (results["bloom"]["bytes"] - results["plain"]["bytes"])
        / results["plain"]["bytes"], 1)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name) \
        if not os.path.isabs(out_name) else out_name
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: results[k]
                      for k in ("speedup", "size_overhead_pct")}))


if __name__ == "__main__":
    main()
