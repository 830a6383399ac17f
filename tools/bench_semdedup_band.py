"""Recall-at-fixed-pair-budget probe for the SemDeDup cap policies.

Compares the two ways of bounding within-cluster pair work on an
oversized k-means cluster:

- ``shard_oversized_clusters`` — random hash shards: a true near-dup
  pair survives the cap with probability ~1/n_shards (flat recall
  loss proportional to the split).
- ``band_oversized_clusters`` — centered-LSH sign banding first (a
  near-dup pair co-bands with probability ~(1 - theta/pi)^planes,
  theta tiny for near-dups), then the same hash cap as a residual
  guard.

Ground truth is the UNCAPPED within-cluster dedup on the identical
k-means assignment (feasible at probe scale; the cap only changes
blocking below cluster granularity, so this isolates exactly what the
cap trades). Recall = |dropped by policy ∩ dropped by truth| /
|dropped by truth| in ppm; the pair budget is the blocks' sum
c*(c-1)/2 census — the number that decides 100 TB feasibility.

Usage: python tools/bench_semdedup_band.py [out.json]
(expects /tmp/sf1, /tmp/sf10 from tools/make_sf_scale.py; skips
missing scales)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [("20k", "/tmp/sf1"), ("200k", "/tmp/sf10")]
CAP = 128
PLANES = 3
THRESHOLD = 0.95


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else \
        "BENCH_semdedup_band.json"
    from pyspark.sql import functions as F

    from obmp_psql_spark.operators import similarity as S
    from obmp_psql_spark.operators.cache import (build_artifacts,
                                                 owned_persist)
    from obmp_psql_spark.session import fan_out, get_spark, load_tables

    spark = get_spark("bench-semdedup-band")
    results: dict = {"cap": CAP, "n_planes": PLANES,
                     "threshold": THRESHOLD, "scales": {}}

    def census(assigned):
        r = (assigned.groupBy("cluster_id")
             .agg(F.count(F.lit(1)).alias("c"))
             .agg(F.max("c").alias("mx"),
                  F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
                  F.count(F.lit(1)).alias("blocks")).collect()[0])
        return int(r["mx"]), int(r["pairs"]), int(r["blocks"])

    def dropped_set(assigned, e):
        rows = (S.semantic_dedup_within(assigned, e, threshold=THRESHOLD)
                .filter(F.col("kept") == 0).select("vec_id").collect())
        return {r["vec_id"] for r in rows}

    for tag, sf_dir in SCALES:
        if not os.path.isdir(sf_dir):
            print(f"skip {tag}: {sf_dir} missing", file=sys.stderr)
            continue
        e = owned_persist(fan_out(
            load_tables(spark, sf_dir, ("embeddings",))["embeddings"],
            spark))
        n_vec = e.count()
        n_clusters = max(16, int(math.sqrt(n_vec)))
        row: dict = {"n_vectors": n_vec, "n_clusters": n_clusters}
        with build_artifacts():
            base = owned_persist(
                S.kmeans_assign(e, n_clusters=n_clusters, train_iters=1))
            t0 = time.time()
            truth = dropped_set(base, e)
            row["uncapped_within_s"] = round(time.time() - t0, 3)
            row["uncapped_dropped"] = len(truth)
            mx, pairs, blocks = census(base)
            row["uncapped_max_occ"] = mx
            row["uncapped_pairs"] = pairs

            for name, make in (
                ("hash_shard",
                 lambda: S.shard_oversized_clusters(
                     base, max_cluster_size=CAP)),
                ("lsh_band",
                 lambda: S.band_oversized_clusters(
                     base, e, max_cluster_size=CAP, n_planes=PLANES)),
            ):
                t0 = time.time()
                assigned = owned_persist(make())
                mx, pairs, blocks = census(assigned)
                drop = dropped_set(assigned, e)
                extra = len(drop - truth)
                inter = len(drop & truth)
                row[name] = {
                    "wall_s": round(time.time() - t0, 3),
                    "max_occ": mx, "pairs": pairs, "blocks": blocks,
                    "dropped": len(drop),
                    "recall_ppm": (inter * 1_000_000 // len(truth)
                                   if truth else None),
                    # sanity: capping can only LOSE drops, never invent
                    "extra_drops": extra,
                }
                print(tag, name, json.dumps(row[name]), flush=True)
        results["scales"][tag] = row

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name) \
        if not os.path.isabs(out_name) else out_name
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: v for k, v in results.items() if k != "scales"}))


if __name__ == "__main__":
    main()
