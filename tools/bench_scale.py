"""Decade scaling probe: time the O(churn)-claimed headline operators
at sf0.1 and at a 10x derived dataset (tools/make_sf_scale.py), and
report the measured scaling exponent per query.

alpha = log10(t_10x / t_1x) — 1.0 is perfectly linear, anything
approaching 2.0 means a hidden quadratic (band-join blowup, per-key
churn multiplication, all-pairs leak). Wall times at this scale also
absorb fixed per-query overhead (plan/JIT/driver), so alpha < 1 is
common and fine; the gate is alpha well below ~1.5.

Writes BENCH_sf1.json at the repo root.

Usage: python tools/bench_scale.py [big_dir=/tmp/sf1]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = os.environ.get(
    "SCALE_PROBES",
    "q_bmp_rib_merge,q_bmp_txn_store,q_bmp_txn_bucketed,"
    "q_minhash_lsh,q_bmp_global_rib").split(",")


def main() -> None:
    big = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    decades = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    out_name = sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json"
    small = "/root/testdata/sf0.1"
    from obmp_psql_spark.operators.cache import release_build_artifacts
    from obmp_psql_spark.queries_bmp import _PIPELINE_CACHE
    from obmp_psql_spark.registry import all_specs
    from obmp_psql_spark.session import get_spark

    spark = get_spark("bench-scale")
    specs = all_specs()

    # generic warm-up so the first probe doesn't absorb session startup
    spark.range(0, 10000).selectExpr("id % 7 k", "id v").groupBy("k") \
        .count().write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    for name in PROBES:
        results[name] = {}
        for tag, sf_dir in (("sf0.1", small), ("sf1", big)):
            # cold pipeline per scale: min-of-2 cold builds, same
            # methodology as bench.py's headline trio
            best = None
            for _ in range(2):
                _PIPELINE_CACHE.clear()
                release_build_artifacts()
                t0 = time.perf_counter()
                specs[name].fn(spark, sf_dir) \
                    .write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            release_build_artifacts()
            results[name][tag] = round(best, 3)
        r = results[name]
        r["ratio"] = round(r["sf1"] / r["sf0.1"], 2)
        r["alpha"] = round(
            math.log10(r["sf1"] / r["sf0.1"]) / decades, 2)
        print(f"{name}: {r}", flush=True)

    out = {
        "metric": "decade_scaling_alpha",
        "probes": results,
        "scale_factor": round(10 ** decades),
        "note": "alpha=log10(t_big/t_sf0.1)/decades; 1.0=linear, "
                "2.0=quadratic; min-of-2 cold builds per scale on "
                "local[32]; 'sf1' key = the big dir",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
