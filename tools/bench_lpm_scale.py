"""Decade scaling probe for the containment/LPM join family (round-13
verdict #3): J5-J7 are the reference-critical theta-joins
(find_geo_ip 1_base.sql:66-81; RPKI containment
2_aggregations.sql:260-265), measured once at 2M probes in round 4
and never decade-probed. Probes `containment_join128` and
`lpm_join128` at 2M / 20M / 100M probe rows against a realistic
~500k-row ROA/geo-shaped dim (plus coarse supernets so the
bounded-explode path is exercised), probe rows derived from the sf100
events table.

Claims under test:
- one-probe-scan broadcast law (SURVEY finding 2): the dim broadcasts
  once, the probe side streams through a single hash equi-join on
  (family, bucket) — alpha ~<= 1.0 (linear in probes), no
  BroadcastNestedLoopJoin at any tier;
- the LPM top-1 window (one extra probe-key shuffle) stays linear too.

Usage: python tools/bench_lpm_scale.py [sf100_dir=/tmp/sf100]
Writes BENCH_lpm_scale.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DIM_ROWS = 500_000
TIERS = [("2M", 50), ("20M", 5), ("100M", 1)]  # (tag, keep 1-in-N)


def build_dim(spark):
    """ROA/geo-shaped prefix dim: 500k /24s spread over 10.0.0.0/8
    space + 256 /16 supernets + 8 /8s + a default route — the coarse
    tail a real table carries, exercising the bounded explode."""
    s24 = spark.range(DIM_ROWS).select(
        F.lit(4).alias("family"),
        F.lit(0).cast("long").alias("start_hi"),
        ((F.col("id") * 7919) % (1 << 24) * 256).alias("start_lo"),
        F.lit(0).cast("long").alias("end_hi"),
        ((F.col("id") * 7919) % (1 << 24) * 256 + 255).alias("end_lo"),
        F.lit(24).alias("masklen"),
        (F.col("id") % 50000 + 1000).alias("origin_as"))
    s16 = spark.range(256).select(
        F.lit(4).alias("family"),
        F.lit(0).cast("long").alias("start_hi"),
        (F.col("id") * (1 << 16)).alias("start_lo"),
        F.lit(0).cast("long").alias("end_hi"),
        (F.col("id") * (1 << 16) + ((1 << 16) - 1)).alias("end_lo"),
        F.lit(16).alias("masklen"),
        (F.col("id") + 64512).alias("origin_as"))
    s8 = spark.range(8).select(
        F.lit(4).alias("family"),
        F.lit(0).cast("long").alias("start_hi"),
        (F.col("id") * (1 << 24)).alias("start_lo"),
        F.lit(0).cast("long").alias("end_hi"),
        (F.col("id") * (1 << 24) + ((1 << 24) - 1)).alias("end_lo"),
        F.lit(8).alias("masklen"),
        (F.col("id") + 64000).alias("origin_as"))
    dflt = spark.range(1).select(
        F.lit(4).alias("family"),
        F.lit(0).cast("long").alias("start_hi"),
        F.lit(0).cast("long").alias("start_lo"),
        F.lit(0).cast("long").alias("end_hi"),
        F.lit((1 << 32) - 1).cast("long").alias("end_lo"),
        F.lit(0).alias("masklen"),
        F.lit(65535).alias("origin_as"))
    return s24.unionByName(s16).unionByName(s8).unionByName(dflt) \
        .localCheckpoint()


def probes_at(spark, sf_dir, keep_one_in):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if keep_one_in > 1:
        ev = ev.filter(F.col("event_id") % keep_one_in == 0)
    # deterministic v4 address spread over the full space (xxhash64 +
    # pmod: a plain Knuth multiply overflows int64 under ANSI mode at
    # sf100's 1e10-range user_ids)
    addr = F.pmod(F.xxhash64("user_id", "event_id"), F.lit(1 << 32))
    return ev.select(
        F.col("event_id").alias("probe_id"),
        F.lit(4).alias("pfamily"),
        F.lit(0).cast("long").alias("phi"),
        addr.cast("long").alias("plo"))


def main() -> None:
    sf100 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    from obmp_psql_spark.operators.lpm import (
        containment_join128,
        lpm_join128,
    )
    from obmp_psql_spark.session import get_spark

    spark = get_spark("bench-lpm-scale")
    spark.range(10000).selectExpr("id % 7 k").groupBy("k").count() \
        .write.format("noop").mode("overwrite").save()
    dim = build_dim(spark)

    def run_containment(p):
        # RPKI-validation shape: matched pairs -> per-probe agg
        # (max origin over covering ROAs, 2_aggregations.sql:242-265)
        m = containment_join128(p, "pfamily", "phi", "plo", dim,
                                broadcast=True)
        return m.groupBy("probe_id").agg(
            F.max("origin_as").alias("rpki_origin_as"),
            F.count(F.lit(1)).alias("n_roas"))

    def run_lpm(p):
        return lpm_join128(p, ["probe_id"], "pfamily", "phi", "plo",
                           dim, masklen_col="masklen", broadcast=True)

    results: dict[str, dict] = {}
    plans_ok = True
    for op, fn in (("containment_join128_agg", run_containment),
                   ("lpm_join128", run_lpm)):
        results[op] = {}
        for tag, keep in TIERS:
            p = probes_at(spark, sf100, keep)
            df = fn(p)
            plan = df._jdf.queryExecution().executedPlan().toString()
            if "BroadcastNestedLoopJoin" in plan:
                plans_ok = False
                print(f"!! BNL in {op} at {tag}", flush=True)
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(p).write.format("noop").mode("overwrite").save()
                dt_ = time.perf_counter() - t0
                best = dt_ if best is None else min(best, dt_)
            results[op][tag] = round(best, 3)
            print(f"{op} {tag}: {best:.3f}s", flush=True)
        r = results[op]
        r["alpha_2M_20M"] = round(math.log10(r["20M"] / r["2M"]), 2)
        r["alpha_20M_100M"] = round(
            math.log10(r["100M"] / r["20M"]) / math.log10(5), 2)
        r["alpha_cumulative"] = round(
            math.log10(r["100M"] / r["2M"]) / math.log10(50), 2)
        print(f"{op}: {r}", flush=True)

    out = {
        "metric": "lpm_containment_decade_scaling",
        "dim_rows": DIM_ROWS + 256 + 8 + 1,
        "no_bnl_at_any_tier": plans_ok,
        "probes": results,
        "note": "broadcast bucketed equi-join vs ~500k ROA/geo dim "
                "(incl. /16+/8+default supernets via bounded "
                "explode); probe rows from sf100 events; min-of-2 "
                "per tier on local[32]; alpha=log10-ratio scaled per "
                "decade, 1.0=linear in probes",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_lpm_scale.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
