"""Round-13 A/B: is the r11->r12 steady-rate drift (48.8k -> 41.7k
msg/s) caused by the volume-adaptive gate shuffle knob (finding 40),
or is it host noise?

Arms, alternated draw-by-draw on one warm JVM (the same methodology as
bench.py's judged min-of-N):

- ``fixed8``   — ``_gate_shuffle_partitions`` monkeypatched to the
  pre-finding-40 literal 8.
- ``adaptive`` — stock head.

Note the arithmetic: at sf0.1 events.parquet is ~2 MB, so the adaptive
knob clamps to its floor of 8 — the two arms run the IDENTICAL Spark
conf. Any measured delta between them IS the noise band, which is
exactly what the drift question needs: if the 10-draw distribution
spans the r11/r12 judged numbers, the drift is noise, not the knob.

Also takes N idle-gated cold draws of q_bmp_l3vpn_view (the r12 plan
audit's heaviest gate, cpu_s ~= 100) to settle its noise-or-real watch
item with same-load provenance.

Writes BENCH_ab_gate.json at the repo root.
Usage: python tools/bench_ab_gate.py [draws_per_arm=5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    HEADLINE_LOAD_GATE,
    _cpu_delta,
    _tree_cpu_seconds,
    _wait_ambient,
)

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    draws_per_arm = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import obmp_psql_spark.queries_bmp as qb
    from obmp_psql_spark.operators.cache import release_build_artifacts
    from obmp_psql_spark.registry import all_specs
    from obmp_psql_spark.session import get_spark

    spark = get_spark("bench-ab")
    specs = all_specs()

    # same warm-up as bench.py so draw 1 is comparable to draws 2..N
    from pyspark.sql import functions as F
    spark.range(0, 10000).selectExpr("id % 7 k", "id v").groupBy("k") \
        .count().write.format("noop").mode("overwrite").save()
    from obmp_psql_spark.functions import net
    spark.createDataFrame([("::1",)], "ip string") \
        .select(net.ipv6_to_longs(F.col("ip"))) \
        .write.format("noop").mode("overwrite").save()
    # one throwaway cold build absorbs first-use JIT of the merge path
    qb._PIPELINE_CACHE.clear()
    specs["q_bmp_rib_merge"].fn(spark, SF_DIR) \
        .write.format("noop").mode("overwrite").save()
    release_build_artifacts()

    n_msgs = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    stock_fn = qb._gate_shuffle_partitions

    def cold_draw(name: str) -> dict:
        ambient, waited = _wait_ambient(120)
        qb._PIPELINE_CACHE.clear()
        release_build_artifacts()
        cpu0 = _tree_cpu_seconds()
        t0 = time.perf_counter()
        specs[name].fn(spark, SF_DIR) \
            .write.format("noop").mode("overwrite").save()
        release_build_artifacts()
        wall = round(time.perf_counter() - t0, 3)
        return {"wall_s": wall,
                "cpu_s": _cpu_delta(cpu0),
                "load_at_draw": ambient, "idle_waited_s": waited}

    arms: dict[str, list[dict]] = {"fixed8": [], "adaptive": []}
    for i in range(draws_per_arm):
        for arm in ("fixed8", "adaptive"):
            qb._gate_shuffle_partitions = \
                (lambda sf_dir: 8) if arm == "fixed8" else stock_fn
            d = cold_draw("q_bmp_rib_merge")
            d["msgs_per_sec"] = round(n_msgs / d["wall_s"])
            d["cpu_s_per_kmsg"] = (
                round(1000.0 * d["cpu_s"] / n_msgs, 3)
                if d["cpu_s"] is not None else None)
            arms[arm].append(d)
            print(f"draw {i+1} {arm}: {d}", flush=True)
    qb._gate_shuffle_partitions = stock_fn

    l3vpn: list[dict] = []
    for i in range(draws_per_arm):
        d = cold_draw("q_bmp_l3vpn_view")
        l3vpn.append(d)
        print(f"l3vpn draw {i+1}: {d}", flush=True)

    def stats(ds: list[dict], key: str) -> dict:
        vals = sorted(d[key] for d in ds if d.get(key) is not None)
        q = [d for d in ds if d["load_at_draw"] <= HEADLINE_LOAD_GATE]
        if not vals:  # every sample unusable (e.g. all cpu_s None)
            return {"min": None, "max": None, "median": None,
                    "qualified_draws": len(q), "n": 0}
        return {"min": vals[0], "max": vals[-1],
                "median": vals[len(vals) // 2],
                "qualified_draws": len(q), "n": len(vals)}

    out = {
        "metric": "ab_gate_shuffle_partitions",
        "sf": 0.1, "n_msgs": n_msgs,
        "adaptive_parts_at_sf0.1": stock_fn(SF_DIR),
        "arms": arms,
        "summary": {
            arm: {"wall_s": stats(ds, "wall_s"),
                  "msgs_per_sec": stats(ds, "msgs_per_sec"),
                  "cpu_s_per_kmsg": stats(ds, "cpu_s_per_kmsg")}
            for arm, ds in arms.items()},
        "l3vpn_draws": l3vpn,
        "l3vpn_summary": {"wall_s": stats(l3vpn, "wall_s"),
                          "cpu_s": stats(l3vpn, "cpu_s")},
        "note": "arms are conf-identical at sf0.1 (adaptive floor=8); "
                "the between-arm delta measures the same-code noise "
                "band for the judged steady headline",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_ab_gate.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in ("summary", "l3vpn_summary")}))


if __name__ == "__main__":
    main()
