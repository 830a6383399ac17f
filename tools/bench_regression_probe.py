"""Adjudicate the two "real"-flagged r13 regressions (round-14
verdict #1): q_dead_letter and q_contamination were stable at
1.17-1.25 s wall for rounds 10-12, then jumped +45% wall / +40%
cpu_s in the r13 full pass at LOWER ambient load than their r12
draws — on code round 13 never touched (`sources/tsv.py`,
`queries_text.py`: zero r13 commits). The only r13-touched shared
surface on their path is bench.py itself (+222 lines) and the
rotation-driven change in mid-pass NEIGHBOR order (which queries ran
just before them, i.e. what cache/memory state they inherited).

This probe removes both confounders: each query gets idle-gated
cold draws in a fresh session with a fixed warmup, no 150-query
pass context. Both CPU counters are recorded — the /proc tree
sampler (the one r10-r13 cpu_s numbers came from, for
apples-to-apples) and the cgroup counter (the exact one bench.py
now uses). Reading:

- standalone cpu_s ~= the r10-r12 level  -> the r13 inflation was
  pass-context (ordering/cache inheritance) or host state: NOISE.
- standalone cpu_s holds at the r13 level -> the query genuinely
  does more work per run: REAL, bisect the session/shared surface.

Usage: python tools/bench_regression_probe.py [q1,q2,...]
Writes BENCH_regprobe.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ("q_dead_letter", "q_contamination")
DRAWS = 3
# prior-round full-pass values for the verdict table (from
# BENCH_LOCAL_r10..r13 query/query_meta records)
HISTORY = {
    "q_dead_letter": {"r12": {"wall_s": 1.18, "cpu_s": 4.49},
                      "r13": {"wall_s": 1.77, "cpu_s": 6.21}},
    "q_contamination": {"r12": {"wall_s": 1.24, "cpu_s": 3.42},
                        "r13": {"wall_s": 1.73, "cpu_s": 4.97}},
}


def _proc_tree_cpu() -> float:
    """The r10-r13 sampler, verbatim semantics: utime+stime+cutime+
    cstime over this process's live descendant tree."""
    import glob as _glob
    tick = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    procs: dict[int, tuple[int, float]] = {}
    for stat in _glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(stat) as fh:
                data = fh.read()
            rest = data[data.rindex(")") + 2:].split()
            procs[int(stat.split("/")[2])] = (
                int(rest[1]), int(rest[11]) + int(rest[12])
                + int(rest[13]) + int(rest[14]))
        except (OSError, ValueError, IndexError):
            continue
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        children.setdefault(ppid, []).append(pid)
    total, stack = 0, [me]
    while stack:
        pid = stack.pop()
        if pid in procs:
            total += procs[pid][1]
            stack.extend(children.get(pid, ()))
    return total / tick


def main() -> None:
    import bench  # the shared ambient gate + cgroup counter

    queries = (sys.argv[1].split(",") if len(sys.argv) > 1
               else list(QUERIES))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from obmp_psql_spark.operators.cache import release_build_artifacts
    from obmp_psql_spark.registry import all_specs
    from obmp_psql_spark.session import get_spark

    ambient0, waited = bench._wait_ambient(bench.IDLE_WAIT_MAX_S)
    spark = get_spark("bench-regprobe")
    specs = all_specs()
    # bench.py's warmup, so the first draw is not the JIT draw
    from pyspark.sql import functions as F
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000) \
        .groupBy("user_id").count() \
        .write.format("noop").mode("overwrite").save()

    out: dict = {"sf_dir": sf_dir, "ambient_at_start": ambient0,
                 "idle_waited_s": waited, "draws_per_query": DRAWS,
                 "history_full_pass": HISTORY, "results": {}}
    for name in queries:
        rows = []
        for i in range(DRAWS):
            amb, w = bench._wait_ambient(bench.REDRAW_WAIT_MAX_S)
            release_build_artifacts()
            p0, c0 = _proc_tree_cpu(), bench._tree_cpu_seconds()
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir) \
                .write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            rows.append({
                "wall_s": round(wall, 3),
                "cpu_s_proc_tree": round(_proc_tree_cpu() - p0, 3),
                "cpu_s_cgroup": round(bench._tree_cpu_seconds() - c0, 3),
                "load_at_draw": amb, "idle_waited_s": w,
            })
            print(name, rows[-1], flush=True)
        best = min(rows, key=lambda r: r["wall_s"])
        hist = HISTORY.get(name, {})
        r12, r13 = hist.get("r12", {}), hist.get("r13", {})
        verdict = None
        if r12.get("cpu_s") and r13.get("cpu_s"):
            # closer (in log-space) to the stable r10-r12 level than
            # to the inflated r13 level -> the r13 draw was context
            mid = (r12["cpu_s"] * r13["cpu_s"]) ** 0.5
            verdict = ("noise-r13-pass-context"
                       if best["cpu_s_proc_tree"] < mid else "real")
        out["results"][name] = {
            "draws": rows, "best": best, "verdict": verdict}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "BENCH_regprobe.json")
    # cumulative record: merge per-query results so adjudications
    # from earlier probe runs (different query sets) are preserved
    if os.path.exists(path):
        try:
            with open(path) as fh:
                old = json.load(fh)
            merged = old.get("results", {})
            merged.update(out["results"])
            out["results"] = merged
        except Exception:
            pass
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({n: r["verdict"] for n, r in out["results"].items()}))


if __name__ == "__main__":
    main()
