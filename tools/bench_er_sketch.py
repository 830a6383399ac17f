"""Scale probe for the entity-resolution joins and the Misra-Gries
heavy-hitters sketch.

What each claim predicts, and what this measures:

- **Blocked fuzzy match** (q_fuzzy_match): per-block pair count is
  quadratic in block size, and the blocks here (8 noun tokens) grow
  linearly with the table — so candidate pairs grow ~100x per data
  decade and wall should follow (alpha ~2). That is the documented
  failure mode, measured on purpose: blocking is only linear when
  the block key's cardinality scales WITH the data (or a block cap
  shards the degenerate keys, as lsh_topk does).
- **Sorted-neighborhood fuzzy** (q_fuzzy_sorted): candidate pairs =
  N x w by construction, so wall should stay ~linear (alpha ~1)
  across the same decade — the scale-path variant.
- **Misra-Gries** (operators/sketch.py): one Arrow pass with k
  counters per partition + a k*P-row merge; wall should track the
  token scan (alpha ~1) across three document decades while the
  summary stays ~k rows. The exact groupBy it replaces is timed
  alongside for the shuffle-size contrast.

Usage: python tools/bench_er_sketch.py [out=BENCH_er_sketch.json]
(documents decades need /tmp/sf1 + /tmp/sf10 from make_sf_scale.py)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PART_SCALES = [("2k", "/root/testdata/sf0.01"),
               ("20k", "/root/testdata/sf0.1")]
# the uncapped quadratic is measured over one decade only (the next
# one would be ~570M pairs); the guarded paths get a second decade
PART_SCALES_GUARDED = PART_SCALES + [("200k", "/tmp/sf1")]
DOC_SCALES = [("5k", "/root/testdata/sf0.1"),
              ("50k", "/tmp/sf1"),
              ("500k", "/tmp/sf10")]
MG_K = 50


def _alpha(t_small: float, t_big: float, factor: float = 10.0) -> float:
    return round(math.log(t_big / t_small) / math.log(factor), 3)


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_er_sketch.json"
    from pyspark.sql import functions as F

    from obmp_psql_spark.operators.cache import release_build_artifacts
    from obmp_psql_spark.operators.sketch import misra_gries
    from obmp_psql_spark.queries_curate import _docs, _norm_col
    from obmp_psql_spark.queries_olap import (fuzzy_blocked_pairs,
                                              q_fuzzy_match, q_fuzzy_sorted)
    from obmp_psql_spark.session import fan_out, get_spark, load_tables

    spark = get_spark("bench-er-sketch")
    out: dict = {"k": MG_K}

    def _uncapped(s, sf):
        return fuzzy_blocked_pairs(
            load_tables(s, sf, ("part",))["part"], cap=None)

    for name, fn, scales in (
            ("fuzzy_blocked_uncapped", _uncapped, PART_SCALES),
            ("fuzzy_blocked_capped", q_fuzzy_match, PART_SCALES_GUARDED),
            ("fuzzy_sorted", q_fuzzy_sorted, PART_SCALES_GUARDED)):
        res = {}
        prev = None
        for tag, sf in scales:
            if not os.path.isdir(sf):
                print(f"skip {tag}: {sf} missing"); continue
            t0 = time.monotonic()
            rows = fn(spark, sf).collect()
            wall = round(time.monotonic() - t0, 3)
            release_build_artifacts()
            res[tag] = {"wall_s": wall,
                        "n_pairs": int(sum(r["n_pairs"] for r in rows))}
            if prev is not None:
                res[f"alpha_{prev[0]}_{tag}"] = _alpha(prev[1], wall)
            prev = (tag, wall)
        out[name] = res
        print(name, json.dumps(res))

    mg: dict = {}
    for tag, sf in DOC_SCALES:
        if not os.path.isdir(sf):
            print(f"skip {tag}: {sf} missing"); continue
        toks = (fan_out(_docs(spark, sf), spark)
                .select(F.explode(F.split(_norm_col(), " ")).alias("term"))
                .filter(F.length("term") > 0))
        t0 = time.monotonic()
        sketch = misra_gries(toks, "term", MG_K).collect()
        wall = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        n_vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c")) \
            .agg(F.count(F.lit(1)).alias("v"),
                 F.sum("c").alias("n")).collect()[0]
        exact_wall = round(time.monotonic() - t0, 3)
        mg[tag] = {"wall_s": wall, "exact_groupby_wall_s": exact_wall,
                   "n_kept": len(sketch), "vocab": int(n_vocab["v"]),
                   "n_tokens": int(n_vocab["n"])}
        print("misra_gries", tag, json.dumps(mg[tag]))
    done = [t for t, _ in DOC_SCALES if t in mg]
    # per-step alphas; the first decade carries Python-worker
    # cold-start (SURVEY finding), so the LAST step is the signal
    for a, b in zip(done, done[1:]):
        mg[f"alpha_{a}_{b}"] = _alpha(mg[a]["wall_s"], mg[b]["wall_s"])
    out["misra_gries"] = mg

    with open(out_name, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_name)


if __name__ == "__main__":
    main()
