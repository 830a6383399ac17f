"""LPA decade probe: planted-block graphs at 10x node/edge steps,
run through the SAME capped rounds as q_label_propagation
(queries_curate.lpa_rounds with the cap_in_edges supernode guard).

The gate query's graph derives from events user_ids, whose node count
is fixed — so this probe synthesizes the planted structure directly
from spark.range at growing N (blocks of 50, sparse bridges, ~60 edge
draws per node before distinct), the same shape at every scale. What
scales is edges (~linear in N); degree stays block-bounded, and the
cap binds at 32 everywhere, so linear wall per round is the expected
verdict if the skew guard works.

Writes BENCH_lpa.json: {tag: {nodes, edges_sym, wall_s, n_communities}}
plus per-decade alpha.

Usage: python tools/bench_lpa_scale.py [out.json]
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [(20_000, "20k"), (200_000, "200k"), (2_000_000, "2M")]
BLOCK = 50
DRAWS_PER_NODE = 12   # block degree ~2x12 symmetric, BELOW the cap:
                      # ordinary nodes skip the cap window entirely
CAP = 32
HUBS = 64             # supernodes: in-degree grows ~N/HUBS uncapped
ITERS = 4


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_lpa.json"
    global SCALES
    if os.environ.get("LPA_SCALES"):  # e.g. "20000:20k,200000:200k"
        SCALES = [(int(p.split(":")[0]), p.split(":")[1])
                  for p in os.environ["LPA_SCALES"].split(",")]
    from pyspark.sql import functions as F

    from obmp_psql_spark.queries_curate import lpa_rounds
    from obmp_psql_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("bench-lpa-scale")
    out: dict = {"block": BLOCK, "cap": CAP, "iters": ITERS,
                 "scales": {}}
    prev = None
    for n_nodes, tag in SCALES:
        # node s, draw j: the within-block offset depends on the DRAW
        # index (j*7 cycles all 50 residues; gcd(7,50)=1), not on s's
        # residue class — a modular-aliased offset would give every
        # node one repeated neighbor and no communities at all
        r = spark.range(n_nodes * DRAWS_PER_NODE).select(
            F.expr(f"id div {DRAWS_PER_NODE}").cast("long").alias("s"),
            (F.col("id") % DRAWS_PER_NODE).cast("long").alias("j"))
        blk = F.expr(f"s div {BLOCK}")
        intra_dst = (blk * BLOCK
                     + (F.col("s") + F.col("j") * 7 + 1) % BLOCK) \
            .cast("long")
        intra = (r.select(F.col("s").alias("src"),
                          intra_dst.alias("dst"))
                 .filter(F.col("src") != F.col("dst")))
        bridge = (r.filter((F.col("s") + F.col("j")) % 31 == 0)
                  .select(F.col("s").alias("src"),
                          ((F.col("s") + BLOCK) % n_nodes).cast("long")
                          .alias("dst")))
        # the skew the cap exists for: a fixed set of hub supernodes
        # whose raw in-degree grows linearly with N (~N*draws/97/HUBS
        # in-edges each); without the cap their vote partitions and
        # join fan-in would grow unboundedly with corpus size
        hubs = (r.filter((F.col("s") + F.col("j")) % 97 == 0)
                .select(F.col("s").alias("src"),
                        (F.col("s") * 7 % HUBS).cast("long")
                        .alias("dst"))
                .filter(F.col("src") != F.col("dst")))
        # size the shuffle to the edge volume (the 2M scale OOMs the
        # 32-partition hash aggregate at default memory)
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(max(32, n_nodes // 10000)))
        raw = intra.union(bridge).union(hubs).distinct()
        sym = raw.union(raw.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"))) \
            .distinct().localCheckpoint()
        n_edges = sym.count()
        t0 = time.monotonic()
        labels = lpa_rounds(sym, ITERS, cap=CAP)
        n_comm = labels.select("community").distinct().count()
        wall = round(time.monotonic() - t0, 3)
        max_deg = sym.groupBy("dst").count() \
            .agg(F.max("count")).collect()[0][0]
        rec = {"nodes": n_nodes, "edges_sym": n_edges,
               "max_in_degree": int(max_deg),
               "wall_s": wall, "n_communities": n_comm}
        if prev:
            rec["alpha_vs_prev"] = round(
                math.log(wall / prev["wall_s"])
                / math.log(n_edges / prev["edges_sym"]), 3)
        out["scales"][tag] = rec
        prev = rec
        print(tag, rec, flush=True)
    path = os.path.join("/root/repo", os.path.basename(out_name))
    if os.path.exists(path):  # merge partial runs (LPA_SCALES subsets)
        try:
            with open(path) as fh:
                old = json.load(fh)
            if old.get("cap") == CAP and old.get("block") == BLOCK:
                out["scales"] = {**old.get("scales", {}), **out["scales"]}
        except Exception:
            pass
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
