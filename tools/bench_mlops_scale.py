"""Scale probe for the round-7 ML-pipeline operators: distributed
PCA, SemDeDup (k-means + within-cluster near-dup), and the
logistic-regression quality classifier.

What each claim predicts, and what this probe measures:

- **PCA** (``pca_fit``): the shuffle ships one (d^2+d+1)-value
  partial per partition regardless of N — wall should be scan-bound
  (alpha ~<= 1 across decades; the small scale is overhead-dominated
  so the measured alpha UNDERestimates only when fixed costs
  dominate, per the round-6 lesson).
- **SemDeDup** (``kmeans_assign`` + ``shard_oversized_clusters`` +
  ``semantic_dedup_within``): with C ~ sqrt(N) centroids the
  assignment is O(N * C) broadcast work and within-cluster pairs are
  bounded by occupancy; the shard cap bounds pair work at N x cap
  even on skewed data. The probe records max occupancy and candidate
  pair counts alongside wall — the numbers that actually decide
  whether the 100 TB pair join blows up (the LSH sign-bucket
  saturation trap was caught by exactly this census, not by wall).
- **Classifier** (``logreg_train``): 6 rounds x 1 aggregation —
  linear in rows, flat in everything else.

Embedding copies in /tmp/sf1 and /tmp/sf10 are PERTURBED
(make_sf_scale.py), so near-dup structure is organic rather than
exact-clone pileup.

Usage: python tools/bench_mlops_scale.py [out=BENCH_mlops_scale.json]
(expects /tmp/sf1, /tmp/sf10 from tools/make_sf_scale.py)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [
    ("2k", "/root/testdata/sf0.1"),
    ("20k", "/tmp/sf1"),
    ("200k", "/tmp/sf10"),
    # 2M vectors / 5M docs: derived 10x from /tmp/sf10 (one-off duckdb
    # chain documented in SURVEY finding #18's update — copy offset
    # 100M clears sf10's id range, perturbation phase +100)
    ("2M", "/tmp/sf100"),
]
DIMS = 64
SHARD_CAP = 500


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_mlops_scale.json"
    from pyspark.sql import functions as F

    from obmp_psql_spark.functions.text import quality_features
    from obmp_psql_spark.operators import pca
    from obmp_psql_spark.operators import similarity as S
    from obmp_psql_spark.operators.cache import (build_artifacts,
                                                 owned_persist)
    from obmp_psql_spark.operators.classifier import logreg_train
    from obmp_psql_spark.session import fan_out, get_spark, load_tables

    spark = get_spark("bench-mlops-scale")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name) \
        if not os.path.isabs(out_name) else out_name
    # BENCH_SCALES=200k,2M runs a subset and MERGES into the existing
    # artifact (long decades can then run in their own process)
    results: dict = {"dims": DIMS, "shard_cap": SHARD_CAP, "scales": {}}
    subset = os.environ.get("BENCH_SCALES")
    if subset and os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
        results.setdefault("scales", {})
    want = set(subset.split(",")) if subset else None

    for tag, sf_dir in SCALES:
        if want is not None and tag not in want:
            continue
        if not os.path.isdir(sf_dir):
            print(f"skip {tag}: {sf_dir} missing", file=sys.stderr)
            continue
        e = fan_out(
            load_tables(spark, sf_dir, ("embeddings",))["embeddings"],
            spark)
        n_vec = e.count()
        row: dict = {"n_vectors": n_vec}

        # --- PCA ------------------------------------------------------
        t0 = time.time()
        _mean, comps, eig = pca.pca_fit(e, "embedding", dims=DIMS,
                                        n_components=2)
        row["pca_fit_s"] = round(time.time() - t0, 3)
        row["pca_top_eigval"] = round(eig[0], 4)

        # --- SemDeDup ---------------------------------------------------
        n_clusters = max(16, int(math.sqrt(n_vec)))
        with build_artifacts():
            t0 = time.time()
            assigned = owned_persist(S.shard_oversized_clusters(
                S.kmeans_assign(e, n_clusters=n_clusters, train_iters=1),
                max_cluster_size=SHARD_CAP))
            occ = (assigned.groupBy("cluster_id")
                   .agg(F.count(F.lit(1)).alias("c"))
                   .agg(F.max("c").alias("mx"),
                        F.sum(F.col("c") * (F.col("c") - 1) / 2)
                        .alias("pairs"),
                        F.count(F.lit(1)).alias("n_blocks")).collect()[0])
            row["semdedup_assign_s"] = round(time.time() - t0, 3)
            row["semdedup_clusters"] = n_clusters
            row["semdedup_blocks"] = int(occ["n_blocks"])
            row["semdedup_max_occupancy"] = int(occ["mx"])
            row["semdedup_candidate_pairs"] = int(occ["pairs"])
            t0 = time.time()
            dropped = (S.semantic_dedup_within(assigned, e, threshold=0.95)
                       .filter(F.col("kept") == 0).count())
            row["semdedup_within_s"] = round(time.time() - t0, 3)
            row["semdedup_dropped"] = int(dropped)

        # --- classifier -------------------------------------------------
        d = fan_out(
            load_tables(spark, sf_dir, ("documents",))["documents"], spark)
        feats = quality_features(F.col("text"))
        base = d.select(
            F.lit(1.0).alias("x0"),
            ((feats["stopword_ratio"] - F.lit(0.06)) * F.lit(16.0))
            .alias("x1"),
            (feats["avg_token_len"] / F.lit(16.0)).alias("x2"),
            (feats["n_tokens"].cast("double") / F.lit(256.0)).alias("x3"))
        base = base.withColumn(
            "label", F.when(F.col("x1") >= 0.0, 1).otherwise(0).cast("int"))
        row["n_docs"] = d.count()
        with build_artifacts():
            t0 = time.time()
            trained = owned_persist(base)
            w = logreg_train(trained, ["x0", "x1", "x2", "x3"], "label",
                             iters=6, lr=8.0)
            row["logreg_train_s"] = round(time.time() - t0, 3)
            z = sum((F.lit(wj) * F.col(c) for wj, c in
                     zip(w[1:], ["x1", "x2", "x3"])),
                    start=F.lit(w[0]) * F.col("x0"))
            acc = (trained.select(
                ((z >= 0).cast("int") == F.col("label")).cast("int")
                .alias("ok")).agg(F.avg("ok")).collect()[0][0])
            row["logreg_train_acc"] = round(float(acc), 4)

        results["scales"][tag] = row
        print(tag, json.dumps(row), flush=True)

    # decade exponents (alpha = log10(t_big/t_small) per decade)
    def alpha(key: str, a: str, b: str):
        sc = results["scales"]
        if a in sc and b in sc and sc[a].get(key) and sc[b].get(key):
            return round(math.log10(sc[b][key] / sc[a][key]), 3)
        return None

    results["alpha"] = {
        "pca_fit_2k_20k": alpha("pca_fit_s", "2k", "20k"),
        "pca_fit_20k_200k": alpha("pca_fit_s", "20k", "200k"),
        "pca_fit_200k_2M": alpha("pca_fit_s", "200k", "2M"),
        "semdedup_within_2k_20k": alpha("semdedup_within_s", "2k", "20k"),
        "semdedup_within_20k_200k": alpha("semdedup_within_s",
                                          "20k", "200k"),
        "semdedup_within_200k_2M": alpha("semdedup_within_s",
                                         "200k", "2M"),
        "semdedup_assign_200k_2M": alpha("semdedup_assign_s",
                                         "200k", "2M"),
        "logreg_2k_20k": alpha("logreg_train_s", "2k", "20k"),
        "logreg_20k_200k": alpha("logreg_train_s", "20k", "200k"),
        "logreg_200k_2M": alpha("logreg_train_s", "200k", "2M"),
    }
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(results["alpha"]))


if __name__ == "__main__":
    main()
