"""Second-decade ANN scaling probe: 2k -> 20k -> 200k vectors.

Round 6's BENCH_sf1_ann.json measured one decade (2k -> 20k) and
derived three sizing policies; this probe adds the 200k decade so
each policy becomes a measured CURVE instead of a one-decade line:

- LSH: n_planes ~ log2(N) keeps per-bucket density constant (8 ->
  12 -> 16 planes); the probe also runs one notch UNDER-scaled at
  each big size to show the density penalty the policy avoids.
- IVF: sqrt-N centroid count (16 -> 50 -> 158) keeps
  per-inverted-list scan cost flat, total sub-linear.
- PQ: fixed codebook (m=8, n_codes=16). Through 20k the wall is
  flat (fixed plan/JIT overhead dominates); at 200k the linear
  corpus-encode component becomes visible — the claim that stays is
  that the SEARCH scan reads m-byte codes, never raw vectors, and
  training cost is amortized over the index lifetime.

All runs are single cold builds (build_artifacts released between),
operators called directly so index parameters scale with N as a
deployment's would — same methodology as round 6.

Usage: python tools/bench_ann_scale.py [out=BENCH_sf10_ann.json]
(expects /tmp/sf1, /tmp/sf10 from tools/make_sf_scale.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [
    ("2k", "/root/testdata/sf0.1"),
    ("20k", "/tmp/sf1"),
    ("200k", "/tmp/sf10"),
]
LSH_PLANES = {"2k": 8, "20k": 12, "200k": 16}  # ~log2(N)
IVF_CENTROIDS = {"2k": 16, "20k": 50, "200k": 158}  # ~sqrt(N)


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf10_ann.json"
    from obmp_psql_spark.operators import similarity as S
    from obmp_psql_spark.operators.cache import (build_artifacts,
                                                 release_build_artifacts)
    from obmp_psql_spark.session import get_spark

    spark = get_spark("bench-ann-scale")
    spark.range(10000).selectExpr("id % 7 k").groupBy("k").count() \
        .write.format("noop").mode("overwrite").save()

    def vecs(sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
            .select("vec_id", "embedding")

    def timed(label, probes, build):
        t0 = time.perf_counter()
        with build_artifacts():
            build().write.format("noop").mode("overwrite").save()
        release_build_artifacts()
        w = round(time.perf_counter() - t0, 2)
        probes[label] = w
        print(f"{label}: {w}s", flush=True)

    results: dict[str, dict] = {}
    for tag, sf_dir in SCALES:
        v = vecs(sf_dir)
        r: dict = {}
        planes = LSH_PLANES[tag]
        timed(f"lsh {planes} planes", r,
              lambda: S.lsh_topk(v, dims=64, n_planes=planes, k=5))
        if tag != "2k":  # one notch under-scaled: the density penalty
            timed(f"lsh {planes - 4} planes (under-scaled)", r,
                  lambda: S.lsh_topk(v, dims=64, n_planes=planes - 4, k=5))
        cents = IVF_CENTROIDS[tag]
        timed(f"ivf {cents} centroids", r,
              lambda: S.ivf_topk(v, n_centroids=cents, nprobe=3, k=5,
                                 train_iters=1))
        timed("pq m=8 n_codes=16", r,
              lambda: S.pq_topk(v, m=8, n_codes=16, k=5, train_iters=2,
                                max_queries=50))
        results[tag] = r

    out = {
        "metric": "ann_two_decade_scaling",
        "probes": results,
        "note": "single cold runs on local[32]; 2k/20k/200k vectors of "
                "64 dims (make_sf_scale copies); LSH planes ~log2(N), "
                "IVF centroids ~sqrt(N), PQ codebook fixed; "
                "'under-scaled' rows show the cost the sizing policy "
                "avoids",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: v for k, v in results.items()}))


if __name__ == "__main__":
    main()
