"""Image near-dup decade probe, round-10 edition: does the
occupancy-adaptive cap (finding 31) hold recall across a 10x corpus
while the wall stays linear?

Round 9 measured the failure (finding 30): a FIXED band-bucket cap of
4 kept 554 true pairs at ~7.7k images but only 201 at ~77k — per-band
occupancy N/2^w grows linearly, so a constant cap starves. The auto
cap max(4, ceil(4N/2^w)) should instead keep recall roughly flat,
because it chops only >4x-expected outlier buckets at every scale.

What this records per scale:
- n_fp:        fingerprint count (corpus + every-3rd copies + every-5th
               patched clones, same construction as q_image_neardup)
- true_pairs:  uncapped banded ground truth (lossless by pigeonhole)
- cap_auto:    the derived cap value
- kept_fixed4 / kept_auto: pairs surviving each policy
- recall_*_ppm: kept/true in ppm
- wall_auto_s: end-to-end wall of the auto-capped production path
               (banding + cap census + join + verify + count)

Usage: python tools/bench_image_scale.py [out.json]
(expects /tmp/sf1 from tools/make_sf_scale.py; skips missing scales)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [("5k", "/root/testdata/sf0.1"), ("50k", "/tmp/sf1")]


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_image_scale.json"
    from obmp_psql_spark.operators.dedup import (
        auto_cap_value,
        fingerprint_neardup_pairs,
    )
    from obmp_psql_spark.queries_text import _image_fingerprints
    from obmp_psql_spark.session import get_spark

    spark = get_spark("bench-image-scale")
    results: dict = {
        "load_before": [round(x, 2) for x in os.getloadavg()],
        "scales": {}}

    for tag, sf_dir in SCALES:
        if not os.path.isdir(sf_dir):
            print(f"skip {tag}: {sf_dir} missing", file=sys.stderr)
            continue
        from pyspark.sql import functions as F
        fp = _image_fingerprints(spark, sf_dir) \
            .select("img_id", "dhash").persist()
        n = fp.count()
        cap_auto = auto_cap_value(n, 63, 7)
        kw = dict(bits=63, bands=7, max_hamming=3)
        # planted clone pairs (copies +100000, patched +200000, and the
        # copy-vs-patched +100000 diff) vs the structured-noise
        # accidental mass: the cap's QUALITY contract is about the
        # planted ones — accidental collisions live in exactly the
        # dense fingerprint clusters a skew cap exists to chop
        planted = F.col("id_b") - F.col("id_a")
        is_planted = planted.isin(100000, 200000)

        def counts(pairs):
            row = pairs.agg(
                F.count(F.lit(1)).alias("all"),
                F.sum(F.when(is_planted, 1).otherwise(0)).alias("pl")
            ).collect()[0]
            return int(row["all"]), int(row["pl"] or 0)

        # ground truth at minimum pigeonhole banding (finding 34):
        # identical pair set to the 7-band join, 64x lower occupancy
        true_pairs, true_planted = counts(fingerprint_neardup_pairs(
            fp, "img_id", "dhash", bits=60, bands=4, max_hamming=3,
            max_bucket_size=None))
        kept_fixed, planted_fixed = counts(fingerprint_neardup_pairs(
            fp, "img_id", "dhash", max_bucket_size=4, **kw))
        t0 = time.time()
        kept_auto, planted_auto = counts(fingerprint_neardup_pairs(
            fp, "img_id", "dhash", max_bucket_size="auto", **kw))
        wall_auto = time.time() - t0
        fp.unpersist()
        results["scales"][tag] = {
            "n_fp": n,
            "true_pairs": true_pairs,
            "true_planted": true_planted,
            "cap_auto": cap_auto,
            "kept_fixed4": kept_fixed,
            "kept_auto": kept_auto,
            "recall_fixed4_ppm": kept_fixed * 1_000_000 // max(true_pairs, 1),
            "recall_auto_ppm": kept_auto * 1_000_000 // max(true_pairs, 1),
            "planted_recall_fixed4_ppm":
                planted_fixed * 1_000_000 // max(true_planted, 1),
            "planted_recall_auto_ppm":
                planted_auto * 1_000_000 // max(true_planted, 1),
            "wall_auto_s": round(wall_auto, 2),
        }
        print(tag, results["scales"][tag], flush=True)

    tags = [t for t, _ in SCALES if t in results["scales"]]
    if len(tags) == 2:
        a, b = (results["scales"][t] for t in tags)
        results["alpha_wall_per_decade"] = round(
            math.log10(max(b["wall_auto_s"], 1e-9)
                       / max(a["wall_auto_s"], 1e-9))
            / math.log10(b["n_fp"] / a["n_fp"]), 3)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name)
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
