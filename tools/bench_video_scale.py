"""Video near-dup decade probe (round-11, verdict #2): finding 31's
10x re-probe covered image and audio; this extends it to the one
operator whose join unit is FRAME pairs, not fingerprints —
``frameset_neardup_pairs``.

Same shape as BENCH_image_scale.json: at each scale build the
q_video_neardup corpus (4-frame noise videos + exact copies every 3rd
doc + frame-0-patched clones every 5th, through the REAL frame
splitter and per-frame dHash), then measure

- n_fp:          frame fingerprint count (the band join's row unit)
- n_videos:      distinct video count
- true_pairs:    uncapped ground truth at minimum pigeonhole banding
                 (finding 34: bands = max_hamming+1 is lossless)
- cap_auto:      the occupancy-adaptive cap value at this scale
                 (census = FRAME fingerprints, the unit buckets hold)
- kept_fixed4 / kept_auto: video pairs surviving each cap policy at
                 the 7-band geometry
- planted_recall_*_ppm: recall over the PLANTED clone pairs (id diff
                 100000 / 200000) — the quality contract; accidental
                 collisions live in the dense clusters a skew cap
                 exists to chop
- wall_auto_s:   end-to-end wall of the auto-capped production path

Usage: python tools/bench_video_scale.py [out.json]
(expects /tmp/sf1 from tools/make_sf_scale.py; skips missing scales)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/sf1")]


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_video_scale.json"
    from pyspark.sql import functions as F

    from obmp_psql_spark.operators.dedup import (
        auto_cap_value,
        frameset_neardup_pairs,
    )
    from obmp_psql_spark.queries_text import _video_fingerprints
    from obmp_psql_spark.session import get_spark

    spark = get_spark("bench-video-scale")
    results: dict = {
        "load_before": [round(x, 2) for x in os.getloadavg()],
        "scales": {}}

    for tag, sf_dir in SCALES:
        if not os.path.isdir(sf_dir):
            print(f"skip {tag}: {sf_dir} missing", file=sys.stderr)
            continue
        fp = _video_fingerprints(spark, sf_dir) \
            .select("vid_id", "frame_index", "dhash").persist()
        n_fp = fp.count()
        n_vid = fp.select("vid_id").distinct().count()
        cap_auto = auto_cap_value(n_fp, 63, 7)
        planted = F.col("id_b") - F.col("id_a")
        is_planted = planted.isin(100000, 200000)

        def counts(pairs):
            row = pairs.agg(
                F.count(F.lit(1)).alias("all"),
                F.sum(F.when(is_planted, 1).otherwise(0)).alias("pl")
            ).collect()[0]
            return int(row["all"]), int(row["pl"] or 0)

        # ground truth: minimum pigeonhole banding, uncapped (lossless)
        true_pairs, true_planted = counts(frameset_neardup_pairs(
            fp, "vid_id", "frame_index", "dhash",
            bits=60, bands=4, max_hamming=3, max_bucket_size=None))
        kw = dict(bits=63, bands=7, max_hamming=3)
        kept_fixed, planted_fixed = counts(frameset_neardup_pairs(
            fp, "vid_id", "frame_index", "dhash",
            max_bucket_size=4, **kw))
        t0 = time.time()
        kept_auto, planted_auto = counts(frameset_neardup_pairs(
            fp, "vid_id", "frame_index", "dhash",
            max_bucket_size="auto", **kw))
        wall_auto = time.time() - t0
        fp.unpersist()
        results["scales"][tag] = {
            "n_fp": n_fp,
            "n_videos": n_vid,
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
