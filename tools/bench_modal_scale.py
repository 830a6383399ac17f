"""Decade-scale probe for the round-8 operators: audio decode, video
frame-sampling, the Gopher rule filter, and BPE training.

What each claim predicts:
- **audio/video** (`audio_features`, `sample_video_frames` +
  channel stats): one Arrow-batched scan with bounded per-doc byte
  work — wall should be ~linear in docs (alpha ~1), no shuffle at
  any scale.
- **gopher rules** (`q_gopher_rules`): pure-expression single scan —
  scan-bound, alpha <= 1.
- **BPE** (`q_bpe_train`): the merge rounds run on the CAPPED vocab
  (corpus-size-independent); only the initial word-frequency agg
  scales — alpha well below 1 is the design claim.

Usage: python tools/bench_modal_scale.py [out.json]
(expects /tmp/sf1, /tmp/sf10 from tools/make_sf_scale.py; skips
missing scales)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [("5k", "/root/testdata/sf0.1"), ("50k", "/tmp/sf1"),
          ("500k", "/tmp/sf10")]
PROBES = ("q_audio_features", "q_video_frames", "q_gopher_rules",
          "q_bpe_train")


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_modal_scale.json"
    from obmp_psql_spark.queries_bmp import _PIPELINE_CACHE
    from obmp_psql_spark.registry import all_specs
    from obmp_psql_spark.session import get_spark

    spark = get_spark("bench-modal-scale")
    specs = all_specs()
    results: dict = {
        "load_before": [round(x, 2) for x in os.getloadavg()],
        "scales": {}, "alpha": {}}

    # warm the Arrow/Python-worker path once so worker cold-start
    # (~1 s/slot) doesn't land inside the smallest scale's number
    specs["q_audio_features"].fn(spark, SCALES[0][1]) \
        .write.format("noop").mode("overwrite").save()

    for tag, sf_dir in SCALES:
        if not os.path.isdir(sf_dir):
            print(f"skip {tag}: {sf_dir} missing", file=sys.stderr)
            continue
        row: dict = {}
        for name in PROBES:
            _PIPELINE_CACHE.clear()  # q_bpe_train memoizes per sf
            t0 = time.time()
            specs[name].fn(spark, sf_dir) \
                .write.format("noop").mode("overwrite").save()
            row[name] = round(time.time() - t0, 3)
        results["scales"][tag] = row
        print(tag, json.dumps(row), flush=True)

    for name in PROBES:
        for a, b in (("5k", "50k"), ("50k", "500k")):
            sc = results["scales"]
            if a in sc and b in sc:
                results["alpha"][f"{name}_{a}_{b}"] = round(
                    math.log10(sc[b][name] / sc[a][name]), 3)

    results["load_after"] = [round(x, 2) for x in os.getloadavg()]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name) \
        if not os.path.isabs(out_name) else out_name
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(results["alpha"]))


if __name__ == "__main__":
    main()
