"""Streaming FRAMESET-index probe (round 11): the video twin of
tools/bench_stream_index.py, for the operator added this round.

Drives the q_video_neardup corpus (per-frame dHash fingerprints at
sf0.1) through ``incremental_frameset_pairs`` in NBATCH micro-batches
split at VIDEO granularity (frames ride with their video — the
operator's delivery contract), measuring per batch:

- wall seconds (band new frames, join vs persisted frame index,
  hamming-verify, per-pair aggregate, commit)
- bands-table parquet file count / bytes (the append pile-up the auto
  OPTIMIZE cadence bounds)

and at the end verifies the accumulated pairs table equals the
batch-built ``frameset_neardup_pairs`` output (the same equality the
q_stream_video_dedup gate hash-pins at sf0.01, here re-checked at
sf0.1 under the default auto cadence), plus a replay no-op.

Usage: python tools/bench_stream_frameset.py [out.json] [nbatch=10]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dir_stats(root: str, table: str) -> tuple[int, int]:
    files = [f for f in glob.glob(os.path.join(root, "**", "*.parquet"),
                                  recursive=True) if f"/{table}/" in f
             or os.path.basename(os.path.dirname(f)).startswith(table)]
    return len(files), sum(os.path.getsize(f) for f in files)


def main() -> None:
    out_name = sys.argv[1] if len(sys.argv) > 1 else \
        "BENCH_stream_frameset.json"
    nbatch = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from pyspark.sql import functions as F

    from obmp_psql_spark.operators.dedup import (
        frameset_neardup_pairs,
        incremental_frameset_pairs,
    )
    from obmp_psql_spark.queries_text import _video_fingerprints
    from obmp_psql_spark.session import get_spark
    from obmp_psql_spark.state import TxnStateStore

    spark = get_spark("bench-stream-frameset")
    fp = _video_fingerprints(spark, "/root/testdata/sf0.1") \
        .select("vid_id", "frame_index", "dhash").persist()
    n_fp = fp.count()
    n_vid = fp.select("vid_id").distinct().count()

    root = tempfile.mkdtemp(prefix="streamfs_")
    store = TxnStateStore(spark, root)
    # the production shape: auto cap + default auto OPTIMIZE cadence
    kw = dict(bits=63, bands=7, max_hamming=3, max_bucket_size="auto")
    batches = []
    for b in range(nbatch):
        part = fp.filter(F.pmod(F.xxhash64("vid_id"), nbatch) == b).persist()
        part.count()
        batches.append(part)

    results: dict = {
        "load_before": [round(x, 2) for x in os.getloadavg()],
        "n_fp": n_fp, "n_videos": n_vid, "nbatch": nbatch, "batches": []}
    for b, part in enumerate(batches):
        t0 = time.time()
        incremental_frameset_pairs(store, part, "vid_id", "frame_index",
                                   "dhash", batch_id=b, **kw)
        wall = time.time() - t0
        nfiles, nbytes = _dir_stats(root, "vid_bands")
        results["batches"].append({
            "batch": b, "wall_s": round(wall, 2),
            "bands_files": nfiles, "bands_bytes": nbytes})
        print(results["batches"][-1], flush=True)

    # equality vs the batch-built operator under the SAME auto cap:
    # the incremental cap is measured against a growing index, so the
    # accumulated capped set is a subset; equality is exact for the
    # final-census batch semantics only when uncapped — check both.
    inc_pairs = {(r.id_a, r.id_b) for r in
                 store.read("vid_pairs").select("id_a", "id_b").collect()}
    exact = {(r.id_a, r.id_b) for r in frameset_neardup_pairs(
        fp, "vid_id", "frame_index", "dhash", bits=60, bands=4,
        max_hamming=3, max_bucket_size=None)
        .select("id_a", "id_b").collect()}
    results["pairs_accumulated"] = len(inc_pairs)
    results["pairs_exact_uncapped"] = len(exact)
    results["accumulated_subset_of_exact"] = inc_pairs <= exact
    results["recall_vs_exact_ppm"] = \
        len(inc_pairs & exact) * 1_000_000 // max(len(exact), 1)

    # replay no-op after the run (auto cadence may have compacted)
    before = store.read("vid_pairs").count()
    incremental_frameset_pairs(store, batches[3], "vid_id", "frame_index",
                               "dhash", batch_id=3, **kw)
    results["replay_noop"] = store.read("vid_pairs").count() == before

    for part in batches:
        part.unpersist()
    fp.unpersist()

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name)
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
