"""Streaming fingerprint-index decade probe (round-10, verdict task 5).

`incremental_fingerprint_pairs` is correctness-gated at two batches
(q_stream_image_dedup); finding 29 established that UNCOMPACTED APPENDS,
not replay, are what tax commit-log reads. This probe drives a decade of
micro-batches through the incremental path and measures, per batch:

- wall seconds (band new rows, join vs persisted index, verify, commit)
- bands-table parquet file count and byte size (the append pile-up)

then re-runs the tail batch after an OPTIMIZE of the bands table to
measure what compaction buys, giving the cadence number the finding-22/29
law predicts: per-batch wall grows with FILE COUNT (driver listing +
task scheduling per tiny file), not with row count, so OPTIMIZE every
~K appends keeps the join's scan side flat. K = where the measured
per-batch wall crosses ~1.3x its compacted floor.

Corpus: the q_image_neardup noise-image construction at sf0.1 split
into NBATCH equal hash-slices, so every batch carries fresh
fingerprints plus clone pairs against earlier batches (the realistic
shape: each arriving batch matches mostly against the index).

Usage: python tools/bench_stream_index.py [out.json] [nbatch=10]
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
    out_name = sys.argv[1] if len(sys.argv) > 1 else "BENCH_stream_index.json"
    nbatch = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from pyspark.sql import functions as F

    from obmp_psql_spark.operators.dedup import incremental_fingerprint_pairs
    from obmp_psql_spark.queries_text import _image_fingerprints
    from obmp_psql_spark.session import get_spark
    from obmp_psql_spark.state import TxnStateStore

    spark = get_spark("bench-stream-index")
    fp = _image_fingerprints(spark, "/root/testdata/sf0.1") \
        .select("img_id", "dhash").persist()
    n = fp.count()

    root = tempfile.mkdtemp(prefix="streamidx_")
    store = TxnStateStore(spark, root)
    kw = dict(bits=63, bands=7, max_hamming=3, max_bucket_size="auto")
    batches = []
    for b in range(nbatch):
        part = fp.filter(F.pmod(F.xxhash64("img_id"), nbatch) == b).persist()
        part.count()
        batches.append(part)

    results: dict = {
        "load_before": [round(x, 2) for x in os.getloadavg()],
        "n_fp": n, "nbatch": nbatch, "batches": []}
    # baseline pass: compaction explicitly OFF — the uncompacted
    # append pile-up this probe exists to measure (optimize_every
    # defaults to "auto" since round 11, so off needs asking for)
    for b, part in enumerate(batches):
        t0 = time.time()
        incremental_fingerprint_pairs(store, part, "img_id", "dhash",
                                      batch_id=b, optimize_every=None,
                                      **kw)
        wall = time.time() - t0
        nfiles, nbytes = _dir_stats(root, "img_bands")
        results["batches"].append({
            "batch": b, "wall_s": round(wall, 2),
            "bands_files": nfiles, "bands_bytes": nbytes})
        print(results["batches"][-1], flush=True)

    pairs_10 = store.read("img_pairs").count()  # before the extra batch

    # compaction effect: OPTIMIZE the bands table, replay-style extra
    # batch (re-deliver the last slice under a NEW batch id so the work
    # shape matches a steady-state batch against a compacted index)
    t0 = time.time()
    store.optimize("img_bands")
    opt_wall = time.time() - t0
    nfiles, nbytes = _dir_stats(root, "img_bands")
    t0 = time.time()
    incremental_fingerprint_pairs(store, batches[-1], "img_id", "dhash",
                                  batch_id=nbatch, optimize_every=None,
                                  **kw)
    post_wall = time.time() - t0
    results["optimize"] = {
        "optimize_wall_s": round(opt_wall, 2),
        "bands_files_after": nfiles, "bands_bytes_after": nbytes,
        "postopt_batch_wall_s": round(post_wall, 2)}
    pairs = store.read("img_pairs").count()
    results["total_pairs"] = pairs

    # second pass: the operator's own cadence knob (optimize_every=3,
    # finding 32) — per-batch walls should stay near the compacted
    # floor instead of climbing with the append pile-up
    root2 = tempfile.mkdtemp(prefix="streamidx_opt_")
    store2 = TxnStateStore(spark, root2)
    cadenced = []
    for b, part in enumerate(batches):
        t0 = time.time()
        incremental_fingerprint_pairs(store2, part, "img_id", "dhash",
                                      batch_id=b, optimize_every=3, **kw)
        cadenced.append(round(time.time() - t0, 2))
    nfiles2, _ = _dir_stats(root2, "img_bands")
    results["cadenced"] = {
        "optimize_every": 3, "walls_s": cadenced,
        "bands_files_final": nfiles2,
        "pairs_equal": store2.read("img_pairs").count() == pairs_10}
    print(results["cadenced"], flush=True)

    # third pass: the round-11 DEFAULT ("auto" — compact when live
    # band files exceed 3x shuffle partitions). The plain call with no
    # cadence argument should now self-compact: walls near the
    # cadenced floor, file count bounded, identical pairs.
    root3 = tempfile.mkdtemp(prefix="streamidx_auto_")
    store3 = TxnStateStore(spark, root3)
    auto_walls = []
    for b, part in enumerate(batches):
        t0 = time.time()
        incremental_fingerprint_pairs(store3, part, "img_id", "dhash",
                                      batch_id=b, **kw)
        auto_walls.append(round(time.time() - t0, 2))
    nfiles3, _ = _dir_stats(root3, "img_bands")
    results["auto_default"] = {
        "walls_s": auto_walls,
        "bands_files_final": nfiles3,
        "pairs_equal": store3.read("img_pairs").count() == pairs_10}
    print(results["auto_default"], flush=True)

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
