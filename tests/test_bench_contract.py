"""Bench stdout/artifact contract (r14 verdict #1 and #2).

Round 14 regression: the compact stdout line inlined the full
`headlines`/`heavy_idle` draw provenance, the 1700-char budget went
negative, and the driver received `"queries":{}` — PERF_r14 lost its
per-query table and scaling block. These tests pin the restored
contract: per-query walls get the budget, provenance stays file-only,
and the no-clobber guard keys on (git_head, cpus, sf).

No Spark session needed — pure harness logic.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _fake_out(n_queries: int = 153) -> dict:
    """A full-record dict shaped like a real BENCH_LOCAL file."""
    timings = {f"q_some_longish_query_name_{i:03d}": round(0.3 + i * 0.05, 3)
               for i in range(n_queries)}
    draw = {"wall_s": 1.0, "cpu_s": 8.0, "load_at_draw": 1.8,
            "qualified": True, "draws": [{"wall_s": 2.0}] * 3}
    return {
        "git_head": "a" * 40,
        "cpus": 32,
        "metric": "bench_total_wall",
        "value": 228.7,
        "total_is_first_pass_only": True,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "load_before": [1.7, 5.9, 5.1],
        "load_after": [12.4, 8.2, 6.5],
        "headline_load_reruns": 0,
        "idle_waited_s": 150,
        "redraw_waited_s": 150,
        "stream_redraw_foreign_load": False,
        "headlines": {f"q_bmp_h{i}": dict(draw) for i in range(3)},
        "heavy_idle": {f"q_heavy{i}": dict(draw) for i in range(5)},
        "cpu_source": "cgroup:/sys/fs/cgroup/unified/cpu.stat",
        "query_meta": {n: {"load_at_draw": 2.0, "cpu_s": 3.0}
                       for n in timings},
        "min_of_n_queries": ["q_bmp_h0", "q_bmp_h1", "q_bmp_h2"],
        "min_of_n": 3,
        "timings_cold": {"q_bmp_h0": 5.2, "q_bmp_h1": 3.4, "q_bmp_h2": 3.2},
        "headline_cpu_s_per_kmsg": {"q_bmp_h0": 0.076},
        "ingest_rate_msgs_per_sec": 110619,
        "ingest_rate_durable_msgs_per_sec": 56561,
        "ingest_rate_cold_msgs_per_sec": 18957,
        "pass_cpu_drift_vs_prev": 0.895,
        "pass_cpu_drift_alert": False,
        "pass_wall_drift_vs_prev": 0.731,
        "total_raw": 239.058,
        "total_drift_normalized": 327.109,
        "regressions_vs": "BENCH_LOCAL_r13.json",
        "regressions": [{"query": "q_x", "wall_ratio": 1.4},
                        {"query": "q_y", "wall_ratio": 1.35}],
        "full_timings": "BENCH_LOCAL_r15.json",
    }


def test_compact_line_is_dominated_by_queries():
    out = _fake_out()
    compact = bench.build_compact(out)
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= bench.COMPACT_BUDGET
    # the r14 failure mode: an empty queries dict. The line must carry
    # a substantial per-query table (>= 30 entries under the default
    # budget with realistic name lengths), slowest-first.
    assert len(compact["queries"]) >= 30
    walls = sorted(out["queries"].values(), reverse=True)
    expect_slowest = set(walls[:len(compact["queries"])])
    assert set(compact["queries"].values()) == expect_slowest
    # bulky provenance is file-only
    for k in ("headlines", "heavy_idle", "query_meta", "regressions",
              "timings_cold", "load_before"):
        assert k not in compact
    # essential scalars survive
    for k in ("git_head", "cpus", "metric", "value", "unit", "sf",
              "ingest_rate_msgs_per_sec", "total_drift_normalized",
              "full_timings", "cpu_source"):
        assert k in compact
    assert compact["n_regressions"] == 2


def test_compact_line_small_registry_fits_everything():
    out = _fake_out(n_queries=5)
    compact = bench.build_compact(out)
    assert compact["queries"] == out["queries"]
    assert len(json.dumps(compact, separators=(",", ":"))) \
        <= bench.COMPACT_BUDGET


def test_compact_budget_never_negative_on_fat_scalars():
    # even with an absurdly long scalar field the builder sheds
    # non-contract scalars rather than starving the per-query table
    # (the r14 failure class), and the line stays under budget
    out = _fake_out()
    out["cpu_source"] = "x" * 1600
    compact = bench.build_compact(out)
    assert len(json.dumps(compact, separators=(",", ":"))) \
        <= bench.COMPACT_BUDGET
    assert "cpu_source" not in compact       # fat field shed
    assert len(compact["queries"]) >= 20     # contract survives
    for k in ("git_head", "value", "unit", "sf", "cpus"):
        assert k in compact


def _write_rec(path, head, cpus, sf):
    with open(path, "w") as fh:
        json.dump({"git_head": head, "cpus": cpus, "sf": sf}, fh)


def test_preserve_displaced_keys_on_head_cpus_sf(tmp_path):
    p = str(tmp_path / "BENCH_LOCAL_r15.json")

    # same (head, cpus, sf): overwrite in place, no archive
    _write_rec(p, "h1", 32, 0.1)
    bench.preserve_displaced(p, "h1", 32, 0.1)
    assert os.path.exists(p) and not os.listdir(tmp_path)[1:]

    # same head, DIFFERENT cpus: preserved (the r14 clobber case)
    bench.preserve_displaced(p, "h1", 8, 0.1)
    assert not os.path.exists(p)
    assert os.path.exists(p + ".h1.c32.prev")

    # different head: preserved with head tag
    _write_rec(p, "h2", 32, 0.1)
    bench.preserve_displaced(p, "h3", 32, 0.1)
    assert os.path.exists(p + ".h2.c32.prev")

    # same head, different sf: preserved
    _write_rec(p, "h3", 32, 0.1)
    bench.preserve_displaced(p, "h3", 32, 0.01)
    assert os.path.exists(p + ".h3.c32.prev")

    # tag collision appends a counter instead of overwriting
    _write_rec(p, "h2", 32, 0.1)
    bench.preserve_displaced(p, "h4", 32, 0.1)
    assert os.path.exists(p + ".h2.c32.1.prev")

    # legacy record without a cpus stamp: preserved, head-only tag
    with open(p, "w") as fh:
        json.dump({"git_head": "h5", "sf": 0.1}, fh)
    bench.preserve_displaced(p, "h5", 32, 0.1)
    assert os.path.exists(p + ".h5.prev")
