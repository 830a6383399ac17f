"""Registry rotation mechanics: the generated staleness map must order
the driver's sampled prefix correctly — overdue gate pipelines (driver
row >= 2 rounds old) forced to the very front, then never-proven
queries, then stalest driver rows, with gate pipelines otherwise only
jumping the queue inside the freshest cohort."""

from __future__ import annotations

import json
import subprocess
import sys


def test_rotating_registry_capped():
    """Worst-case driver-row staleness is ceil(N/50) rounds under the
    staleness-ascending sort; N <= 150 keeps it at <= 3 rounds. Adding
    a query past the cap requires consolidating a redundant one first
    (round-9 policy; see registry.MAX_ROTATING)."""
    from obmp_psql_spark.registry import MAX_ROTATING, all_specs

    specs = all_specs()
    rotating = [n for n, s in specs.items() if s.rotate]
    assert len(rotating) <= MAX_ROTATING, (
        f"{len(rotating)} rotating queries > cap {MAX_ROTATING}: "
        "consolidate a redundant gate before registering a new one")
    # non-rotating entries are allowed only for rows-only originals
    # whose evidence is a hash-gated companion; they must have no oracle
    for n, s in specs.items():
        if not s.rotate:
            assert s.oracle is None, f"{n}: rotate=False requires oracle=None"


def test_registry_orders_by_staleness():
    from obmp_psql_spark._rotation import LAST_DRIVER_ROW
    from obmp_psql_spark.registry import _GATE_PRIORITY, all_specs

    specs = all_specs()
    names = [n for n, s in specs.items() if s.rotate]
    # rotate=False entries all sort after every rotating entry
    assert list(specs)[:len(names)] == names
    max_round = max(LAST_DRIVER_ROW.values())
    # hard bound: every gate pipeline whose row is >= 2 rounds old is
    # at the very front of the registry (inside any driver prefix)
    overdue = [n for n in _GATE_PRIORITY
               if 0 < LAST_DRIVER_ROW.get(n, 0) <= max_round - 2]
    assert set(names[:len(overdue)]) == set(overdue)
    rest = names[len(overdue):]
    rounds = [LAST_DRIVER_ROW.get(n, 0) for n in rest]
    # staleness is non-decreasing through the rest of the registry
    assert rounds == sorted(rounds), \
        "registry not ordered by last-driver-row round"
    # never-proven queries (new this round) lead the non-overdue part
    fresh_new = [n for n in rest if n not in LAST_DRIVER_ROW]
    assert rest[:len(fresh_new)] == fresh_new
    # inside the freshest cohort, gate pipelines come first, in order
    cohort = [n for n in rest if LAST_DRIVER_ROW.get(n, 0) == max_round]
    gates_in_cohort = [n for n in _GATE_PRIORITY if n in cohort]
    assert cohort[:len(gates_in_cohort)] == gates_in_cohort


def test_update_rotation_tool_compiles_green_rows(tmp_path):
    """The generator counts hash-green rows and rows-only executions,
    ignores failures, and keeps the max round per query."""
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "q_a": {"hash_match": True, "err": None, "spark_rows": 5},
        "q_b": {"hash_match": False, "err": "boom", "spark_rows": 0},
        "q_c": {"hash_match": None, "err": "no_oracle", "spark_rows": 9},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "q_a": {"hash_match": False, "err": "regressed", "spark_rows": 5},
        "q_b": {"hash_match": True, "err": None, "spark_rows": 3},
    }))
    # run the tool against the fixture dir by copying it there (it
    # resolves the repo root relative to its own location: tools/..)
    import shutil
    (tmp_path / "tools").mkdir()
    tool = shutil.copy("tools/update_rotation.py",
                       tmp_path / "tools" / "update_rotation.py")
    (tmp_path / "obmp_psql_spark").mkdir()
    out = subprocess.run([sys.executable, str(tool)], cwd=tmp_path,
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    ns: dict = {}
    exec((tmp_path / "obmp_psql_spark" / "_rotation.py").read_text(), ns)
    got = ns["LAST_DRIVER_ROW"]
    # q_a green in r1 only (r2 failed -> keeps r1); q_b green in r2;
    # q_c rows-only counts as a driver row
    assert got == {"q_a": 1, "q_b": 2, "q_c": 1}
