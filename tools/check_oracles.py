"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and the
matching ``oracle_sql()`` string on DuckDB at the same scale factor, then
compares row count, schema (sorted column names), and a value hash over
columns sorted by name — the same comparison shape the per-round driver
records in ``CORRECTNESS_r{N}.json``. Queries without an oracle entry get
a rows-only check (``rows>=0``), mirroring the driver's weaker gate.

Usage::

    python tools/check_oracles.py [sf_dir] [only_query ...]

Defaults to ``/root/testdata/sf0.01``. Exits non-zero on any MISMATCH/ERR.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    """Normalize a cell for hashing: floats rounded, NaN/None unified."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        # 12 significant digits, not 6: gate queries round to 4 decimal
        # places, so at magnitude >=1e3 a 6-sig-digit collapse could
        # hash-match values the driver's comparison would distinguish.
        # 12 still absorbs last-ulp noise the registry's DECIMAL
        # accumulation convention is designed to avoid anyway.
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry  # noqa: F401 (driver-contract import)
    from obmp_psql_spark.registry import all_specs
    from obmp_psql_spark.session import get_spark

    spark = get_spark()
    specs = all_specs()
    qs = {n: s.fn for n, s in specs.items()}
    # resolve sf-dependent oracles (recall handoff paths) at THIS sf,
    # exactly as the parity tests do; at the driver's sf0.01 this
    # matches the static oracle_sql() contract strings
    oracles = {n: s.oracle_for(sf_dir) for n, s in specs.items()
               if s.oracle is not None}

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name} ERR spark: {e}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name} ROWS-ONLY {len(rows)}")
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name} ERR oracle: {e}")
            failures.append(name)
            continue
        if sorted(cols) != sorted(ocols):
            print(f"{name} MISMATCH schema spark={sorted(cols)} oracle={sorted(ocols)}")
            failures.append(name)
            continue
        if len(rows) != len(orows):
            print(f"{name} MISMATCH rows spark={len(rows)} oracle={len(orows)}")
            failures.append(name)
            continue
        if _hash_rows(cols, rows) != _hash_rows(ocols, orows):
            print(f"{name} MISMATCH hash ({len(rows)} rows)")
            failures.append(name)
            continue
        print(f"{name} MATCH {len(rows)}")

    print(f"\n{n_run - len(failures)}/{n_run} ok; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
