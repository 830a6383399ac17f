"""Every registered query with an oracle must hash-match DuckDB on
sf0.001 (fast) — the same check the driver runs at sf0.01."""

from __future__ import annotations

import os

import pytest

from obmp_psql_spark.registry import all_specs

SF = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, name):
    from .oracle_util import compare

    spec = SPECS[name]
    df = spec.fn(spark, SF)
    assert df is not None
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    ok, msg = compare(df, spec.oracle_for(SF), SF)
    assert ok, f"{name}: {msg}"
