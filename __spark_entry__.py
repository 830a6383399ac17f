"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (and the training-data pipeline ops); ``oracle_sql()``
gives the DuckDB-equivalent SQL for hash comparison. Implementations
live in the ``obmp_psql_spark`` package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from obmp_psql_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the J1 engine path since round 9 (the standalone
    q_rib_summary TPC-H shape was consolidated into it): v_ip_routes
    over state built through the real ingest merges."""
    from obmp_psql_spark.queries_bmp import q_bmp_view_routes

    return q_bmp_view_routes(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle per query (omitted => rows-only check)."""
    return registry.oracle_sql()
