"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 is demonstrated here as a
named query over the driver-generated tables (region nation customer
supplier part orders lineitem events documents embeddings), paired
with an ANSI-SQL oracle that DuckDB runs on the same parquet.

Conventions that keep the Spark result and the DuckDB oracle
hash-identical:
- every computed column is aliased the same on both sides;
- monetary / double aggregates accumulate in exact DECIMAL and are
  cast to DOUBLE once at the end (SUM over doubles is
  order-dependent; DECIMAL accumulation is exact and associative, so
  both engines produce the bit-identical double);
- integer sums are cast to BIGINT in the oracle (DuckDB widens to
  HUGEINT by default);
- timestamps stay UTC-naive on both sides (session TZ pinned UTC).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    survey_ref: str = ""  # SURVEY.md §2 operator ids this demonstrates
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, survey_ref: str = "", doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, survey_ref, doc)
        return fn
    return deco


def all_specs() -> dict[str, QuerySpec]:
    # import side-effect modules that register queries
    from . import queries_bmp  # noqa: F401
    from . import queries_core  # noqa: F401
    from . import queries_net  # noqa: F401
    from . import queries_stream  # noqa: F401
    from . import queries_text  # noqa: F401
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
