"""Deterministic sampling operators for training-data pipelines.

Dataset mixing ("20% of web crawl, 80% of curated sources") must be
reproducible across reruns and engines, so sampling is keyed on a
HASH of a stable id, not on an RNG: a row is in the sample iff
``h(key) mod M < rate * M``. Properties that matter at 100 TB:

- no shuffle, no state: a pure projection+filter, fully pushed into
  the scan stage (whole-stage codegen, partition-local);
- stable under retries/re-partitioning (Spark's ``sample()`` is
  seed-stable only per-partition-layout, which reshuffles break);
- consistent across engines: md5 is bit-identical everywhere, so
  the same predicate selects the same rows in Spark and DuckDB.

The salt namespaces the decision: independent sampling passes use
different salts, correlated passes (train/holdout splits that must
not overlap) use one salt with disjoint bucket ranges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = 10_000  # bucket modulus: rate resolution 0.01%


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000) from the md5 of the key
    (first 8 hex chars -> int). Engine-portable: DuckDB equivalent is
    ``CAST(('0x' || substr(md5(salt || key), 1, 8)) AS BIGINT) % 10000``."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _M)


def sample_deterministic(df: DataFrame, key: str, rate: float,
                         salt: str = "") -> DataFrame:
    """Keep ~``rate`` of rows, decided by ``hash_bucket(key)``."""
    return df.filter(hash_bucket(F.col(key), salt) < int(rate * _M))


def stratified_sample(df: DataFrame, strata: str, key: str,
                      rates: dict[str, float],
                      default_rate: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling — the dataset-mixing
    primitive: ``rates`` maps stratum value -> keep fraction; strata
    not listed keep ``default_rate``. Plan: one CASE expression over
    a broadcast-free filter; no shuffle, no UDF."""
    rate_col = F.lit(int(default_rate * _M))
    for value, rate in sorted(rates.items()):
        rate_col = F.when(F.col(strata) == value,
                          F.lit(int(rate * _M))).otherwise(rate_col)
    return df.filter(hash_bucket(F.col(key), salt) < rate_col)
