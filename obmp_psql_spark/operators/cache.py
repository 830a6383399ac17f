"""Lifecycle tracking for build-once persisted artifacts.

Several operators persist an intermediate that feeds multiple
consumers of the returned (lazy) plan — the MinHash band table, the
n-gram posting lists, the SimHash fingerprint table, the LSH bucket
table, the IVF assignment. The persist must stay in the lazy plan
(the build-once artifact is the point, and ``test_scale_plans``
pins the resulting InMemoryTableScan), so the operator itself cannot
unpersist before returning: the caller owns the lifetime.

In run-once contexts (the correctness driver, one bench query) the
process exits and nothing leaks. In a long-running service, use
either::

    with build_artifacts():
        pairs = minhash_lsh_pairs(docs, "doc_id", "text")
        pairs.write.parquet(out)        # consume INSIDE the scope
    # all persisted blocks created by the operator are now released

or the explicit form::

    pairs = minhash_lsh_pairs(docs, "doc_id", "text")
    pairs.write.parquet(out)
    release_build_artifacts()

Releasing before the returned plan is consumed is safe (Spark
recomputes), it just forfeits the build-once saving.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

# Persisted handles created by operators, in creation order. Process-wide
# (matches Spark's JVM-wide CacheManager); a driver thread pool sharing
# one session should scope with build_artifacts() per task.
_ACTIVE: list[DataFrame] = []


def owned_persist(df: DataFrame) -> DataFrame:
    """persist() a build-once intermediate and track the handle so
    ``release_build_artifacts`` / ``build_artifacts`` can free it."""
    handle = df.persist()
    _ACTIVE.append(handle)
    return handle


def release_build_artifacts(blocking: bool = False) -> int:
    """Unpersist every tracked artifact; returns how many were freed."""
    n = 0
    while _ACTIVE:
        _ACTIVE.pop().unpersist(blocking)
        n += 1
    return n


@contextmanager
def build_artifacts(blocking: bool = False):
    """Scope the persisted artifacts created inside: on exit, every
    artifact registered since entry is unpersisted (exception-safe)."""
    mark = len(_ACTIVE)
    try:
        yield
    finally:
        while len(_ACTIVE) > mark:
            _ACTIVE.pop().unpersist(blocking)
