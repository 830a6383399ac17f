"""Atomic publication of oracle-handshake handoff dumps.

The handoff path is deterministic (the resolved DuckDB oracle embeds
it), so publication must be atomic: readers may never observe a
half-written dump even with a concurrent run at the same sf.
"""

import os

from obmp_psql_spark.queries_text import publish_aux


def test_publish_is_symlink_swap_and_reaps_old(spark, tmp_path):
    path = str(tmp_path / "handoff")
    df1 = spark.range(5).selectExpr("id AS query_id", "id AS neighbor_id")
    publish_aux(df1, path)
    assert os.path.islink(path)
    assert spark.read.parquet(path).count() == 5

    # re-publish: link swaps to the new version, reader sees it whole
    df2 = spark.range(9).selectExpr("id AS query_id", "id AS neighbor_id")
    publish_aux(df2, path)
    publish_aux(df2, path)
    assert spark.read.parquet(path).count() == 9
    # at most the two newest versions survive (concurrent-reader grace)
    vers = [d for d in os.listdir(tmp_path) if ".v" in d]
    assert len(vers) == 2
    # the link target is relative: the aux tree can be moved wholesale
    assert not os.readlink(path).startswith("/")


def test_publish_replaces_legacy_plain_directory(spark, tmp_path):
    path = str(tmp_path / "handoff")
    df = spark.range(3).selectExpr("id AS query_id", "id AS neighbor_id")
    df.coalesce(1).write.parquet(path)  # pre-symlink layout on disk
    assert not os.path.islink(path)
    publish_aux(df, path)
    assert os.path.islink(path)
    assert spark.read.parquet(path).count() == 3
