"""S5 JDBC sink executed against a REAL embedded database.

The container has no Postgres, but DuckDB speaks the same
``INSERT ... ON CONFLICT (keys) DO UPDATE SET c=excluded.c`` dialect
the reference emits (UnicastPrefixQuery.java:24-41), so the full sink
path — statement generation, batching, per-statement commit, the
PSQLHandler.java:156-224 retry ladder — runs here against a live DB:

* end-to-end through ``df.foreachPartition`` with MULTIPLE Spark
  worker processes contending for DuckDB's exclusive file lock — the
  lock error is classified ``reconnect`` and the losing worker redials
  until the winner releases, which is precisely the reference's
  "redial until connect() succeeds" loop under a dropped connection;
* driver-side ``write_rows_upsert`` with fault-injecting connection
  wrappers proving each branch: deadlock→backoff-and-replay,
  connection→reconnect-and-replay, syntax→no retry, retry exhaustion
  raises (task-level replay is the outer loop; upserts idempotent).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from obmp_psql_spark.sources.jdbc import (
    classify_sql_error,
    jdbc_upsert_writer,
    write_rows_upsert,
)


def _rows(spark, data):
    return spark.createDataFrame(data, "k int, v string")


def _init_db(path: str) -> None:
    con = duckdb.connect(path)
    con.execute("CREATE TABLE ip_rib (k INT PRIMARY KEY, v TEXT)")
    con.close()


# ---------------------------------------------------------------- unit


class _FlakyConn:
    """Delegates to a real DuckDB connection, failing the first
    ``fail_n`` execute() calls with ``err``."""

    def __init__(self, path: str, fail_n: int, err: str, log: list[str]):
        self._con = duckdb.connect(path)
        self._fail = fail_n
        self._err = err
        self._log = log

    def execute(self, sql: str):
        if self._fail > 0:
            self._fail -= 1
            self._log.append("fail")
            raise RuntimeError(self._err)
        self._log.append("exec")
        return self._con.execute(sql)

    def commit(self):
        self._con.commit()

    def rollback(self):
        self._log.append("rollback")

    def close(self):
        self._log.append("close")
        self._con.close()


def _read_all(path: str) -> dict[int, str]:
    con = duckdb.connect(path)
    try:
        return dict(con.execute("SELECT k, v FROM ip_rib").fetchall())
    finally:
        con.close()


def test_classifier_matches_reference_ladder():
    assert classify_sql_error(Exception("deadlock detected")) == "backoff"
    assert classify_sql_error(
        Exception("TransactionContext Error: write-write conflict")
    ) == "backoff"
    assert classify_sql_error(Exception("Broken pipe")) == "reconnect"
    assert classify_sql_error(
        Exception("connection reset by peer")) == "reconnect"
    assert classify_sql_error(Exception(
        'IO Error: Could not set lock on file "x.db"')) == "reconnect"
    assert classify_sql_error(
        Exception('syntax error at or near "FORM"')) == "fatal"
    # permanent errors that merely CONTAIN the word "connection" must
    # fail fast, not burn the reconnect ladder
    assert classify_sql_error(Exception(
        'violates foreign key constraint "fk_connection_id"')) == "fatal"
    assert classify_sql_error(Exception(
        'relation "peer_connections" does not exist')) == "fatal"
    # ...but the canonical driver disconnect texts all reconnect
    for m in ("SSL connection has been closed unexpectedly",
              "connection already closed",
              "This connection has been closed.",
              "connection to server was lost",
              "could not connect to server: Connection refused",
              "terminating connection due to administrator command",
              "FATAL: the database system is starting up "
              "(connection aborted)"):
        assert classify_sql_error(Exception(m)) == "reconnect", m
    # permanent connection-PHASE errors fail fast: "failure" is not a
    # lifecycle word (bad credentials would otherwise burn the whole
    # redial ladder, ~retries x reconnect_wait_s, before surfacing)
    assert classify_sql_error(Exception(
        "FATAL: connection authorization failure for user bmp")) == "fatal"
    # SQLSTATE (when the driver exposes one) beats message sniffing
    e = Exception("connection closed")   # message alone says reconnect
    e.pgcode = "28000"                   # ...but auth failure is fatal
    assert classify_sql_error(e) == "fatal"
    e = Exception("opaque driver text")  # message alone says fatal
    e.sqlstate = "08006"                 # ...but 08xxx is a conn failure
    assert classify_sql_error(e) == "reconnect"
    e = Exception("opaque driver text")
    e.pgcode = "40P01"                   # deadlock class
    assert classify_sql_error(e) == "backoff"


def test_deadlock_backoff_replays_statement(spark, tmp_path):
    db = str(tmp_path / "a.db")
    _init_db(db)
    log: list[str] = []
    naps: list[float] = []
    n = write_rows_upsert(
        iter(_rows(spark, [(1, "a"), (2, "b")]).collect()),
        ["k", "v"], "ip_rib", ["k"],
        lambda: _FlakyConn(db, 1, "deadlock detected", log),
        sleep=naps.append)
    assert n == 1
    # aborted txn rolled back BEFORE the nap + replay (Postgres
    # sessions are non-autocommit: replay without rollback would hit
    # 'current transaction is aborted' and read as fatal)
    assert log == ["fail", "rollback", "exec", "close"]
    assert naps == [0.15]
    assert _read_all(db) == {1: "a", 2: "b"}


def test_connection_error_redials_and_replays(spark, tmp_path):
    db = str(tmp_path / "b.db")
    _init_db(db)
    log: list[str] = []
    dials = []

    def factory():
        dials.append(1)
        return _FlakyConn(db, 1 if len(dials) == 1 else 0,
                          "connection reset by peer", log)

    write_rows_upsert(
        iter(_rows(spark, [(1, "a")]).collect()),
        ["k", "v"], "ip_rib", ["k"], factory, sleep=lambda s: None)
    assert len(dials) == 2          # broken session replaced
    assert log == ["fail", "close", "exec", "close"]
    assert _read_all(db) == {1: "a"}


def test_syntax_error_not_retried(spark, tmp_path):
    db = str(tmp_path / "c.db")
    _init_db(db)
    log: list[str] = []
    with pytest.raises(RuntimeError, match="syntax error"):
        write_rows_upsert(
            iter(_rows(spark, [(1, "a")]).collect()),
            ["k", "v"], "ip_rib", ["k"],
            lambda: _FlakyConn(db, 99, 'syntax error at or near "FORM"',
                               log),
            sleep=lambda s: None)
    assert log == ["fail", "close"]  # exactly one attempt, no replay


def test_retry_exhaustion_raises(spark, tmp_path):
    db = str(tmp_path / "d.db")
    _init_db(db)
    log: list[str] = []
    naps: list[float] = []
    with pytest.raises(RuntimeError, match="failed after 3 attempts"):
        write_rows_upsert(
            iter(_rows(spark, [(1, "a")]).collect()),
            ["k", "v"], "ip_rib", ["k"],
            lambda: _FlakyConn(db, 99, "deadlock detected", log),
            retries=3, sleep=naps.append)
    assert log.count("fail") == 3
    assert len(naps) == 2  # no pointless nap after the final attempt


def test_statement_batching(spark, tmp_path):
    db = str(tmp_path / "e.db")
    _init_db(db)
    log: list[str] = []
    n = write_rows_upsert(
        iter(_rows(spark, [(i, f"v{i}") for i in range(5)]).collect()),
        ["k", "v"], "ip_rib", ["k"],
        lambda: _FlakyConn(db, 0, "", log), batch_rows=2)
    assert n == 3                    # 2 + 2 + 1
    assert log.count("exec") == 3
    assert _read_all(db) == {i: f"v{i}" for i in range(5)}


# ------------------------------------------------- end-to-end (Spark)


def test_foreach_partition_upsert_with_lock_contention(spark, tmp_path):
    """Two micro-batches, 4 partitions each, through real Spark worker
    processes into one DuckDB file. Workers race for the exclusive
    file lock; losers hit 'Could not set lock', classified reconnect,
    and redial until the holder commits+closes — the container's live
    rehearsal of the reference's reconnect loop. Second batch
    overwrites overlapping keys (ON CONFLICT semantics end-to-end)."""
    db = str(tmp_path / "ee.db")
    _init_db(db)
    writer = jdbc_upsert_writer(
        "ip_rib", ["k"], lambda: duckdb.connect(db),
        batch_rows=3, retries=120, reconnect_wait_s=0.25)
    writer(_rows(spark, [(i, f"b0_{i}") for i in range(20)])
           .repartition(4), 0)
    writer(_rows(spark, [(i, f"b1_{i}") for i in range(10, 30)])
           .repartition(4), 1)
    got = _read_all(db)
    want = {i: f"b0_{i}" for i in range(10)}
    want.update({i: f"b1_{i}" for i in range(10, 30)})
    assert got == want


def test_streaming_foreach_batch_sink(spark, tmp_path):
    """The writer's intended seat: a Structured Streaming foreachBatch
    sink. Two availableNow passes over a growing source dir land in
    DuckDB with upsert semantics (second file overwrites overlapping
    keys); the coalesce(1) wrapper is the documented low-contention
    deployment shape for a single-writer DBMS target."""
    db = str(tmp_path / "s.db")
    _init_db(db)
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    writer = jdbc_upsert_writer("ip_rib", ["k"],
                                lambda: duckdb.connect(db), retries=60,
                                reconnect_wait_s=0.25)

    def run_pass():
        stream = (spark.readStream.schema("k int, v string")
                  .parquet(str(src)))
        q = (stream.writeStream
             .foreachBatch(lambda df, bid: writer(df.coalesce(1), bid))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    _rows(spark, [(1, "a"), (2, "b")]).coalesce(1) \
        .write.mode("append").parquet(str(src))
    run_pass()
    assert _read_all(db) == {1: "a", 2: "b"}
    _rows(spark, [(2, "B"), (3, "c")]).coalesce(1) \
        .write.mode("append").parquet(str(src))
    run_pass()
    assert _read_all(db) == {1: "a", 2: "B", 3: "c"}


def test_read_table_roundtrip_requires_jdbc_jar(spark):
    """spark.read.jdbc needs a JDBC driver jar absent from this
    container; assert the source fails at load time with the clean
    missing-driver error, not silently."""
    from obmp_psql_spark.sources.jdbc import read_table
    with pytest.raises(Exception, match="(?i)driver"):
        read_table(spark, "jdbc:postgresql://nohost/db", "t").collect()


# ------------------------------------------------------- DBAPI read


def test_partition_predicates_cover_table():
    """Stride split: union of predicates is the whole table, slices
    disjoint, first slice owns NULLs, degenerate ranges collapse."""
    from obmp_psql_spark.sources.jdbc import partition_predicates
    preds = partition_predicates("k", 0, 100, 4)
    assert preds == ["k < 25 OR k IS NULL",
                     "k >= 25 AND k < 50",
                     "k >= 50 AND k < 75",
                     "k >= 75"]
    # verify cover + disjointness against a live table
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT CASE WHEN range % 17 = 0 "
                "THEN NULL ELSE range END AS k FROM range(100)")
    total = sum(con.execute(f"SELECT count(*) FROM t WHERE {p}")
                .fetchone()[0] for p in preds)
    assert total == 100
    assert partition_predicates("k", 5, 5, 4) == [None]      # empty range
    assert partition_predicates("k", None, None, 4) == [None]
    assert partition_predicates("k", 0, 2, 8) == [           # n > range
        "k < 1 OR k IS NULL", "k >= 1"]
    # single distinct value: bound probe yields upper = lower + 1, the
    # 1-wide range can't be split — must collapse, not IndexError
    assert partition_predicates("k", 7, 8, 4) == [None]


def test_read_rows_partitioned_live(spark, tmp_path):
    """The executable S5 read side: every Spark task dials its own
    read-only DuckDB connection and scans one range slice; rows,
    schema, NULL keys, and auto-probed bounds all correct."""
    from obmp_psql_spark.sources.jdbc import read_rows_partitioned
    db = str(tmp_path / "r.db")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE routers AS SELECT range AS k, "
                "'r' || CAST(range AS TEXT) AS v FROM range(97)")
    con.execute("INSERT INTO routers VALUES (NULL, 'null-key')")
    con.close()
    df = read_rows_partitioned(
        spark, "routers", "k long, v string",
        lambda: duckdb.connect(db, read_only=True),
        partition_column="k", num_partitions=4)
    assert df.rdd.getNumPartitions() == 4
    got = {(r.k, r.v) for r in df.collect()}
    assert len(got) == 98 and (None, "null-key") in got
    assert (96, "r96") in got
    # a SELECT source instead of a table name
    df2 = read_rows_partitioned(
        spark, "SELECT k, v FROM routers WHERE k % 2 = 0",
        "k long, v string", lambda: duckdb.connect(db, read_only=True),
        partition_column="k", num_partitions=3)
    assert df2.count() == 49


def test_read_retry_ladder_replays_query(tmp_path):
    """fetch_rows_once: transient failure replays the WHOLE query
    (no duplicated prefix), fatal raises immediately."""
    from obmp_psql_spark.sources.jdbc import fetch_rows_once
    db = str(tmp_path / "f.db")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE t AS SELECT range AS k FROM range(10)")
    con.close()
    log: list[str] = []
    mk = lambda: _FlakyConn(db, 0, "", log)  # noqa: E731

    def flaky_factory():
        # first connection fails its first execute with a disconnect
        return _FlakyConn(db, 1 if not log else 0,
                          "connection reset by peer", log)

    naps: list[float] = []
    rows = fetch_rows_once("SELECT k FROM t ORDER BY k", flaky_factory,
                           fetch_rows=3, sleep=naps.append)
    assert [r[0] for r in rows] == list(range(10))  # no dup prefix
    assert naps and log.count("fail") == 1
    # fatal errors re-raise the ORIGINAL driver exception, no retries
    n_fail = len(naps)
    with pytest.raises(Exception, match="(?i)syntax"):
        fetch_rows_once("SELEKT 1", mk, sleep=naps.append)
    assert len(naps) == n_fail  # no nap: first attempt raised


def test_read_rows_partitioned_type_fidelity(spark, tmp_path):
    """The DBAPI read path must carry the reference schema types
    losslessly: BIGINT, DOUBLE, BOOLEAN, TIMESTAMP (µs), VARCHAR, and
    NULLs in every one of them survive the DBAPI -> pandas -> Arrow ->
    Spark hop bit-exactly."""
    import datetime as dt

    from obmp_psql_spark.sources.jdbc import read_rows_partitioned
    db = str(tmp_path / "ty.db")
    con = duckdb.connect(db)
    con.execute("""
      CREATE TABLE t AS SELECT * FROM (VALUES
        (1::BIGINT, 1.5::DOUBLE, true,
         TIMESTAMP '2024-03-01 12:34:56.789123', 'a'),
        (2, NULL, NULL, NULL, NULL),
        (NULL, -0.25, false, TIMESTAMP '1999-12-31 23:59:59', '')
      ) AS v(k, d, b, ts, s)""")
    con.close()
    rows = {r.k: r for r in read_rows_partitioned(
        spark, "t", "k long, d double, b boolean, ts timestamp, s string",
        lambda: duckdb.connect(db, read_only=True),
        partition_column="k", num_partitions=2).collect()}
    assert set(rows) == {1, 2, None}
    r1, r2, rn = rows[1], rows[2], rows[None]
    assert (r1.d, r1.b, r1.s) == (1.5, True, "a")
    assert r1.ts == dt.datetime(2024, 3, 1, 12, 34, 56, 789123)
    assert (r2.d, r2.b, r2.ts, r2.s) == (None, None, None, None)
    assert (rn.d, rn.b, rn.s) == (-0.25, False, "")
    assert rn.ts == dt.datetime(1999, 12, 31, 23, 59, 59)
