"""JDBC source/sink (S3/S5): the deployment mode where the engine
keeps serving the existing Postgres schema — Structured Streaming in,
``INSERT ... ON CONFLICT`` upserts out (the reference's
WriterRunnable.java:77-176 bulk path; BASELINE north star "Kafka
source into JDBC sink").

No Postgres in this container; the sink writes through any DBAPI-ish
connection factory and is integration-tested against embedded DuckDB
(same ``INSERT ... ON CONFLICT DO UPDATE`` dialect, real file-lock
contention between Spark worker processes exercising the reconnect
path — tests/test_jdbc_duckdb.py). Retry semantics mirror the
reference's PSQLHandler.java:156-224: reconnect-and-replay on
connection errors, short backoff on deadlock, no retry on syntax
errors, per-statement commit. One deviation, documented: after
exhausting retries the reference logs and DROPS the batch
(PSQLHandler.java:221-224); we raise instead so the Spark task fails
and is retried by the scheduler — upserts are idempotent, so task
replay is safe and nothing is silently lost.

A Delta/Iceberg-style target (state.py) is the preferred lakehouse
mode — this module exists for drop-in compatibility with consumers of
the reference DB.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row, SparkSession


def read_table(spark: SparkSession, url: str, table: str,
               partition_column: str | None = None,
               num_partitions: int = 8, **options) -> DataFrame:
    """spark.read.jdbc scan (S5: router map refresh,
    ConsumerRunnable.java:596-629). Partitioned read when a numeric
    partition column is available."""
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table))
    if partition_column:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions)))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def upsert_statement(table: str, columns: list[str], rows: list[Row],
                     key_columns: list[str],
                     set_columns: list[str] | None = None) -> str:
    """One multi-row ``INSERT ... ON CONFLICT (keys) DO UPDATE`` —
    the reference's bulk statement shape (UnicastPrefixQuery.java:
    24-41 + WriterRunnable batching)."""
    set_columns = set_columns or [c for c in columns if c not in key_columns]
    values = ",\n".join(
        "(" + ", ".join(_sql_literal(r[c]) for c in columns) + ")"
        for r in rows)
    sets = ", ".join(f"{c}=excluded.{c}" for c in set_columns)
    return (
        f"INSERT INTO {table} ({', '.join(columns)}) VALUES\n{values}\n"
        f"ON CONFLICT ({', '.join(key_columns)}) DO UPDATE SET {sets}"
    )


_RECONNECT_PHRASES = (
    "broken pipe", "not connected",
    "could not set lock", "database is locked",
)

# "connection" alone is NOT enough (a constraint named
# fk_connection_id must stay fatal) — it reconnects only together
# with a lifecycle word, which covers the canonical driver texts:
# psycopg2 "SSL connection has been closed unexpectedly" /
# "connection already closed", PgJDBC "This connection has been
# closed.", libpq "connection to server was lost" /
# "could not connect to server", "terminating connection ..."
_CONN_LIFECYCLE_WORDS = (
    "closed", "close", "lost", "reset", "refused", "timed out",
    "timeout", "terminat", "broken", "could not connect", "aborted",
    "unexpectedly", "failure", "does not exist yet",
)

_BACKOFF_PHRASES = (
    "deadlock", "write-write conflict", "database is busy",
    "serialize access", "lock timeout",
)


def classify_sql_error(exc: BaseException) -> str:
    """Map a DB error to a retry action, mirroring the reference's
    message-sniffing (PSQLHandler.java:188-207): ``reconnect`` for
    connection-lifecycle/broken-pipe failures (and DuckDB's exclusive
    file lock, this container's stand-in for a dropped connection),
    ``backoff`` for deadlock-class transients, ``fatal`` for
    everything else (the reference refuses to retry syntax errors,
    state 42601)."""
    msg = str(exc).lower()
    if any(p in msg for p in _RECONNECT_PHRASES):
        return "reconnect"
    if "connection" in msg and any(w in msg
                                   for w in _CONN_LIFECYCLE_WORDS):
        return "reconnect"
    if any(p in msg for p in _BACKOFF_PHRASES):
        return "backoff"
    return "fatal"


def write_rows_upsert(
    rows: Iterator[Row],
    columns: list[str],
    table: str,
    key_columns: list[str],
    connection_factory: Callable[[], object],
    batch_rows: int = 3000,
    set_columns: list[str] | None = None,
    retries: int = 10,
    backoff_s: float = 0.15,
    reconnect_wait_s: float = 1.0,
    error_class: Callable[[BaseException], str] = classify_sql_error,
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Stream ``rows`` into ``table`` as <=``batch_rows``-row upsert
    statements with the reference's retry loop (PSQLHandler.java:
    156-224): each statement is committed individually; a transient
    failure sleeps ``backoff_s`` (the reference's 150 ms deadlock
    nap) and replays the statement — safe because ON CONFLICT upserts
    are idempotent; a connection-class failure closes the session and
    redials through ``connection_factory`` (the reference blocks in
    ``while (!connect())`` forever; we bound every recovery by
    ``retries`` and raise so the Spark task retry takes over).
    Returns the number of statements executed. Runs inside one task —
    no Spark objects touched."""

    def dial():
        last: BaseException | None = None
        for i in range(retries):
            try:
                return connection_factory()
            except Exception as exc:  # noqa: BLE001 — driver-specific
                last = exc
                if i < retries - 1:  # no pointless nap before raising
                    sleep(reconnect_wait_s)
        raise RuntimeError(
            f"jdbc sink: connect failed after {retries} attempts") from last

    conn = dial()
    statements = 0
    try:
        def run(sql: str) -> None:
            nonlocal conn
            last: BaseException | None = None
            for i in range(retries):
                try:
                    conn.execute(sql)
                    conn.commit()
                    return
                except Exception as exc:  # noqa: BLE001
                    last = exc
                    action = error_class(exc)
                    if action == "fatal":
                        raise
                    if action == "reconnect":
                        try:
                            conn.close()
                        except Exception:  # noqa: BLE001 — already broken
                            pass
                        if i < retries - 1:
                            sleep(reconnect_wait_s)
                            conn = dial()
                    else:  # backoff
                        # a non-autocommit session (Postgres default)
                        # is in an ABORTED transaction after a
                        # deadlock — replaying without rollback would
                        # fail 'current transaction is aborted' and
                        # read as fatal, defeating the backoff branch
                        try:
                            conn.rollback()
                        except Exception:  # noqa: BLE001 — autocommit
                            pass
                        if i < retries - 1:
                            sleep(backoff_s)
            raise RuntimeError(
                f"jdbc sink: statement failed after {retries} "
                f"attempts") from last

        buf: list[Row] = []
        for r in rows:
            buf.append(r)
            if len(buf) >= batch_rows:
                run(upsert_statement(
                    table, columns, buf, key_columns, set_columns))
                statements += 1
                buf = []
        if buf:
            run(upsert_statement(
                table, columns, buf, key_columns, set_columns))
            statements += 1
    finally:
        try:
            conn.close()
        except Exception:  # noqa: BLE001
            pass
    return statements


def jdbc_upsert_writer(
    table: str,
    key_columns: list[str],
    connection_factory: Callable[[], object],
    batch_rows: int = 3000,
    set_columns: list[str] | None = None,
    retries: int = 10,
    backoff_s: float = 0.15,
    reconnect_wait_s: float = 1.0,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: per micro-batch, partitions stream their
    rows as <=``batch_rows``-row upsert statements through their own
    connection (matches the reference's 3000-row writer batches,
    obmp-psql.yml:71), with per-statement commit + retry
    (write_rows_upsert). Use after per-batch dedup-latest so ON
    CONFLICT never sees duplicate keys in one statement."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        columns = df.columns

        def write_partition(rows: Iterator[Row]) -> None:
            write_rows_upsert(
                rows, columns, table, key_columns, connection_factory,
                batch_rows=batch_rows, set_columns=set_columns,
                retries=retries, backoff_s=backoff_s,
                reconnect_wait_s=reconnect_wait_s)

        df.foreachPartition(write_partition)

    return write_batch
