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
# "could not connect to server", "terminating connection ...".
# Deliberately NOT here: bare "failure" — Postgres's permanent
# connection-phase errors ("connection authorization failure" = bad
# credentials, 28000) would otherwise burn the whole redial ladder
# before surfacing. ("aborted" stays: "connection aborted" is the
# psycopg2 socket-abort text; auth errors don't contain it.)
_CONN_LIFECYCLE_WORDS = (
    "closed", "close", "lost", "reset", "refused", "timed out",
    "timeout", "terminat", "broken", "could not connect", "aborted",
    "unexpectedly", "does not exist yet",
)

# SQLSTATE classes that are never worth a redial: 28xxx auth
# failures, 3D/3F invalid catalog/schema, 42xxx syntax/permission.
_FATAL_SQLSTATE_PREFIXES = ("28", "3d", "3f", "42")
# 08xxx = connection exception class (08006 failure, 08003 does not
# exist, 08001/08004 cannot/rejected connect) — always reconnect.
_RECONNECT_SQLSTATE_PREFIXES = ("08",)
# 40xxx = transaction rollback (40P01 deadlock, 40001 serialization).
_BACKOFF_SQLSTATE_PREFIXES = ("40",)

_BACKOFF_PHRASES = (
    "deadlock", "write-write conflict", "database is busy",
    "serialize access", "lock timeout",
)


def _sqlstate(exc: BaseException) -> str | None:
    """Driver-reported SQLSTATE when available: psycopg2 exposes
    ``pgcode``, most DBAPI drivers ``sqlstate``; returned lowercase."""
    for attr in ("pgcode", "sqlstate"):
        code = getattr(exc, attr, None)
        if isinstance(code, str) and len(code) == 5:
            return code.lower()
    return None


def classify_sql_error(exc: BaseException) -> str:
    """Map a DB error to a retry action, mirroring the reference's
    message-sniffing (PSQLHandler.java:188-207) but preferring the
    driver's SQLSTATE when it exposes one (message sniffing can't
    tell 'connection authorization failure' — permanent, 28000 —
    from 'connection failure' — transient, 08006): ``reconnect``
    for connection-lifecycle/broken-pipe failures (and DuckDB's
    exclusive file lock, this container's stand-in for a dropped
    connection), ``backoff`` for deadlock-class transients,
    ``fatal`` for everything else (the reference refuses to retry
    syntax errors, state 42601)."""
    state = _sqlstate(exc)
    if state:
        if state.startswith(_FATAL_SQLSTATE_PREFIXES):
            return "fatal"
        if state.startswith(_RECONNECT_SQLSTATE_PREFIXES):
            return "reconnect"
        if state.startswith(_BACKOFF_SQLSTATE_PREFIXES):
            return "backoff"
    msg = str(exc).lower()
    if any(p in msg for p in _RECONNECT_PHRASES):
        return "reconnect"
    if "connection" in msg and any(w in msg
                                   for w in _CONN_LIFECYCLE_WORDS):
        return "reconnect"
    if any(p in msg for p in _BACKOFF_PHRASES):
        return "backoff"
    return "fatal"


def partition_predicates(partition_column: str, lower: int, upper: int,
                         num_partitions: int) -> list[str | None]:
    """Range fan-out predicates, one per read partition — the same
    contract as Spark's JDBCRelation.columnPartition: stride split of
    [lower, upper], first partition open below (and owning NULLs),
    last open above, so the union of partitions is ALWAYS the whole
    table even when the probed bounds are stale. Collapses to a
    single full-scan partition when the range can't be split."""
    if (num_partitions <= 1 or lower is None or upper is None
            or lower >= upper):
        return [None]
    n = min(num_partitions, upper - lower)
    if n <= 1:
        # upper - lower == 1: one stride covers the range; emitting the
        # i == 0 open-below predicate would index an empty bounds list
        return [None]
    stride = (upper - lower) // n
    bounds = [lower + i * stride for i in range(1, n)]
    preds: list[str | None] = []
    for i in range(n):
        if i == 0:
            preds.append(f"{partition_column} < {bounds[0]} "
                         f"OR {partition_column} IS NULL")
        elif i == n - 1:
            preds.append(f"{partition_column} >= {bounds[-1]}")
        else:
            preds.append(f"{partition_column} >= {bounds[i - 1]} "
                         f"AND {partition_column} < {bounds[i]}")
    return preds


def fetch_rows_once(
    sql: str,
    connection_factory: Callable[[], object],
    fetch_rows: int = 10_000,
    retries: int = 10,
    backoff_s: float = 0.15,
    reconnect_wait_s: float = 1.0,
    error_class: Callable[[BaseException], str] = classify_sql_error,
    sleep: Callable[[float], None] = time.sleep,
) -> list[tuple]:
    """Run one SELECT with the reference's retry ladder and return
    ALL its rows. The whole query replays from scratch on a
    reconnect/backoff — a SELECT is idempotent, and buffering before
    handing rows downstream is what makes the replay exactly-once
    (streaming rows out and then replaying would duplicate the
    prefix). Partition sizing bounds the buffer, same contract as a
    spark.read.jdbc partition."""
    last: BaseException | None = None
    for i in range(retries):
        conn = None
        try:
            conn = connection_factory()
            cur = conn.cursor() if hasattr(conn, "cursor") else conn
            res = cur.execute(sql)
            # DBAPI cursors fetch from the cursor; DuckDB-style
            # connections return a result-bearing object from execute
            src = res if hasattr(res, "fetchmany") else cur
            out: list[tuple] = []
            while True:
                batch = src.fetchmany(fetch_rows)
                if not batch:
                    return out
                out.extend(batch)
        except Exception as exc:  # noqa: BLE001 — driver-specific
            last = exc
            action = error_class(exc)
            if action == "fatal":
                raise
            if i < retries - 1:
                sleep(reconnect_wait_s if action == "reconnect"
                      else backoff_s)
        finally:
            if conn is not None:
                try:
                    conn.close()
                except Exception:  # noqa: BLE001 — already broken
                    pass
    raise RuntimeError(
        f"jdbc source: query failed after {retries} attempts") from last


def read_rows_partitioned(
    spark: SparkSession,
    query: str,
    schema,
    connection_factory: Callable[[], object],
    partition_column: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 8,
    fetch_rows: int = 10_000,
    retries: int = 10,
    backoff_s: float = 0.15,
    reconnect_wait_s: float = 1.0,
    error_class: Callable[[BaseException], str] = classify_sql_error,
) -> DataFrame:
    """EXECUTABLE JDBC-shaped read (S5 read side, the mirror of
    ``write_rows_upsert``): predicate-range partitioned fan-out where
    every Spark task dials its own DBAPI connection through
    ``connection_factory`` and scans one range slice of ``query``
    (a table name or any parenthesizable SELECT). This is the path
    the reference's router-map refresh takes
    (ConsumerRunnable.java:596-629) when no JDBC driver jar is
    available to ``spark.read.jdbc`` — same partitioning contract
    (stride split, first slice owns NULLs, union always covers the
    table), same retry ladder as the sink.

    ``partition_column`` must be numeric; bounds are probed with one
    driver-side min/max query when not given (exactly what
    spark.read.jdbc requires the caller to do). Each slice buffers
    its result before emitting (SELECT replay on reconnect is
    exactly-once that way); size ``num_partitions`` so a slice fits
    in a worker, the same sizing rule as any JDBC partition."""
    from pyspark.sql.types import StructType, _parse_datatype_string
    if isinstance(schema, str):
        schema = _parse_datatype_string(schema)
    assert isinstance(schema, StructType)
    names = [f.name for f in schema.fields]
    src = f"({query}) AS __src" if " " in query.strip() else query
    if partition_column and (lower is None or upper is None):
        probe = fetch_rows_once(
            f"SELECT min({partition_column}), max({partition_column}) "
            f"FROM {src}",
            connection_factory, retries=retries, backoff_s=backoff_s,
            reconnect_wait_s=reconnect_wait_s, error_class=error_class)
        lo, hi = (probe[0] if probe else (None, None))
        lower = int(lo) if lower is None and lo is not None else lower
        upper = int(hi) + 1 if upper is None and hi is not None else upper
    preds = (partition_predicates(partition_column, lower, upper,
                                  num_partitions)
             if partition_column else [None])
    cols = ", ".join(names)

    def gen(it: Iterator) -> Iterator:
        import pandas as pd
        for pdf in it:
            for pid in pdf["__pid"]:
                pred = preds[int(pid)]
                sql = f"SELECT {cols} FROM {src}" + \
                    (f" WHERE {pred}" if pred else "")
                rows = fetch_rows_once(
                    sql, connection_factory, fetch_rows=fetch_rows,
                    retries=retries, backoff_s=backoff_s,
                    reconnect_wait_s=reconnect_wait_s,
                    error_class=error_class)
                for i in range(0, len(rows), fetch_rows):
                    yield pd.DataFrame(rows[i:i + fetch_rows],
                                       columns=names)

    # one slice id per task: range(n) with n partitions is exactly
    # one id per partition — no shuffle, no skewed doubling-up
    ids = spark.range(0, len(preds), 1, len(preds)) \
        .withColumnRenamed("id", "__pid")
    return ids.mapInPandas(gen, schema=schema)


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
