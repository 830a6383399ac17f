"""JDBC source/sink (S3/S5): the deployment mode where the engine
keeps serving the existing Postgres schema — Structured Streaming in,
``INSERT ... ON CONFLICT`` upserts out (the reference's
WriterRunnable.java:77-176 bulk path; BASELINE north star "Kafka
source into JDBC sink").

No Postgres in this container, so the sink builds and batches the
statements but only executes when a connection factory is supplied;
statement generation is unit-tested offline. A Delta/Iceberg target
(state.py) is the preferred lakehouse mode — this module exists for
drop-in compatibility with consumers of the reference DB.
"""

from __future__ import annotations

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


def jdbc_upsert_writer(
    table: str,
    key_columns: list[str],
    connection_factory: Callable[[], object],
    batch_rows: int = 3000,
    set_columns: list[str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: per micro-batch, partitions stream their
    rows as <=``batch_rows``-row upsert statements through their own
    connection (matches the reference's 3000-row writer batches,
    obmp-psql.yml:71). Use after per-batch dedup-latest so ON
    CONFLICT never sees duplicate keys in one statement."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        columns = df.columns

        def write_partition(rows: Iterator[Row]) -> None:
            conn = connection_factory()
            try:
                buf: list[Row] = []
                for r in rows:
                    buf.append(r)
                    if len(buf) >= batch_rows:
                        conn.execute(upsert_statement(
                            table, columns, buf, key_columns, set_columns))
                        buf = []
                if buf:
                    conn.execute(upsert_statement(
                        table, columns, buf, key_columns, set_columns))
                conn.commit()
            finally:
                conn.close()

        df.foreachPartition(write_partition)

    return write_batch
