"""Local replica of the driver's Spark-vs-DuckDB comparison: run the
registered query and its oracle SQL on the same parquet, sort columns
by name, compare row counts and exact values. Catch mismatches before
the driver does."""

from __future__ import annotations



import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    con = duckdb_conn(sf_dir)
    odf = con.execute(oracle_sql).fetchdf()

    sdf = spark_df.toPandas()
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    cols = sorted(sdf.columns)
    if len(sdf) != len(odf):
        return False, f"row counts differ: spark={len(sdf)} oracle={len(odf)}"

    # repr-based row sort (like the driver): robust to NaN/None mixes
    # that break tuple ordering on nullable numeric columns
    srows = sorted(repr(tuple(r)) for r in sdf[cols].itertuples(index=False, name=None))
    orows = sorted(repr(tuple(r)) for r in odf[cols].itertuples(index=False, name=None))
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            return False, f"first value mismatch at sorted row {i}:\n  spark ={a}\n  oracle={b}"
    return True, "ok"
