"""The driver has shipped events.ts under three different parquet
timestamp encodings across rounds — TIMESTAMP(NANOS) (surfaced as
epoch-nanos LongType under nanosAsLong), TIMESTAMP_NTZ(µs), and plain
TIMESTAMP(µs, UTC-adjusted). A round-3 encoding change silently broke
14 queries; this matrix pins ``load_tables``/``normalize_ts`` to all
three so a future driver-side change fails here first.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from obmp_psql_spark.session import load_tables

from .conftest import SF_SMALL

ENCODINGS = {
    "nanos": pa.timestamp("ns"),
    "ntz_micros": pa.timestamp("us"),
    "ltz_micros": pa.timestamp("us", tz="UTC"),
}


@pytest.fixture(scope="module")
def reference_rows(spark):
    ev = load_tables(spark, SF_SMALL, ("events",))["events"]
    rows = ev.select("event_id", "ts").orderBy("event_id").limit(500).collect()
    assert rows, "events fixture empty"
    return [(r.event_id, r.ts) for r in rows]


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_load_tables_normalizes_ts_encoding(spark, tmp_path, enc,
                                            reference_rows):
    table = pq.read_table(f"{SF_SMALL}/events.parquet")
    idx = table.schema.get_field_index("ts")
    # the source may already be ns-long; go through µs so every target
    # encoding round-trips exactly (test data has µs resolution)
    recast = table.set_column(
        idx, pa.field("ts", ENCODINGS[enc]),
        table.column("ts").cast(pa.timestamp("us")).cast(ENCODINGS[enc]))
    out_dir = tmp_path / enc
    out_dir.mkdir()
    pq.write_table(recast, out_dir / "events.parquet")

    ev = load_tables(spark, str(out_dir), ("events",))["events"]
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType), \
        f"{enc}: ts surfaced as {ev.schema['ts'].dataType}"
    got = [(r.event_id, r.ts) for r in
           ev.select("event_id", "ts").orderBy("event_id").limit(500).collect()]
    assert got == reference_rows
