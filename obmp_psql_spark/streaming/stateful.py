"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps per-entity running state in JVM maps (router
connection counts ConsumerRunnable.java:596-629, attr dedup cache
:485-501). The Spark-native form is keyed state in the state store:
``groupBy(key).applyInPandasWithState`` — fault-tolerant via the
checkpoint, scales with the number of keys, and supports TTL through
timeouts (the reference's 20-min cache TTL maps to
``GroupStateTimeout.ProcessingTimeTimeout``).

``peer_activity_counter`` tracks per-peer cumulative update/withdraw
counts and last-seen timestamp — the streaming version of the
stats_peer_update_counts rollup, emitting a row per peer per
micro-batch in update mode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("peer_hash_id string, updates bigint, withdraws bigint, "
                 "last_ts timestamp")
STATE_SCHEMA = "updates bigint, withdraws bigint"


def _update_peer_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    updates, withdraws = state.get if state.exists else (0, 0)
    last_ts = None
    for pdf in pdfs:
        wd = pdf["is_withdrawn"].fillna(False)
        withdraws += int(wd.sum())
        updates += int((~wd).sum())
        mx = pdf["timestamp"].max()
        last_ts = mx if last_ts is None else max(last_ts, mx)
    state.update((updates, withdraws))
    yield pd.DataFrame({
        "peer_hash_id": [key[0]],
        "updates": [updates],
        "withdraws": [withdraws],
        "last_ts": [last_ts],
    })


def peer_activity_counter(messages: DataFrame) -> DataFrame:
    """Streaming per-peer running counters over unicast_prefix
    messages. Input: a streaming DataFrame with at least
    (peer_hash, is_withdrawn, timestamp)."""
    from pyspark.sql import functions as F

    keyed = messages.select(
        F.col("peer_hash").alias("peer_hash_id"),
        "is_withdrawn", "timestamp")
    return keyed.groupBy("peer_hash_id").applyInPandasWithState(
        _update_peer_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
