"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 is demonstrated here as a
named query over the driver-generated tables (region nation customer
supplier part orders lineitem events documents embeddings), paired
with an ANSI-SQL oracle that DuckDB runs on the same parquet.

Conventions that keep the Spark result and the DuckDB oracle
hash-identical:
- every computed column is aliased the same on both sides;
- monetary / double aggregates accumulate in exact DECIMAL and are
  cast to DOUBLE once at the end (SUM over doubles is
  order-dependent; DECIMAL accumulation is exact and associative, so
  both engines produce the bit-identical double);
- integer sums are cast to BIGINT in the oracle (DuckDB widens to
  HUGEINT by default);
- timestamps stay UTC-naive on both sides (session TZ pinned UTC).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


# The driver always runs its oracle comparison at this scale; sf-dependent
# oracles (the recall handshakes embed an sf-tagged handoff path) resolve
# against it in the static oracle_sql() contract.
DRIVER_SF_DIR = "/root/testdata/sf0.01"


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    # str, or a callable(sf_dir) -> str for oracles whose SQL depends on
    # the scale dir (parquet handoff paths); None => non-SQL-expressible,
    # rows-only check
    oracle: str | Callable[[str], str] | None
    survey_ref: str = ""  # SURVEY.md §2 operator ids this demonstrates
    doc: str = ""
    # rotate=False pins the query to the very END of the registry so it
    # never enters the driver's 50-query sampled prefix: used for the
    # rows-only (oracle=None) originals whose correctness evidence is a
    # hash-gated recall companion — a driver row for them would only
    # record "no_oracle", wasting a sample slot (round-8 verdict #8).
    rotate: bool = True

    def oracle_for(self, sf_dir: str) -> str | None:
        if callable(self.oracle):
            return self.oracle(sf_dir)
        return self.oracle


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | Callable[[str], str] | None,
             survey_ref: str = "", doc: str = "", rotate: bool = True):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, survey_ref, doc,
                                    rotate)
        return fn
    return deco


# Hard cap on the ROTATING registry (rotate=True entries). The driver
# samples the first 50 entries per round, so with pure
# staleness-ascending order every rotating query is guaranteed a fresh
# driver row at least every ceil(N/50) rounds; N <= 150 keeps that
# worst-case bound at 3 rounds. Institutionalized in round 9 after 22
# queries went 3+ rounds without a driver row at N=176: adding a query
# past the cap requires consolidating a redundant one first
# (tests/test_rotation.py enforces the cap).
MAX_ROTATING = 150


# Presentation order = rotation policy. The correctness driver samples
# only the FIRST 50 registry entries per round, so ordering decides which
# queries get a fresh driver row. The rule, institutionalized in round 6:
# sort ascending by the last round in which a query had a green driver
# row (compiled into the generated ``_rotation.py`` — regenerate with
# ``python tools/update_rotation.py`` at the start of each round).
# Queries with NO driver history lead. rotate=False entries sort last
# and never enter the prefix (their evidence is a hash-gated companion).
#
# Staleness bound: with MAX_ROTATING <= 150 rotating queries and 50
# slots, pure round-robin guarantees every rotating query a driver row
# at least every 3 rounds. The GATE tier below — the pipelines
# exercising the widest operator surface (full ingest merges, the
# durable txn sink, the LS/L3VPN CDC flows, v6 LPM/containment,
# streaming dedup/monitoring, time travel) — gets a hard ≤ 2-round
# bound: once a gate query's row is ≥ 2 rounds old it is forced into
# the sampled prefix ahead of everything (they are cheap — the whole
# tier re-checks in ~4 min).
#
# Tie-break inside the freshest cohort: gate pipelines also fill any
# slots remaining after all staler queries.
_GATE_PRIORITY: tuple[str, ...] = (
    "q_bmp_rib_merge",
    "q_bmp_txn_store",
    "q_bmp_txn_bucketed",
    "q_bmp_l3vpn_view",
    "q_bmp_ls_links",
    "q_bmp_ls_prefix",
    "q_bmp_collector",
    "q_bmp_peer_events",
    "q_lpm_geo_join6",
    "q_rpki_containment6",
    "q_l3vpn_chg_stats",
    "q_asof_enrich",
    "q_stream_doc_dedup",
    # commit-log time travel: read_at version pinning + snapshot diff
    "q_store_time_diff",
    # round-9 additions (verdict #9): the durable-store ops report and
    # the streaming monitoring pair that define the round-8+ headline
    "q_store_stats",
    "q_stream_rate_anomaly",
    "q_stream_drift_psi",
)


def all_specs() -> dict[str, QuerySpec]:
    # import side-effect modules that register queries
    from . import queries_bmp  # noqa: F401
    from . import queries_core  # noqa: F401
    from . import queries_curate  # noqa: F401
    from . import queries_net  # noqa: F401
    from . import queries_olap  # noqa: F401
    from . import queries_stream  # noqa: F401
    from . import queries_text  # noqa: F401
    from ._rotation import LAST_DRIVER_ROW

    reg_order = {name: i for i, name in enumerate(_REGISTRY)}
    gate_rank = {name: i for i, name in enumerate(_GATE_PRIORITY)}
    max_round = max(LAST_DRIVER_ROW.values(), default=0)

    def key(name: str):
        # rows-only companions never enter the sampled prefix
        if not _REGISTRY[name].rotate:
            return (1 << 30, 0, reg_order[name])
        last = LAST_DRIVER_ROW.get(name, 0)  # never-proven queries lead
        # hard bound for the gate tier: a gate pipeline whose driver row
        # is >= 2 rounds old jumps to the very front of the prefix
        if name in gate_rank and last and max_round - last >= 2:
            return (-1, gate_rank[name], reg_order[name])
        # otherwise gate pipelines jump the queue only within the
        # freshest cohort (never displacing a staler query's slot)
        gate = gate_rank.get(name, len(_GATE_PRIORITY)) \
            if last == max_round else len(_GATE_PRIORITY)
        return (last, gate, reg_order[name])

    return {name: _REGISTRY[name] for name in sorted(_REGISTRY, key=key)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle_for(DRIVER_SF_DIR)
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
