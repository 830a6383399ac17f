"""Aggregation jobs, global RIB, and views against reference
semantics (FIXTURES.md §3 scenarios 7, 8, 11) with a DuckDB oracle
for the stats functions."""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from obmp_psql_spark.ingest import apply_unicast_prefix
from obmp_psql_spark.operators import global_rib as G
from obmp_psql_spark.operators import rollup as R
from obmp_psql_spark.schemas import TABLE_SCHEMAS

from .test_bmp_ingest import empty, msgs, ts, upx


def build_rib(spark):
    """3 peers advertise 10.1.0.0/16 (AS 65001), peer2 withdraws;
    one AS_TRANS row; a second prefix from one peer."""
    batch = msgs(spark, "unicast_prefix", [
        upx("add", "h1", "peerA", "a1", ts(0)),
        upx("add", "h2", "peerB", "a1", ts(1)),
        upx("add", "h3", "peerC", "a1", ts(2)),
        upx("add", "h4", "peerA", "a2", ts(3), prefix="10.2.0.0", origin=23456),
        upx("add", "h5", "peerB", "a3", ts(4), prefix="10.3.0.0", origin=65002),
    ])
    rib, _ = apply_unicast_prefix(empty(spark, "ip_rib"), batch)
    rib, _ = apply_unicast_prefix(rib.cache(), msgs(spark, "unicast_prefix", [
        upx("del", "h2", "peerB", "", ts(5)),
    ]))
    return rib.cache()


def test_global_rib_consolidation(spark):
    rib = build_rib(spark)
    out = G.update_global_ip_rib(
        empty(spark, "global_ip_rib"), rib, now=ts(10),
        last_query_time=None).cache()
    rows = {(r.prefix, r.recv_origin_as): r for r in out.collect()}
    # scenario 8: AS_TRANS excluded
    assert ("10.2.0.0", 23456) not in rows
    g = rows[("10.1.0.0", 65001)]
    # scenario 7: peer counts + bool_and
    assert g.num_peers == 3
    assert g.advertising_peers == 2
    assert g.withdrawn_peers == 1
    assert g.is_withdrawn is False  # bool_and over 3 peers
    assert g.timestamp == ts(5)
    assert g.first_added_timestamp == ts(0)

    # all peers withdraw -> bool_and true; purge after 4h drops it
    rib2, _ = apply_unicast_prefix(rib, msgs(spark, "unicast_prefix", [
        upx("del", "h1", "peerA", "", ts(6)),
        upx("del", "h3", "peerC", "", ts(7)),
    ]))
    out2 = G.update_global_ip_rib(out, rib2, now=ts(10), last_query_time=ts(0))
    g2 = {(r.prefix, r.recv_origin_as): r for r in out2.collect()}[("10.1.0.0", 65001)]
    assert g2.is_withdrawn is True and g2.advertising_peers == 0
    purged = G.purge_global_ip_rib(out2, now=ts(7) + dt.timedelta(hours=5))
    assert ("10.1.0.0", 65001) not in {(r.prefix, r.recv_origin_as)
                                       for r in purged.collect()}


def test_rpki_irr_enrichment(spark):
    rib = build_rib(spark)
    glob = G.consolidate(rib, None)
    glob = G.merge_global(empty(spark, "global_ip_rib"), glob)
    info_route = spark.createDataFrame(
        [("10.1.0.0", 16, "route-obj", 65001, "RADB", ts(0))],
        "prefix string, prefix_len short, descr string, origin_as long, source string, timestamp timestamp")
    # ROA 10.0.0.0/8 maxlen 24 origin 65001 covers 10.1.0.0/16
    rpki = spark.createDataFrame(
        [("10.0.0.0/8", 8, 24, 65001, ts(0), 167772160, 184549375,
          0, 167772160, 0, 184549375)],
        TABLE_SCHEMAS["rpki_validator"])
    out = G.enrich_rpki(G.enrich_irr(glob, info_route, None), rpki, None)
    rows = {(r.prefix, r.recv_origin_as): r for r in out.collect()}
    g = rows[("10.1.0.0", 65001)]
    assert g.irr_origin_as == 65001 and g.irr_source == "RADB"
    assert g.rpki_origin_as == 65001
    assert rows[("10.3.0.0", 65002)].irr_origin_as is None
    assert rows[("10.3.0.0", 65002)].rpki_origin_as == 65001  # /8 covers it


def test_chg_stats_match_duckdb_oracle(spark):
    """Scenario 11: buckets across >=3 intervals, DuckDB implements
    the reference SQL (2_aggregations.sql:91-130) as the oracle."""
    batch = msgs(spark, "unicast_prefix", [
        upx("add", f"h{i}", f"peer{i % 2}", f"a{i}", ts(0, i),
            prefix=f"10.{i % 3}.0.0", origin=65000 + i % 2)
        for i in range(40)
    ])
    rib, log = apply_unicast_prefix(empty(spark, "ip_rib"), batch)
    # attr-change re-advertisements across minutes 1..6 -> UPDATE log
    # rows in multiple buckets (inserts alone never log, AFTER UPDATE)
    rib, log1 = apply_unicast_prefix(rib.cache(), msgs(spark, "unicast_prefix", [
        upx("add", f"h{i}", f"peer{i % 2}", f"b{i}", ts(1 + i % 6, (i * 13) % 60),
            prefix=f"10.{i % 3}.0.0", origin=65000 + i % 2)
        for i in range(40)
    ]))
    log = log.unionByName(log1)
    rib2, log2 = apply_unicast_prefix(rib.cache(), msgs(spark, "unicast_prefix", [
        upx("del", f"h{i}", f"peer{i % 2}", "", ts(7, i))
        for i in range(0, 40, 3)
    ]))
    full_log = log.unionByName(log2).cache()
    now = ts(9)
    window = dt.timedelta(minutes=10)

    bypeer = R.chg_stats_bypeer(full_log, now, window).toPandas()
    byasn = R.chg_stats_byasn(full_log, now, window).toPandas()
    byprefix = R.chg_stats_byprefix(full_log, now, window).toPandas()

    con = duckdb.connect()
    con.register("log", full_log.toPandas())
    hi60 = R.floor_ts(now, 60)
    oracle_bypeer = con.execute(f"""
        SELECT make_timestamp(CAST(floor(epoch(timestamp)/60)*60 AS BIGINT)*1000000) AS interval_time,
               peer_hash_id,
               count(CASE WHEN is_withdrawn THEN 1 END) AS withdraws,
               count(CASE WHEN NOT is_withdrawn THEN 1 END) AS updates
        FROM log
        WHERE timestamp >= TIMESTAMP '{hi60 - window}' AND timestamp < TIMESTAMP '{hi60}'
        GROUP BY 1, 2
    """).fetchdf()
    key = ["interval_time", "peer_hash_id"]
    a = bypeer.sort_values(key).reset_index(drop=True)
    b = oracle_bypeer.sort_values(key).reset_index(drop=True)[a.columns]
    assert a.astype(str).equals(b.astype(str)), f"\n{a}\nvs\n{b}"
    assert a.interval_time.nunique() >= 3  # scenario 11: >=3 buckets
    assert len(byasn) >= len(a)  # extra origin_as key fans out
    assert byprefix.interval_time.nunique() >= 2  # 120-s buckets

    # A8 re-agg over A1 output
    rates = R.peer_update_counts(
        spark.createDataFrame(bypeer), now, window).toPandas()
    assert set(rates.peer_hash_id) == {"peer0", "peer1"}
    assert (rates.max_updates >= rates.min_updates).all()


def test_views_layer(spark):
    from obmp_psql_spark.plans.views import register_views

    rib = build_rib(spark)
    batch_attrs = msgs(spark, "base_attribute", [
        dict(hash=h, peer_hash=p, origin="igp", as_path="65001 174",
             as_path_len=2, origin_asn=65001, next_hop="10.0.0.1", med=0,
             local_pref=100, is_atomic_agg=False, aggregator="",
             community_list="", ext_community_list="", large_community_list="",
             cluster_list="", originator_id="", nexthop_is_ipv4=True,
             timestamp=ts(0))
        for h, p in [("a1", "peerA"), ("a1", "peerB"), ("a1", "peerC"),
                     ("a2", "peerA"), ("a3", "peerB")]
    ])
    from obmp_psql_spark.ingest import apply_base_attribute, apply_peer, apply_router
    attrs = apply_base_attribute(empty(spark, "base_attrs"), batch_attrs)
    routers, _ = apply_router(
        empty(spark, "routers"), empty(spark, "bgp_peers"),
        msgs(spark, "router", [
            dict(action="init", hash="rt1", name="", ip_address="198.51.100.9",
                 description="", term_code=0, term_reason="", term_data="",
                 init_data="", bgp_id="198.51.100.9", collector_hash="c1",
                 timestamp=ts(0))]))
    from .test_bmp_ingest import peer_msg
    peers, rib, _ = apply_peer(
        empty(spark, "bgp_peers"), rib, routers,
        msgs(spark, "peer", [
            peer_msg("up", p, "rt1", ts(0), name="", peer_ip=f"192.0.2.{i}")
            for i, p in enumerate(["peerA", "peerB", "peerC"], start=1)]))

    register_views(spark, {
        "ip_rib": rib, "bgp_peers": peers, "base_attrs": attrs,
        "routers": routers, "info_asn": empty(spark, "info_asn"),
        "ip_rib_log": empty(spark, "ip_rib_log"),
    })
    routes = spark.sql("""
        SELECT router_name, peer_name, prefix, origin_as, as_path, is_withdrawn
        FROM v_ip_routes WHERE prefix = '10.1.0.0' ORDER BY peer_name
    """).collect()
    assert len(routes) == 3
    # router has empty name -> host(ip) fallback (P4)
    assert routes[0].router_name == "198.51.100.9"
    assert routes[0].as_path == [65001, 174]
    assert {r.is_withdrawn for r in routes} == {True, False}

    vp = spark.sql("SELECT peer_name, router_state FROM v_peers").collect()
    assert len(vp) == 3
