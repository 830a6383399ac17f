"""BMP ingest semantics against the reference's behavior
(FIXTURES.md §3 scenario coverage)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from obmp_psql_spark.ingest import (
    apply_base_attribute,
    apply_collector,
    apply_peer,
    apply_router,
    apply_unicast_prefix,
)
from obmp_psql_spark.schemas import MESSAGE_SCHEMAS, TABLE_SCHEMAS


def ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def msgs(spark, mtype: str, rows: list[dict]):
    schema = MESSAGE_SCHEMAS[mtype]
    filled = [tuple(r.get(f.name) for f in schema.fields) for r in rows]
    return spark.createDataFrame(filled, schema)


def empty(spark, table: str):
    return spark.createDataFrame([], TABLE_SCHEMAS[table])


def upx(action, hash_, peer, attr, t, prefix="10.1.0.0", plen=16, origin=65001, **kw):
    base = dict(action=action, hash=hash_, peer_hash=peer, base_attr_hash=attr,
                is_ipv4=True, origin_asn=origin, prefix=prefix, prefix_len=plen,
                is_withdrawn=(action == "del"), path_id=0, labels="",
                is_pre_policy=False, is_adj_rib_in=True, timestamp=t)
    base.update(kw)
    return base


# ---------------------------------------------------------------------------
# scenario 1 + 9: advertise -> withdraw -> re-advertise; len filter
# ---------------------------------------------------------------------------

def test_withdraw_keeps_attrs_and_logs_old(spark):
    rib = empty(spark, "ip_rib")
    logs = []

    b1 = msgs(spark, "unicast_prefix", [
        upx("add", "r1", "p1", "attrA", ts(0)),
        upx("add", "bad", "p1", "attrA", ts(0), plen=200),  # scenario 9
    ])
    rib, log1 = apply_unicast_prefix(rib, b1)
    rib = rib.cache()
    logs.append(log1.collect())

    state = {r.hash_id: r for r in rib.collect()}
    assert set(state) == {"r1"}  # prefix_len>128 dropped
    assert state["r1"].base_attr_hash_id == "attrA"
    assert state["r1"].first_added_timestamp == ts(0)
    assert logs[0] == []  # insert does not fire the update trigger

    b2 = msgs(spark, "unicast_prefix", [
        upx("del", "r1", "p1", "", ts(1)),
    ])
    rib, log2 = apply_unicast_prefix(rib, b2)
    rib = rib.cache()
    row = rib.collect()[0]
    # withdraw retains last attrs (UnicastPrefixQuery.java:35-40)
    assert row.is_withdrawn is True
    assert row.base_attr_hash_id == "attrA"
    assert row.origin_as == 65001
    assert row.timestamp == ts(1)
    assert row.first_added_timestamp == ts(0)
    l2 = log2.collect()
    assert len(l2) == 1 and l2[0].is_withdrawn is True
    assert l2[0].base_attr_hash_id == "attrA"  # logs OLD attr

    b3 = msgs(spark, "unicast_prefix", [
        upx("add", "r1", "p1", "attrB", ts(2), origin=65002),
    ])
    rib, log3 = apply_unicast_prefix(rib, b3)
    row = rib.collect()[0]
    assert row.is_withdrawn is False and row.base_attr_hash_id == "attrB"
    assert row.origin_as == 65002
    l3 = log3.collect()
    assert len(l3) == 1 and l3[0].base_attr_hash_id == "attrB"


def test_same_attr_readvertise_no_log(spark):
    rib = empty(spark, "ip_rib")
    rib, _ = apply_unicast_prefix(rib, msgs(spark, "unicast_prefix", [
        upx("add", "r1", "p1", "attrA", ts(0))]))
    rib, log = apply_unicast_prefix(rib.cache(), msgs(spark, "unicast_prefix", [
        upx("add", "r1", "p1", "attrA", ts(1))]))
    assert log.collect() == []  # unchanged state+attr -> trigger WHEN false
    assert rib.collect()[0].timestamp == ts(1)  # but timestamp advanced


# ---------------------------------------------------------------------------
# scenario 3: last-write-wins within one batch
# ---------------------------------------------------------------------------

def test_batch_state_compression_last_wins(spark):
    rib = empty(spark, "ip_rib")
    rib, _ = apply_unicast_prefix(rib, msgs(spark, "unicast_prefix", [
        upx("add", "r1", "p1", "attrA", ts(0, 1)),
        upx("add", "r1", "p1", "attrB", ts(0, 5)),
        upx("add", "r1", "p1", "attrC", ts(0, 3)),
    ]))
    rows = rib.collect()
    assert len(rows) == 1 and rows[0].base_attr_hash_id == "attrB"


# ---------------------------------------------------------------------------
# scenario 2: duplicate base_attribute -> one row
# ---------------------------------------------------------------------------

def test_base_attr_insert_if_absent(spark):
    attrs = empty(spark, "base_attrs")
    mk = lambda t, med: dict(  # noqa: E731
        hash="attrA", peer_hash="p1", origin="igp", as_path="65001 174 3356",
        as_path_len=3, origin_asn=3356, next_hop="10.0.0.1", med=med,
        local_pref=100, is_atomic_agg=False, aggregator="",
        community_list="65001:100 65001:200", ext_community_list="",
        large_community_list="", cluster_list="", originator_id="",
        nexthop_is_ipv4=True, timestamp=t)
    attrs = apply_base_attribute(attrs, msgs(spark, "base_attribute", [mk(ts(0), 10)]))
    attrs = apply_base_attribute(attrs.cache(), msgs(spark, "base_attribute", [mk(ts(5), 99)]))
    rows = attrs.collect()
    assert len(rows) == 1
    assert rows[0].med == 10  # first wins (ON CONFLICT DO NOTHING)
    assert rows[0].as_path == [65001, 174, 3356]
    assert rows[0].community_list == ["65001:100", "65001:200"]


# ---------------------------------------------------------------------------
# scenario 4 + 6: peer up flush + LocRib backfill
# ---------------------------------------------------------------------------

def peer_msg(action, hash_, router, t, **kw):
    base = dict(action=action, hash=hash_, router_hash=router, peer_rd="",
                is_ipv4=True, peer_ip="192.0.2.1", name="peer1",
                peer_bgp_id="192.0.2.1", peer_asn=65001, is_l3vpn=False,
                is_pre_policy=False, local_ip="10.0.0.1",
                local_bgp_id="10.0.0.1", local_port=179, local_holddown=90,
                local_asn=65000, peer_port=4321, peer_holddown=90,
                advertised_cap="MP", received_cap="MP", bmp_down_reason=0,
                bgp_error_code=0, bgp_error_subcode=0, bgp_error_text="",
                is_loc_rib=False, is_loc_rib_filtered=False, table_name="",
                timestamp=t)
    base.update(kw)
    return base


def router_msg(action, hash_, t, **kw):
    base = dict(action=action, hash=hash_, name="rtr1", ip_address="198.51.100.1",
                description="d", term_code=0, term_reason="", term_data="",
                init_data="", bgp_id="198.51.100.1", collector_hash="c1",
                timestamp=t)
    base.update(kw)
    return base


def test_peer_up_flushes_stale_rib(spark):
    routers = empty(spark, "routers")
    rib = empty(spark, "ip_rib")
    peers = empty(spark, "bgp_peers")
    rib, _ = apply_unicast_prefix(rib, msgs(spark, "unicast_prefix", [
        upx("add", "r1", "p1", "attrA", ts(0)),
        upx("add", "r2", "p1", "attrA", ts(6)),
        upx("add", "r3", "p2", "attrA", ts(0)),
    ]))
    peers, rib, log = apply_peer(
        peers, rib.cache(), routers,
        msgs(spark, "peer", [peer_msg("up", "p1", "rt1", ts(5))]))
    left = {r.hash_id for r in rib.collect()}
    assert left == {"r2", "r3"}  # r1 older than peer-up flushed; other peer kept
    ev = log.collect()
    assert len(ev) == 1 and ev[0].state == "up" and ev[0].bgp_err_code is None


def test_locrib_backfill_from_router(spark):
    routers = empty(spark, "routers")
    peers = empty(spark, "bgp_peers")
    routers, peers = apply_router(
        routers, peers, msgs(spark, "router", [router_msg("init", "rt1", ts(0))]))
    peers, _, _ = apply_peer(
        peers, empty(spark, "ip_rib"), routers.cache(),
        msgs(spark, "peer", [peer_msg(
            "up", "p9", "rt1", ts(1), peer_ip="0.0.0.0", peer_bgp_id="0.0.0.0",
            name="", is_loc_rib=True)]))
    row = peers.collect()[0]
    assert row.name == "rtr1"  # router name backfilled (9_triggers.sql:46-49)
    assert row.peer_bgp_id == "198.51.100.1"


# ---------------------------------------------------------------------------
# scenario 5: router init + collector cascade
# ---------------------------------------------------------------------------

def test_router_init_downs_stale_peers_once(spark):
    routers = empty(spark, "routers")
    peers = empty(spark, "bgp_peers")
    peers, _, _ = apply_peer(peers, empty(spark, "ip_rib"), routers,
                             msgs(spark, "peer", [peer_msg("up", "p1", "rt1", ts(0))]))
    # first connection: stale peers (ts < init ts) set down
    routers, peers = apply_router(
        routers, peers.cache(),
        msgs(spark, "router", [router_msg("init", "rt1", ts(1))]))
    assert peers.collect()[0].state == "down"
    assert routers.collect()[0].conn_count == 1

    # peer comes back up, then a SECOND connection init arrives:
    # cascade must NOT fire again (connection_count > 0)
    peers, _, _ = apply_peer(peers.cache(), empty(spark, "ip_rib"), routers.cache(),
                             msgs(spark, "peer", [peer_msg("up", "p1", "rt1", ts(2))]))
    routers, peers = apply_router(
        routers.cache(), peers.cache(),
        msgs(spark, "router", [router_msg("init", "rt1", ts(3))]))
    assert peers.collect()[0].state == "up"
    assert routers.collect()[0].conn_count == 2


def test_collector_start_downs_routers(spark):
    collectors = empty(spark, "collectors")
    routers = empty(spark, "routers")
    routers, _ = apply_router(routers, empty(spark, "bgp_peers"),
                              msgs(spark, "router", [router_msg("init", "rt1", ts(0))]))
    collectors, routers = apply_collector(
        collectors, routers.cache(),
        msgs(spark, "collector", [dict(action="started", hash="c1", admin_id="a",
                                       router_list="", router_count=0,
                                       timestamp=ts(1))]))
    assert routers.collect()[0].state == "down"
    assert collectors.collect()[0].state == "up"


# ---------------------------------------------------------------------------
# router merge: term keeps name/description/init_data
# ---------------------------------------------------------------------------

def test_router_term_keeps_identity_fields(spark):
    routers = empty(spark, "routers")
    routers, _ = apply_router(routers, empty(spark, "bgp_peers"),
                              msgs(spark, "router", [router_msg("init", "rt1", ts(0))]))
    routers, _ = apply_router(
        routers.cache(), empty(spark, "bgp_peers"),
        msgs(spark, "router", [router_msg("term", "rt1", ts(1), name="ZZZ",
                                          description="gone", term_code=2,
                                          term_reason="shutdown")]))
    row = routers.collect()[0]
    assert row.state == "down"
    assert row.name == "rtr1"  # CASE excluded.state keeps old on down
    assert row.description == "d"
    assert row.term_reason_code == 2 and row.term_reason_text == "shutdown"


def test_v6_peer_geo_and_rpki_enrichment_end_to_end(spark):
    """The v6 enrichment gap (round-2 verdict #1): a v6 peer gets a
    geo_ip_start and a v6 global-rib prefix gets an rpki_origin_as
    through the REAL ingest/enrichment paths — not just gate queries."""
    from obmp_psql_spark.operators import global_rib as G
    from obmp_psql_spark.sources.lookups import _with_bounds

    # geo table: a v4 /16, a v6 /32, and both catch-alls
    geo = _with_bounds(spark.createDataFrame(
        [(4, "192.0.2.0/24"), (6, "2001:db8::/32"),
         (4, "0.0.0.0/0"), (6, "::/0")],
        "family short, ip string"))
    routers, _ = apply_router(
        empty(spark, "routers"), empty(spark, "bgp_peers"),
        msgs(spark, "router", [router_msg("init", "rt1", ts(0))]), geo_ip=geo)
    peers, _, _ = apply_peer(
        empty(spark, "bgp_peers"), empty(spark, "ip_rib"), routers,
        msgs(spark, "peer", [
            peer_msg("up", "p4", "rt1", ts(1)),  # 192.0.2.1
            peer_msg("up", "p6", "rt1", ts(1), is_ipv4=False,
                     peer_ip="2001:db8::42", peer_bgp_id="10.0.0.9"),
            peer_msg("up", "p6b", "rt1", ts(1), is_ipv4=False,
                     peer_ip="fe80::1", peer_bgp_id="10.0.0.8"),
        ]), geo_ip=geo)
    got = {r.hash_id: r.geo_ip_start for r in peers.collect()}
    assert got["p4"] == "192.0.2.0/24"       # most-specific v4
    assert got["p6"] == "2001:db8::/32"      # most-specific v6
    assert got["p6b"] == "::/0"              # v6 catch-all, NOT v4's

    # RPKI: v6 ROA covers a v6 global-rib prefix (family-blind J7)
    rpki = _with_bounds(spark.createDataFrame(
        [("2001:db8::/32", 32, 48, 65010, ts(0)),
         ("10.0.0.0/8", 8, 24, 65020, ts(0))],
        "prefix string, prefix_len short, prefix_len_max short, "
        "origin_as long, timestamp timestamp"), "prefix").drop("masklen")
    rib, _ = apply_unicast_prefix(empty(spark, "ip_rib"), msgs(
        spark, "unicast_prefix", [
            upx("add", "h6", "p6", "a1", ts(1), prefix="2001:db8:1::",
                plen=48, is_ipv4=False),
            upx("add", "h4", "p4", "a1", ts(1), prefix="10.1.0.0", plen=16),
        ]))
    glob = G.merge_global(empty(spark, "global_ip_rib"),
                          G.consolidate(rib, None))
    out = {r.prefix: r.rpki_origin_as
           for r in G.enrich_rpki(glob, rpki, None).collect()}
    assert out["2001:db8:1::"] == 65010
    assert out["10.1.0.0"] == 65020
