"""The view layer (reference: database/8_views.sql, 10_l3vpn.sql).

Each builder takes the state DataFrames and returns the view
DataFrame; ``register_views`` publishes them as temp views so
analysts run ``spark.sql("SELECT * FROM v_ip_routes WHERE ...")``
exactly like the Postgres originals. Catalyst inlines the view,
broadcasts the dimension joins, and prunes columns/partitions —
the Postgres GIST-index nested loop becomes a broadcast hash join
plus parquet data skipping on (prefix_start, prefix_end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import net


def _name_or_host(name, addr):
    return F.when(F.length(name) > 0, name).otherwise(net.host(addr))


def v_peers(peers: DataFrame, routers: DataFrame, info_asn: DataFrame) -> DataFrame:
    """8_views.sql:9-29."""
    p, rtr = peers.alias("p"), routers.alias("rtr")
    w = F.broadcast(info_asn.select(F.col("asn").alias("__asn"),
                                    F.col("as_name").alias("as_name")))
    return (
        p.join(F.broadcast(rtr), F.col("p.router_hash_id") == F.col("rtr.hash_id"))
        .join(w, F.col("p.peer_as") == F.col("__asn"), "left")
        .select(
            _name_or_host(F.col("rtr.name"), F.col("rtr.ip_address")).alias("router_name"),
            F.col("rtr.ip_address").alias("router_ip"),
            F.col("p.local_ip").alias("local_ip"),
            F.col("p.local_port").alias("local_port"),
            F.col("p.local_asn").alias("local_asn"),
            F.col("p.local_bgp_id").alias("local_bgp_id"),
            _name_or_host(F.col("p.name"), F.col("p.peer_addr")).alias("peer_name"),
            F.col("p.peer_addr").alias("peer_ip"),
            F.col("p.remote_port").alias("peer_port"),
            F.col("p.peer_as").alias("peer_asn"),
            F.col("p.peer_bgp_id").alias("peer_bgp_id"),
            F.col("p.local_hold_time").alias("local_hold_time"),
            F.col("p.remote_hold_time").alias("peer_hold_time"),
            F.col("p.state").alias("peer_state"),
            F.col("rtr.state").alias("router_state"),
            F.col("p.is_ipv4").alias("is_peer_ipv4"),
            F.col("p.is_l3vpn_peer").alias("is_peer_vpn"),
            F.col("p.is_pre_policy").alias("is_pre_policy"),
            F.col("p.timestamp").alias("last_modified"),
            F.col("p.bmp_reason").alias("last_bmp_reason_code"),
            F.col("p.bgp_err_code").alias("last_down_code"),
            F.col("p.bgp_err_subcode").alias("last_down_subcode"),
            F.col("p.error_text").alias("last_down_message"),
            F.col("p.sent_capabilities").alias("sent_capabilities"),
            F.col("p.recv_capabilities").alias("recv_capabilities"),
            F.col("as_name"),
            F.col("p.is_loc_rib").alias("is_loc_rib"),
            F.col("p.is_loc_rib_filtered").alias("is_loc_rib_filtered"),
            F.col("p.table_name").alias("table_name"),
            F.col("p.hash_id").alias("peer_hash_id"),
            F.col("rtr.hash_id").alias("router_hash_id"),
            F.col("p.geo_ip_start").alias("geo_ip_start"),
        )
    )


_ATTR_COLS = (
    ("origin", "origin"), ("med", "med"), ("local_pref", "local_pref"),
    ("next_hop", "nh"), ("as_path", "as_path"),
    ("as_path_count", "as_path_count"), ("community_list", "communities"),
    ("ext_community_list", "ext_communities"),
    ("large_community_list", "large_communities"),
    ("cluster_list", "cluster_list"), ("originator_id", "originator"),
    ("aggregator", "aggregator"),
)


def v_ip_routes(ip_rib: DataFrame, peers: DataFrame, base_attrs: DataFrame,
                routers: DataFrame) -> DataFrame:
    """8_views.sql:31-52 — J1: fact ⋈ three dims, composite attr key."""
    r = ip_rib.alias("r")
    p = peers.alias("p")
    attr = base_attrs.alias("attr")
    rtr = routers.alias("rtr")
    return (
        r.join(F.broadcast(p), F.col("r.peer_hash_id") == F.col("p.hash_id"))
        .join(attr, (F.col("attr.hash_id") == F.col("r.base_attr_hash_id"))
              & (F.col("attr.peer_hash_id") == F.col("r.peer_hash_id")))
        .join(F.broadcast(rtr), F.col("p.router_hash_id") == F.col("rtr.hash_id"))
        .select(
            _name_or_host(F.col("rtr.name"), F.col("rtr.ip_address")).alias("router_name"),
            _name_or_host(F.col("p.name"), F.col("p.peer_addr")).alias("peer_name"),
            F.col("r.prefix").alias("prefix"),
            F.col("r.prefix_len").alias("prefix_len"),
            *[F.col(f"attr.{src}").alias(dst) for src, dst in _ATTR_COLS],
            F.col("r.origin_as").alias("origin_as"),
            F.col("p.peer_addr").alias("peer_address"),
            F.col("p.peer_as").alias("peer_asn"),
            F.col("r.is_ipv4").alias("is_ipv4"),
            F.col("p.is_ipv4").alias("is_peer_ipv4"),
            F.col("p.is_l3vpn_peer").alias("is_peer_vpn"),
            F.col("r.timestamp").alias("last_modified"),
            F.col("r.first_added_timestamp").alias("first_added_timestamp"),
            F.col("r.path_id").alias("path_id"),
            F.col("r.labels").alias("labels"),
            F.col("r.hash_id").alias("rib_hash_id"),
            F.col("r.base_attr_hash_id").alias("base_hash_id"),
            F.col("r.peer_hash_id").alias("peer_hash_id"),
            F.col("rtr.hash_id").alias("router_hash_id"),
            F.col("r.is_withdrawn").alias("is_withdrawn"),
            F.col("r.is_pre_policy").alias("is_pre_policy"),
            F.col("r.is_adj_rib_in").alias("is_adj_rib_in"),
        )
    )


def v_ip_routes_history(ip_rib_log: DataFrame, peers: DataFrame,
                        base_attrs: DataFrame, routers: DataFrame) -> DataFrame:
    """8_views.sql:83-105 — J4 over the log + P5 event label."""
    log = ip_rib_log.alias("log")
    p = peers.alias("p")
    attr = base_attrs.alias("attr")
    rtr = routers.alias("rtr")
    return (
        log.join(attr, (F.col("log.base_attr_hash_id") == F.col("attr.hash_id"))
                 & (F.col("log.peer_hash_id") == F.col("attr.peer_hash_id")))
        .join(F.broadcast(p), F.col("log.peer_hash_id") == F.col("p.hash_id"))
        .join(F.broadcast(rtr), F.col("p.router_hash_id") == F.col("rtr.hash_id"))
        .select(
            _name_or_host(F.col("rtr.name"), F.col("rtr.ip_address")).alias("router_name"),
            F.col("rtr.ip_address").alias("router_address"),
            _name_or_host(F.col("p.name"), F.col("p.peer_addr")).alias("peer_name"),
            F.col("log.prefix").alias("prefix"),
            F.col("log.prefix_len").alias("prefix_len"),
            *[F.col(f"attr.{src}").alias(dst) for src, dst in _ATTR_COLS],
            F.col("log.origin_as").alias("origin_as"),
            F.col("p.peer_addr").alias("peer_ip"),
            F.col("p.peer_as").alias("peer_asn"),
            F.col("p.is_ipv4").alias("is_peer_ipv4"),
            F.col("p.is_l3vpn_peer").alias("is_peer_vpn"),
            F.col("log.timestamp").alias("last_modified"),
            F.when(F.col("log.is_withdrawn"), "Withdrawn")
             .otherwise("Advertised").alias("event"),
            F.col("log.base_attr_hash_id").alias("base_attr_hash_id"),
            F.col("log.peer_hash_id").alias("peer_hash_id"),
            F.col("rtr.hash_id").alias("router_hash_id"),
        )
    )


def v_ip_routes_geo(ip_rib: DataFrame, peers: DataFrame, base_attrs: DataFrame,
                    routers: DataFrame, geo_ip: DataFrame) -> DataFrame:
    """8_views.sql:54-80 — J6 geo containment join on active routes,
    family-blind (geo_ip.ip inet covers v4 and v6, 1_base.sql:40-59)."""
    from ..operators.lpm import lpm_join128

    base = v_ip_routes(ip_rib, peers, base_attrs, routers) \
        .filter(~F.col("is_withdrawn"))
    v6 = net.ipv6_to_longs(F.when(~F.col("is_ipv4"), net.host(F.col("prefix"))))
    probes = (
        base.withColumn("__fam", F.when(F.col("is_ipv4"), F.lit(4)).otherwise(F.lit(6)))
        .withColumn("__hi", F.when(F.col("is_ipv4"), F.lit(0).cast("long"))
                             .otherwise(v6["hi"]))
        .withColumn("__lo", F.when(F.col("is_ipv4"),
                                   net.ipv4_to_long(net.host(F.col("prefix"))))
                             .otherwise(v6["lo"]))
    )
    geo = geo_ip.select(
        F.col("ip").alias("geo_ip"), "masklen", "family",
        "start_hi", "start_lo", "end_hi", "end_lo",
        F.col("city"), F.col("stateprov"), F.col("country"),
        F.col("latitude"), F.col("longitude"))
    matched = lpm_join128(
        probes.filter(F.col("__hi").isNotNull() & F.col("__lo").isNotNull()),
        probe_key=["rib_hash_id"], probe_family="__fam",
        probe_hi="__hi", probe_lo="__lo",
        prefixes=geo, masklen_col="masklen", broadcast=True,
    ).select("rib_hash_id", "geo_ip", "city", "stateprov", "country",
             "latitude", "longitude")
    return probes.drop("__fam", "__hi", "__lo") \
        .join(F.broadcast(matched), "rib_hash_id", "left")


def v_ls_nodes(ls_nodes: DataFrame, peers: DataFrame, routers: DataFrame,
               base_attrs: DataFrame) -> DataFrame:
    """8_views.sql:110-123 incl. the P6 pseudo-node regex exclusion."""
    n = ls_nodes.alias("n")
    p = peers.alias("p")
    r = routers.alias("r")
    attr = base_attrs.alias("attr")
    return (
        n.filter(~F.col("n.igp_router_id").rlike(r"\..[1-9A-F]00$")
                 & ~F.col("n.igp_router_id").like("%]"))
        .join(attr, (F.col("n.base_attr_hash_id") == F.col("attr.hash_id"))
              & (F.col("n.peer_hash_id") == F.col("attr.peer_hash_id")), "left")
        .join(F.broadcast(p), F.col("p.hash_id") == F.col("n.peer_hash_id"))
        .join(F.broadcast(r), F.col("p.router_hash_id") == F.col("r.hash_id"))
        .select(
            F.col("r.name").alias("router_name"),
            F.col("r.ip_address").alias("router_ip"),
            F.col("p.name").alias("peer_name"),
            F.col("p.peer_addr").alias("peer_ip"),
            F.col("n.igp_router_id").alias("igp_router_id"),
            F.col("n.name").alias("node_name"),
            F.when(F.col("n.is_withdrawn"), "WITHDRAWN").otherwise("ACTIVE").alias("state"),
            F.when(F.col("n.protocol").isin("OSPFv2", "OSPFv3"),
                   F.col("n.router_id")).otherwise(F.col("n.igp_router_id")).alias("router_id"),
            F.col("n.seq").alias("seq"),
            F.col("n.bgp_ls_id").alias("bgpls_id"),
            F.col("n.ospf_area_id").alias("ospf_area_id"),
            F.col("n.isis_area_id").alias("isis_area_id"),
            F.col("n.protocol").alias("protocol"),
            F.col("n.flags").alias("flags"),
            F.col("n.timestamp").alias("timestamp"),
            F.col("n.asn").alias("asn"),
            F.col("attr.as_path").alias("as_path"),
            F.col("attr.local_pref").alias("local_pref"),
            F.col("attr.med").alias("med"),
            F.col("attr.next_hop").alias("nh"),
            F.col("n.mt_ids").alias("mt_ids"),
            F.col("n.hash_id").alias("hash_id"),
            F.col("n.base_attr_hash_id").alias("base_attr_hash_id"),
            F.col("n.peer_hash_id").alias("peer_hash_id"),
            F.col("r.hash_id").alias("router_hash_id"),
        )
    )


def v_ls_links(ls_links: DataFrame, ls_nodes: DataFrame) -> DataFrame:
    """8_views.sql:126-143 — J3 double self-join into nodes."""
    ln = ls_links.alias("ln")
    localn = ls_nodes.alias("localn")
    remoten = ls_nodes.alias("remoten")
    return (
        ln.join(localn, (F.col("ln.local_node_hash_id") == F.col("localn.hash_id"))
                & (F.col("ln.peer_hash_id") == F.col("localn.peer_hash_id")))
        .join(remoten, (F.col("ln.remote_node_hash_id") == F.col("remoten.hash_id"))
              & (F.col("ln.peer_hash_id") == F.col("remoten.peer_hash_id")))
        .select(
            F.col("localn.name").alias("local_router_name"),
            F.col("remoten.name").alias("remote_router_name"),
            F.col("localn.igp_router_id").alias("local_igp_router_id"),
            F.col("localn.router_id").alias("local_router_id"),
            F.col("remoten.igp_router_id").alias("remote_igp_router_id"),
            F.col("remoten.router_id").alias("remote_router_id"),
            F.col("localn.seq").alias("seq"),
            F.col("localn.bgp_ls_id").alias("bgpls_id"),
            F.when(F.col("ln.protocol").isin("OSPFv2", "OSPFv3"),
                   F.col("localn.ospf_area_id"))
             .otherwise(F.col("localn.isis_area_id")).alias("area_id"),
            F.col("ln.mt_id").alias("mt_id"),
            F.col("ln.interface_addr").alias("interface_ip"),
            F.col("ln.neighbor_addr").alias("neighbor_ip"),
            F.col("ln.is_ipv4").alias("is_ipv4"),
            F.col("ln.protocol").alias("protocol"),
            F.col("ln.igp_metric").alias("igp_metric"),
            F.col("ln.local_link_id").alias("local_link_id"),
            F.col("ln.remote_link_id").alias("remote_link_id"),
            F.col("ln.admin_group").alias("admin_group"),
            F.col("ln.max_link_bw").alias("max_link_bw"),
            F.col("ln.max_resv_bw").alias("max_resv_bw"),
            F.col("ln.unreserved_bw").alias("unreserved_bw"),
            F.col("ln.te_def_metric").alias("te_def_metric"),
            F.col("ln.mpls_proto_mask").alias("mpls_proto_mask"),
            F.col("ln.srlg").alias("srlg"),
            F.col("ln.name").alias("name"),
            F.col("ln.timestamp").alias("timestamp"),
            F.col("ln.local_node_hash_id").alias("local_node_hash_id"),
            F.col("ln.remote_node_hash_id").alias("remote_node_hash_id"),
            F.col("ln.base_attr_hash_id").alias("base_attr_hash_id"),
            F.col("ln.peer_hash_id").alias("peer_hash_id"),
            F.when(F.col("ln.is_withdrawn"), "WITHDRAWN").otherwise("ACTIVE").alias("state"),
        )
    )


def v_ls_prefixes(ls_prefixes: DataFrame, ls_nodes: DataFrame) -> DataFrame:
    """8_views.sql:146-153."""
    lp = ls_prefixes.alias("lp")
    localn = ls_nodes.alias("localn")
    return (
        lp.join(localn, (F.col("localn.peer_hash_id") == F.col("lp.peer_hash_id"))
                & (F.col("lp.local_node_hash_id") == F.col("localn.hash_id")))
        .select(
            F.col("localn.name").alias("local_router_name"),
            F.col("localn.igp_router_id").alias("local_igp_router_id"),
            F.col("localn.router_id").alias("local_router_id"),
            F.col("lp.seq").alias("seq"),
            F.col("lp.mt_id").alias("mt_id"),
            F.col("lp.prefix").alias("prefix"),
            F.col("lp.prefix_len").alias("prefix_len"),
            F.col("lp.ospf_route_type").alias("ospf_route_type"),
            F.col("lp.metric").alias("metric"),
            F.col("lp.protocol").alias("protocol"),
            F.col("lp.timestamp").alias("timestamp"),
            F.col("lp.peer_hash_id").alias("peer_hash_id"),
            F.col("lp.local_node_hash_id").alias("local_node_hash_id"),
            F.when(F.col("lp.is_withdrawn"), "WITHDRAWN").otherwise("ACTIVE").alias("state"),
        )
    )


def v_l3vpn_routes(l3vpn_rib: DataFrame, peers: DataFrame,
                   base_attrs: DataFrame, routers: DataFrame) -> DataFrame:
    """10_l3vpn.sql:81-101 — the J1 shape plus rd/ext-communities
    carried on the rib row rather than the attr row."""
    r = l3vpn_rib.alias("r")
    p = peers.alias("p")
    attr = base_attrs.alias("attr")
    rtr = routers.alias("rtr")
    return (
        r.join(F.broadcast(p), F.col("r.peer_hash_id") == F.col("p.hash_id"))
        .join(attr, (F.col("attr.hash_id") == F.col("r.base_attr_hash_id"))
              & (F.col("attr.peer_hash_id") == F.col("r.peer_hash_id")))
        .join(F.broadcast(rtr), F.col("p.router_hash_id") == F.col("rtr.hash_id"))
        .select(
            _name_or_host(F.col("rtr.name"), F.col("rtr.ip_address")).alias("router_name"),
            _name_or_host(F.col("p.name"), F.col("p.peer_addr")).alias("peer_name"),
            F.col("r.rd").alias("rd"),
            F.col("r.prefix").alias("prefix"),
            F.col("r.prefix_len").alias("prefix_len"),
            F.col("attr.origin").alias("origin"),
            F.col("r.origin_as").alias("origin_as"),
            F.col("attr.med").alias("med"),
            F.col("attr.local_pref").alias("local_pref"),
            F.col("attr.next_hop").alias("nh"),
            F.col("attr.as_path").alias("as_path"),
            F.col("attr.as_path_count").alias("as_path_count"),
            F.col("attr.community_list").alias("communities"),
            F.col("r.ext_community_list").alias("ext_communities"),
            F.col("attr.large_community_list").alias("large_communities"),
            F.col("attr.cluster_list").alias("cluster_list"),
            F.col("attr.aggregator").alias("aggregator"),
            F.col("p.peer_addr").alias("peer_address"),
            F.col("p.peer_as").alias("peer_asn"),
            F.col("r.is_ipv4").alias("is_ipv4"),
            F.col("p.is_ipv4").alias("is_peer_ipv4"),
            F.col("p.is_l3vpn_peer").alias("is_peer_vpn"),
            F.col("r.timestamp").alias("last_modified"),
            F.col("r.first_added_timestamp").alias("first_added_timestamp"),
            F.col("r.path_id").alias("path_id"),
            F.col("r.labels").alias("labels"),
            F.col("r.hash_id").alias("rib_hash_id"),
            F.col("r.base_attr_hash_id").alias("base_hash_id"),
            F.col("r.peer_hash_id").alias("peer_hash_id"),
            F.col("rtr.hash_id").alias("router_hash_id"),
            F.col("r.is_withdrawn").alias("is_withdrawn"),
            F.col("r.is_pre_policy").alias("is_pre_policy"),
            F.col("r.is_adj_rib_in").alias("is_adj_rib_in"),
        )
    )


def v_l3vpn_routes_history(l3vpn_rib_log: DataFrame, peers: DataFrame,
                           base_attrs: DataFrame, routers: DataFrame) -> DataFrame:
    """10_l3vpn.sql:103-122."""
    r = l3vpn_rib_log.alias("r")
    p = peers.alias("p")
    attr = base_attrs.alias("attr")
    rtr = routers.alias("rtr")
    return (
        r.join(F.broadcast(p), F.col("r.peer_hash_id") == F.col("p.hash_id"))
        .join(attr, (F.col("attr.hash_id") == F.col("r.base_attr_hash_id"))
              & (F.col("attr.peer_hash_id") == F.col("r.peer_hash_id")))
        .join(F.broadcast(rtr), F.col("p.router_hash_id") == F.col("rtr.hash_id"))
        .select(
            _name_or_host(F.col("rtr.name"), F.col("rtr.ip_address")).alias("router_name"),
            _name_or_host(F.col("p.name"), F.col("p.peer_addr")).alias("peer_name"),
            F.col("r.rd").alias("rd"),
            F.col("r.prefix").alias("prefix"),
            F.col("r.prefix_len").alias("prefix_len"),
            F.col("attr.origin").alias("origin"),
            F.col("r.origin_as").alias("origin_as"),
            F.col("attr.med").alias("med"),
            F.col("attr.local_pref").alias("local_pref"),
            F.col("attr.next_hop").alias("nh"),
            F.col("attr.as_path").alias("as_path"),
            F.col("attr.as_path_count").alias("as_path_count"),
            F.col("attr.community_list").alias("communities"),
            F.col("r.ext_community_list").alias("ext_communities"),
            F.col("p.peer_addr").alias("peer_address"),
            F.col("p.peer_as").alias("peer_asn"),
            F.col("r.timestamp").alias("last_modified"),
            F.when(F.col("r.is_withdrawn"), "Withdrawn")
             .otherwise("Advertised").alias("event"),
            F.col("r.base_attr_hash_id").alias("base_hash_id"),
            F.col("r.peer_hash_id").alias("peer_hash_id"),
            F.col("rtr.hash_id").alias("router_hash_id"),
        )
    )


def register_views(spark: SparkSession, tables: dict[str, DataFrame]) -> None:
    """Publish the view layer over a dict of state DataFrames (keys =
    reference table names)."""
    t = tables
    v_peers(t["bgp_peers"], t["routers"], t["info_asn"]) \
        .createOrReplaceTempView("v_peers")
    v_ip_routes(t["ip_rib"], t["bgp_peers"], t["base_attrs"], t["routers"]) \
        .createOrReplaceTempView("v_ip_routes")
    v_ip_routes_history(t["ip_rib_log"], t["bgp_peers"], t["base_attrs"],
                        t["routers"]).createOrReplaceTempView("v_ip_routes_history")
    if "geo_ip" in t:
        v_ip_routes_geo(t["ip_rib"], t["bgp_peers"], t["base_attrs"],
                        t["routers"], t["geo_ip"]) \
            .createOrReplaceTempView("v_ip_routes_geo")
    if "ls_nodes" in t:
        v_ls_nodes(t["ls_nodes"], t["bgp_peers"], t["routers"],
                   t["base_attrs"]).createOrReplaceTempView("v_ls_nodes")
        v_ls_links(t["ls_links"], t["ls_nodes"]) \
            .createOrReplaceTempView("v_ls_links")
        v_ls_prefixes(t["ls_prefixes"], t["ls_nodes"]) \
            .createOrReplaceTempView("v_ls_prefixes")
    if "l3vpn_rib" in t:
        v_l3vpn_routes(t["l3vpn_rib"], t["bgp_peers"], t["base_attrs"],
                       t["routers"]).createOrReplaceTempView("v_l3vpn_routes")
        v_l3vpn_routes_history(
            t["l3vpn_rib_log"], t["bgp_peers"], t["base_attrs"],
            t["routers"]).createOrReplaceTempView("v_l3vpn_routes_history")
