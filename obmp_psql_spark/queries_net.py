"""Network-operator demonstrations: the IP toolkit (F2/F3/F4/F12),
the LPM geo join (J5/J6/W1) and the RPKI containment join (J7) —
SURVEY.md §2.3/§2.7 — expressed over the driver tables by
synthesizing deterministic IP/prefix columns from integer keys.

The Spark side goes through the real string parsers in
``functions.net`` and the bucketed range join in ``operators.lpm``;
the DuckDB oracle recomputes the same semantics in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import net
from .operators.lpm import (containment_join, containment_join128,
                            lpm_join, lpm_join128)
from .registry import register
from .session import load_tables, tiny_df

# 2001:db8:: upper 64 bits; 2^64 and 2^48 as DuckDB-side literals
_V6DOC = 2306139568115548160  # 0x20010db8_00000000
_B64 = "18446744073709551616::HUGEINT"
_P48 = 281474976710656  # 2^48


# ---------------------------------------------------------------------------
# F2/F3/F4/F12: scalar net functions over synthesized address strings
# ---------------------------------------------------------------------------

@register(
    "q_net_functions",
    oracle="""
    WITH s AS (
      SELECT s_suppkey, s_nationkey,
             CASE WHEN s_suppkey % 4 = 0
                  THEN 'fe80::' || CAST(s_suppkey AS VARCHAR)
                  ELSE '10.1.' || CAST(s_suppkey % 256 AS VARCHAR) || '.0/24'
             END AS ip_str
      FROM supplier
    ), p AS (
      SELECT *,
             string_split(ip_str, '/')[1] AS host,
             CASE WHEN contains(ip_str, ':') THEN 6 ELSE 4 END AS family
      FROM s
    ), b AS (
      SELECT *,
             CASE WHEN family = 4 THEN
               CAST(string_split(host,'.')[1] AS BIGINT)*16777216
             + CAST(string_split(host,'.')[2] AS BIGINT)*65536
             + CAST(string_split(host,'.')[3] AS BIGINT)*256
             + CAST(string_split(host,'.')[4] AS BIGINT) END AS base,
             CASE WHEN family = 4
                  THEN COALESCE(TRY_CAST(string_split(ip_str,'/')[2] AS INT), 32)
             END AS mask_len
      FROM p
    )
    SELECT s_suppkey, ip_str, host, family, mask_len,
           base - (base % (1::BIGINT << (32 - mask_len))) AS prefix_start,
           base - (base % (1::BIGINT << (32 - mask_len)))
               + (1::BIGINT << (32 - mask_len)) - 1 AS prefix_end,
           CAST(s_suppkey AS BIGINT) * 65536 + s_nationkey AS asn_long
    FROM b
    """,
    survey_ref="F2/F3/F4 (8_views.sql:11,76; 2_aggregations.sql:371), F12 (gen_whois_route.py:136-141)",
    doc="host()/family()/prefix-bounds/dot-ASN as native column exprs",
)
def q_net_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_tables(spark, sf_dir, ("supplier",))["supplier"]
    df = s.withColumn(
        "ip_str",
        F.when(F.col("s_suppkey") % 4 == 0,
               F.concat(F.lit("fe80::"), F.col("s_suppkey").cast("string")))
         .otherwise(F.concat(F.lit("10.1."), (F.col("s_suppkey") % 256).cast("string"),
                             F.lit(".0/24"))),
    )
    start, end = net.ipv4_prefix_bounds(F.col("ip_str"))
    fam = net.ip_family(F.col("ip_str"))
    v4 = fam == 4
    return df.select(
        "s_suppkey", "ip_str",
        net.host(F.col("ip_str")).alias("host"),
        fam.alias("family"),
        F.when(v4, net.masklen(F.col("ip_str"))).alias("mask_len"),
        F.when(v4, start).alias("prefix_start"),
        F.when(v4, end).alias("prefix_end"),
        net.asn_dot_to_long(
            F.concat_ws(".", F.col("s_suppkey"), F.col("s_nationkey"))).alias("asn_long"),
    )


# ---------------------------------------------------------------------------
# J5/J6/W1: longest-prefix-match geo join (find_geo_ip, 1_base.sql:66-81)
# ---------------------------------------------------------------------------

_LPM_ORACLE = """
WITH probes AS (
  SELECT DISTINCT user_id,
         167772160
         + ((user_id * 7) % 256) * 65536
         + ((user_id * 13) % 256) * 256
         + ((user_id * 29) % 256) AS ip_num
  FROM events
), raw_geo AS (
  SELECT 16 + (p_partkey % 2) * 8 AS mask_len,
         167772160
         + ((p_partkey * 3) % 256) * 65536
         + CASE WHEN p_partkey % 2 = 1 THEN ((p_partkey * 5) % 256) * 256 ELSE 0 END
           AS prefix_start,
         p_partkey
  FROM part
  UNION ALL
  SELECT 8, 167772160, -1
), geo AS (
  SELECT prefix_start, mask_len,
         prefix_start + (1::BIGINT << (32 - mask_len)) - 1 AS prefix_end,
         CAST(min(p_partkey) AS BIGINT) AS geo_id
  FROM raw_geo GROUP BY 1, 2
)
SELECT user_id, ip_num, mask_len, geo_id FROM (
  SELECT p.user_id, p.ip_num, g.mask_len, g.geo_id,
         row_number() OVER (PARTITION BY p.user_id
                            ORDER BY g.mask_len DESC, g.prefix_start) AS rn
  FROM probes p JOIN geo g
    ON p.ip_num BETWEEN g.prefix_start AND g.prefix_end
) WHERE rn = 1
"""


@register(
    "q_lpm_geo_join",
    oracle=_LPM_ORACLE,
    survey_ref="J5/J6/W1/O1 (1_base.sql:66-81 find_geo_ip ORDER BY ... LIMIT 1; 8_views.sql:76)",
    doc="longest-prefix match via bucketed range equi-join + windowed top-1",
)
def q_lpm_geo_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events", "part"))
    probes = (
        t["events"].select("user_id").distinct()
        .withColumn("ip_str", F.concat_ws(
            ".", F.lit(10),
            (F.col("user_id") * 7) % 256,
            (F.col("user_id") * 13) % 256,
            (F.col("user_id") * 29) % 256))
        .withColumn("ip_num", net.ipv4_to_long(F.col("ip_str")))
        .drop("ip_str")
    )
    raw_geo = (
        t["part"].select(
            F.concat_ws(
                ".", F.lit(10),
                (F.col("p_partkey") * 3) % 256,
                F.when(F.col("p_partkey") % 2 == 1, (F.col("p_partkey") * 5) % 256)
                 .otherwise(F.lit(0)),
                F.lit(0),
            ).alias("pfx_host"),
            (16 + (F.col("p_partkey") % 2) * 8).cast("int").alias("mask_len"),
            F.col("p_partkey"),
        )
        .withColumn("prefix",
                    F.concat_ws("/", F.col("pfx_host"), F.col("mask_len")))
        .unionByName(
            tiny_df(spark, [("10.0.0.0", 8, -1, "10.0.0.0/8")],
                    "pfx_host string, mask_len int, p_partkey long, prefix string"))
    )
    start, end = net.ipv4_prefix_bounds(F.col("prefix"))
    geo = (
        raw_geo.withColumn("prefix_start", start).withColumn("prefix_end", end)
        .groupBy("prefix_start", "prefix_end", "mask_len")
        .agg(F.min("p_partkey").cast("long").alias("geo_id"))
    )
    return lpm_join(
        probes, probe_key=["user_id"], probe_addr="ip_num",
        prefixes=geo, masklen_col="mask_len",
        bucket_bits=16, addr_bits=32, broadcast=True,
    ).select("user_id", "ip_num", "mask_len", "geo_id")


# ---------------------------------------------------------------------------
# J5/J6 v6: mixed-family LPM through the unified two-long join
# ---------------------------------------------------------------------------

_LPM6_ORACLE = f"""
WITH probes AS (
  SELECT DISTINCT user_id,
         CASE WHEN user_id % 3 = 0 THEN 6 ELSE 4 END AS family,
         CASE WHEN user_id % 3 = 0 THEN
           ({_V6DOC} + (user_id % 256) * 65536)::HUGEINT * {_B64}
             + (user_id % 4) * {_P48} + (user_id % 997)
         ELSE
           (167772160
            + ((user_id * 7) % 256) * 65536
            + ((user_id * 13) % 256) * 256
            + ((user_id * 29) % 256))::HUGEINT
         END AS v
  FROM events
), raw4 AS (
  SELECT 16 + (p_partkey % 2) * 8 AS mask_len,
         167772160
         + ((p_partkey * 3) % 256) * 65536
         + CASE WHEN p_partkey % 2 = 1 THEN ((p_partkey * 5) % 256) * 256 ELSE 0 END
           AS prefix_start,
         p_partkey
  FROM part
  UNION ALL
  SELECT 8, 167772160, -1
), geo4 AS (
  SELECT 4 AS family, mask_len,
         prefix_start::HUGEINT AS vstart,
         (prefix_start + (1::BIGINT << (32 - mask_len)) - 1)::HUGEINT AS vend,
         CAST(min(p_partkey) AS BIGINT) AS geo_id
  FROM raw4 GROUP BY 1, 2, 3, 4
), raw6 AS (
  SELECT 48 AS mask_len,
         ({_V6DOC} + (p_partkey % 256) * 65536)::HUGEINT * {_B64} AS vstart,
         p_partkey
  FROM part
  UNION ALL
  SELECT 80,
         ({_V6DOC} + (p_partkey % 256) * 65536)::HUGEINT * {_B64}
           + (p_partkey % 4)::HUGEINT * {_P48}::HUGEINT,
         p_partkey
  FROM part
  UNION ALL
  SELECT 32, {_V6DOC}::HUGEINT * {_B64}, -2
), geo6 AS (
  SELECT 6 AS family, mask_len, vstart,
         vstart + (1::HUGEINT << (128 - mask_len)) - 1 AS vend,
         CAST(min(p_partkey) AS BIGINT) AS geo_id
  FROM raw6 GROUP BY 1, 2, 3
), geo AS (
  SELECT * FROM geo4 UNION ALL SELECT * FROM geo6
)
SELECT user_id, family, mask_len, geo_id FROM (
  SELECT p.user_id, p.family, g.mask_len, g.geo_id,
         row_number() OVER (PARTITION BY p.user_id
                            ORDER BY g.mask_len DESC, g.vstart) AS rn
  FROM probes p JOIN geo g
    ON p.family = g.family AND p.v BETWEEN g.vstart AND g.vend
) WHERE rn = 1
"""


@register(
    "q_lpm_geo_join6",
    oracle=_LPM6_ORACLE,
    survey_ref="J5/J6 over inet v6 (1_base.sql:40-59,66-81 — geo_ip.ip is v4 AND v6)",
    doc="mixed v4/v6 longest-prefix match via the family-tagged two-long bucketed join",
)
def q_lpm_geo_join6(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events", "part"))
    base = t["events"].select("user_id").distinct()
    v4p = (
        base.filter(F.col("user_id") % 3 != 0)
        .withColumn("ip_str", F.concat_ws(
            ".", F.lit(10),
            (F.col("user_id") * 7) % 256,
            (F.col("user_id") * 13) % 256,
            (F.col("user_id") * 29) % 256))
        .select("user_id", F.lit(4).alias("fam"),
                F.lit(0).cast("long").alias("phi"),
                net.ipv4_to_long(F.col("ip_str")).alias("plo"))
    )
    v6p = (
        base.filter(F.col("user_id") % 3 == 0)
        .withColumn("ip_str", F.format_string(
            "2001:db8:%x:0:%x:0:0:%x",
            (F.col("user_id") % 256).cast("int"),
            (F.col("user_id") % 4).cast("int"),
            (F.col("user_id") % 997).cast("int")))
        .withColumn("__v", net.ipv6_to_longs(F.col("ip_str")))
        .select("user_id", F.lit(6).alias("fam"),
                F.col("__v.hi").alias("phi"), F.col("__v.lo").alias("plo"))
    )
    probes = v4p.unionByName(v6p)

    p = t["part"]
    raw4 = (
        p.select(
            F.concat_ws(
                ".", F.lit(10),
                (F.col("p_partkey") * 3) % 256,
                F.when(F.col("p_partkey") % 2 == 1, (F.col("p_partkey") * 5) % 256)
                 .otherwise(F.lit(0)),
                F.lit(0),
            ).alias("pfx_host"),
            (16 + (F.col("p_partkey") % 2) * 8).cast("int").alias("mask_len"),
            F.col("p_partkey"),
        )
        .withColumn("prefix", F.concat_ws("/", F.col("pfx_host"), F.col("mask_len")))
        .unionByName(
            tiny_df(spark, [("10.0.0.0", 8, -1, "10.0.0.0/8")],
                    "pfx_host string, mask_len int, p_partkey long, prefix string"))
    )
    s4, e4 = net.ipv4_prefix_bounds(F.col("prefix"))
    geo4 = (
        raw4.withColumn("s", s4).withColumn("e", e4)
        .groupBy("s", "e", "mask_len")
        .agg(F.min("p_partkey").cast("long").alias("geo_id"))
        .select(F.lit(4).alias("family"),
                F.lit(0).cast("long").alias("start_hi"), F.col("s").alias("start_lo"),
                F.lit(0).cast("long").alias("end_hi"), F.col("e").alias("end_lo"),
                "mask_len", "geo_id")
    )
    raw6 = (
        p.select(F.explode(F.array(
            F.format_string("2001:db8:%x::/48", (F.col("p_partkey") % 256).cast("int")),
            F.format_string("2001:db8:%x:0:%x::/80",
                            (F.col("p_partkey") % 256).cast("int"),
                            (F.col("p_partkey") % 4).cast("int")),
        )).alias("cidr"), F.col("p_partkey"))
        .unionByName(tiny_df(spark, [("2001:db8::/32", -2)],
                             "cidr string, p_partkey long"))
        .withColumn("__v", net.ipv6_to_longs(net.host(F.col("cidr"))))
        .withColumn("mask_len", net.masklen(F.col("cidr")).cast("int"))
    )
    s6h, s6l, e6h, e6l = net.ipv6_bounds_longs(
        F.col("__v.hi"), F.col("__v.lo"), F.col("mask_len"))
    geo6 = (
        raw6.select(F.col("mask_len"), F.col("p_partkey"),
                    s6h.alias("start_hi"), s6l.alias("start_lo"),
                    e6h.alias("end_hi"), e6l.alias("end_lo"))
        .groupBy("start_hi", "start_lo", "end_hi", "end_lo", "mask_len")
        .agg(F.min("p_partkey").cast("long").alias("geo_id"))
        .select(F.lit(6).alias("family"), "start_hi", "start_lo",
                "end_hi", "end_lo", "mask_len", "geo_id")
    )
    # checkpoint the two small frames: the containment join's
    # fine/coarse split references the prefix side twice (and the
    # probe side once per pass) — without a materialization barrier
    # every pass re-derives and re-compiles the whole parse subtree
    geo = geo4.unionByName(geo6).localCheckpoint()
    probes = probes.localCheckpoint()
    return lpm_join128(
        probes, probe_key=["user_id"], probe_family="fam",
        probe_hi="phi", probe_lo="plo", prefixes=geo,
        masklen_col="mask_len", broadcast=True,
    ).select("user_id", F.col("fam").alias("family"), "mask_len", "geo_id")


# ---------------------------------------------------------------------------
# J7 v6: ROA containment for v6 prefixes (rpki_validator.py ROAs carry v6)
# ---------------------------------------------------------------------------

_RPKI6_ORACLE = f"""
WITH rib AS (
  SELECT DISTINCT
         48 + (o_orderkey % 33) AS prefix_len,
         ({_V6DOC} + ((o_orderkey * 31) % 16) * 65536
                   + ((o_orderkey * 97) % 8))::HUGEINT * {_B64}
           + (o_orderkey % 4)::HUGEINT * {_P48}::HUGEINT AS v
  FROM orders
), rib2 AS (
  SELECT DISTINCT prefix_len,
         v - (v % (1::HUGEINT << (128 - prefix_len))) AS vstart
  FROM rib
), roa AS (
  SELECT DISTINCT
         48 + (s_suppkey % 17) AS roa_len,
         48 + (s_suppkey % 17) + (s_suppkey % 8) AS roa_len_max,
         CAST(s_nationkey AS BIGINT) AS roa_origin,
         ({_V6DOC} + ((s_suppkey * 7) % 16) * 65536
                   + ((s_suppkey * 13) % 8))::HUGEINT * {_B64} AS v
  FROM supplier
), roa2 AS (
  SELECT DISTINCT roa_len, roa_len_max, roa_origin,
         v - (v % (1::HUGEINT << (128 - roa_len))) AS vstart,
         v - (v % (1::HUGEINT << (128 - roa_len)))
           + (1::HUGEINT << (128 - roa_len)) - 1 AS vend
  FROM roa
)
SELECT CAST(r.vstart // {_B64} AS BIGINT) AS prefix_start_hi,
       CAST(r.vstart % {_B64} AS BIGINT) AS prefix_start_lo,
       r.prefix_len,
       CAST(COUNT(*) AS BIGINT) AS n_roas,
       min(x.roa_origin) AS rpki_origin_as
FROM rib2 r JOIN roa2 x
  ON r.vstart BETWEEN x.vstart AND x.vend
 AND r.prefix_len BETWEEN x.roa_len AND x.roa_len_max
GROUP BY 1, 2, 3
"""


@register(
    "q_rpki_containment6",
    oracle=_RPKI6_ORACLE,
    survey_ref="J7 over v6 ROAs (2_aggregations.sql:260-265; rpki_validator.py:26-73)",
    doc="v6 ROA covers prefix + len-range residual via the two-long bucketed join",
)
def q_rpki_containment6(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "supplier"))
    rib_len = (48 + F.col("o_orderkey") % 33).cast("int")
    rib_str = F.format_string(
        "2001:db8:%x:%x:%x::",
        ((F.col("o_orderkey") * 31) % 16).cast("int"),
        ((F.col("o_orderkey") * 97) % 8).cast("int"),
        (F.col("o_orderkey") % 4).cast("int"))
    rib_raw = (
        t["orders"].select(rib_len.alias("prefix_len"),
                           net.ipv6_to_longs(rib_str).alias("__v"))
        .distinct()
    )
    rsh, rsl, _, _ = net.ipv6_bounds_longs(
        F.col("__v.hi"), F.col("__v.lo"), F.col("prefix_len"))
    rib = (
        rib_raw.select(F.lit(6).alias("pfam"), F.col("prefix_len"),
                       rsh.alias("prefix_start_hi"), rsl.alias("prefix_start_lo"))
        .distinct()
    )
    roa_len = (48 + F.col("s_suppkey") % 17).cast("int")
    roa_str = F.format_string(
        "2001:db8:%x:%x::",
        ((F.col("s_suppkey") * 7) % 16).cast("int"),
        ((F.col("s_suppkey") * 13) % 8).cast("int"))
    roa_raw = (
        t["supplier"].select(
            roa_len.alias("roa_len"),
            (roa_len + F.col("s_suppkey") % 8).cast("int").alias("roa_len_max"),
            F.col("s_nationkey").cast("long").alias("roa_origin"),
            net.ipv6_to_longs(roa_str).alias("__v"))
        .distinct()
    )
    osh, osl, oeh, oel = net.ipv6_bounds_longs(
        F.col("__v.hi"), F.col("__v.lo"), F.col("roa_len"))
    roas = (
        roa_raw.select(F.lit(6).alias("family"), "roa_len", "roa_len_max", "roa_origin",
                       osh.alias("start_hi"), osl.alias("start_lo"),
                       oeh.alias("end_hi"), oel.alias("end_lo"))
        .distinct()
    )
    # materialization barrier: see q_lpm_geo_join6 — the split
    # containment pass would otherwise re-derive both parse subtrees
    rib = rib.localCheckpoint()
    roas = roas.localCheckpoint()
    matched = containment_join128(
        rib, "pfam", "prefix_start_hi", "prefix_start_lo", roas,
        broadcast=True,
        extra_pred=(F.col("prefix_len") >= F.col("roa_len"))
                   & (F.col("prefix_len") <= F.col("roa_len_max")),
    )
    return (
        matched.groupBy("prefix_start_hi", "prefix_start_lo", "prefix_len")
        .agg(F.count(F.lit(1)).alias("n_roas"),
             F.min("roa_origin").alias("rpki_origin_as"))
    )


# ---------------------------------------------------------------------------
# J7: RPKI containment theta-join (2_aggregations.sql:260-265)
# ---------------------------------------------------------------------------

_RPKI_ORACLE = """
WITH rib AS (
  SELECT DISTINCT
         16 + (o_orderkey % 9) AS prefix_len,
         (167772160 + (o_orderkey * 2654435761) % 16777216)
           - ((167772160 + (o_orderkey * 2654435761) % 16777216)
              % (1::BIGINT << (32 - (16 + (o_orderkey % 9))))) AS prefix_start
  FROM orders
), rib2 AS (
  SELECT prefix_start, prefix_len,
         prefix_start + (1::BIGINT << (32 - prefix_len)) - 1 AS prefix_end
  FROM rib
), roa AS (
  SELECT DISTINCT
         16 + (s_suppkey % 5) AS roa_len,
         16 + (s_suppkey % 5) + (s_suppkey % 4) AS roa_len_max,
         CAST(s_nationkey AS BIGINT) AS roa_origin,
         (167772160 + (s_suppkey * 40503) % 16777216)
           - ((167772160 + (s_suppkey * 40503) % 16777216)
              % (1::BIGINT << (32 - (16 + (s_suppkey % 5))))) AS roa_start
  FROM supplier
), roa2 AS (
  SELECT roa_start, roa_len, roa_len_max, roa_origin,
         roa_start + (1::BIGINT << (32 - roa_len)) - 1 AS roa_end
  FROM roa
)
SELECT r.prefix_start, r.prefix_len,
       CAST(COUNT(*) AS BIGINT) AS n_roas,
       min(x.roa_origin) AS rpki_origin_as
FROM rib2 r JOIN roa2 x
  ON r.prefix_start BETWEEN x.roa_start AND x.roa_end
 AND r.prefix_len BETWEEN x.roa_len AND x.roa_len_max
GROUP BY 1, 2
"""


@register(
    "q_rpki_containment",
    oracle=_RPKI_ORACLE,
    survey_ref="J7 (2_aggregations.sql:260-265, :338-343)",
    doc="ROA covers prefix + len-range residual, as bucketed equi-join",
)
def q_rpki_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "supplier"))
    rib_len = (16 + F.col("o_orderkey") % 9).cast("int")
    rib_base = (F.lit(167772160) + (F.col("o_orderkey") * 2654435761) % 16777216)
    rib_block = F.pow(F.lit(2.0), 32 - rib_len).cast("long")
    rib_start = rib_base - (rib_base % rib_block)
    rib = (
        t["orders"].select(
            rib_start.alias("prefix_start"),
            rib_len.alias("prefix_len"),
            (rib_start + rib_block - 1).alias("prefix_end"),
        ).distinct()
    )
    roa_len = (16 + F.col("s_suppkey") % 5).cast("int")
    roa_base = (F.lit(167772160) + (F.col("s_suppkey") * 40503) % 16777216)
    roa_block = F.pow(F.lit(2.0), 32 - roa_len).cast("long")
    roa_start = roa_base - (roa_base % roa_block)
    roa = (
        t["supplier"].select(
            roa_start.alias("roa_start"),
            roa_len.alias("roa_len"),
            (roa_len + F.col("s_suppkey") % 4).cast("int").alias("roa_len_max"),
            F.col("s_nationkey").cast("long").alias("roa_origin"),
            (roa_start + roa_block - 1).alias("roa_end"),
        ).distinct()
    )
    matched = containment_join(
        rib, "prefix_start", roa, start="roa_start", end="roa_end",
        bucket_bits=16, addr_bits=32, broadcast=True,
        extra_pred=(F.col("prefix_len") >= F.col("roa_len"))
                   & (F.col("prefix_len") <= F.col("roa_len_max")),
    )
    return (
        matched.groupBy("prefix_start", "prefix_len")
        .agg(F.count(F.lit(1)).alias("n_roas"),
             F.min("roa_origin").alias("rpki_origin_as"))
    )
