"""Lookup-table loaders (S6-S10): geo CSV, RPKI JSON, PeeringDB,
IRR/RPSL dumps, whois. Network fetch is driver-side (tiny payloads,
external protocols); parsing/transforming is Spark. Each loader
returns a DataFrame in the corresponding schemas.TABLE_SCHEMAS shape.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import net


def _with_bounds(df: DataFrame, prefix_col: str = "ip") -> DataFrame:
    """Attach (prefix_start, prefix_end, masklen) numeric columns for
    LPM/containment joins (v4 rows; v6 gets NULL — the two-long v6
    variant joins through net.ipv6_to_longs the same way)."""
    start, end = net.ipv4_prefix_bounds(F.col(prefix_col))
    is_v4 = ~F.col(prefix_col).contains(":")
    return (
        df.withColumn("prefix_start", F.when(is_v4, start))
        .withColumn("prefix_end", F.when(is_v4, end))
        .withColumn("masklen", net.masklen(F.col(prefix_col)).cast("int"))
    )


# ---------------------------------------------------------------------------
# S6: geo CSV (DB-IP / MaxMind; ref scripts/geo-csv-to-psql.py)
# ---------------------------------------------------------------------------

def load_geo_dbip_csv(spark: SparkSession, path: str) -> DataFrame:
    """DB-IP lite CSV: start_ip,end_ip,continent,country,stateprov,
    city,(lat,lon,tz...) — ranges become minimal CIDR sets
    (geo-csv-to-psql.py:305-372, F13) then bounds."""
    raw = spark.read.csv(path, header=False).toDF(
        "start_ip", "end_ip", "continent", "country", "stateprov", "city",
        "latitude", "longitude", "timezone_name")
    v4 = raw.filter(~F.col("start_ip").contains(":"))
    cidrs = v4.withColumn(
        "ip", F.explode(net.iprange_to_cidrs(F.col("start_ip"), F.col("end_ip"))))
    geo = cidrs.select(
        F.lit(4).cast("short").alias("family"),
        "ip", "country", "stateprov", "city",
        F.col("latitude").cast("double").alias("latitude"),
        F.col("longitude").cast("double").alias("longitude"),
        F.lit(0.0).alias("timezone_offset"),
        "timezone_name",
        F.lit("").alias("isp_name"),
        F.lit("").alias("connection_type"),
        F.lit("").alias("organization_name"),
    )
    return _with_bounds(geo)


def default_geo_rows(spark: SparkSession) -> DataFrame:
    """The two catch-all rows every deployment carries
    (1_base.sql:62-64)."""
    df = spark.createDataFrame(
        [(4, "0.0.0.0/0", "", "", "", 0.0, 0.0, 0.0, "", "", "", ""),
         (6, "::/0", "", "", "", 0.0, 0.0, 0.0, "", "", "", "")],
        "family short, ip string, country string, stateprov string, city string, "
        "latitude double, longitude double, timezone_offset double, "
        "timezone_name string, isp_name string, connection_type string, "
        "organization_name string")
    return _with_bounds(df)


# ---------------------------------------------------------------------------
# S8: RPKI ROA JSON (ref cron_scripts/rpki/rpki_validator.py:26-73)
# ---------------------------------------------------------------------------

def load_rpki_roas_json(spark: SparkSession, path: str,
                        now: dt.datetime | None = None) -> DataFrame:
    """RIPE-format export.json: {"roas": [{"prefix": "a.b.c.d/len",
    "maxLength": n, "asn": "AS123"}, ...]}."""
    raw = spark.read.option("multiLine", "true").json(path)
    roas = raw.select(F.explode("roas").alias("r")).select(
        F.col("r.prefix").alias("prefix"),
        net.masklen(F.col("r.prefix")).cast("short").alias("prefix_len"),
        F.col("r.maxLength").cast("short").alias("prefix_len_max"),
        F.regexp_replace(F.col("r.asn").cast("string"), "^AS", "")
         .cast("long").alias("origin_as"),
        F.lit(now or dt.datetime.utcnow()).alias("timestamp"),
    ).dropDuplicates(["prefix", "prefix_len_max", "origin_as"])
    out = _with_bounds(roas, "prefix").drop("masklen")
    return out


# ---------------------------------------------------------------------------
# S7: IRR / RPSL dump (ref cron_scripts/gen-whois/gen_whois_route.py)
# ---------------------------------------------------------------------------

def load_irr_rpsl(spark: SparkSession, path: str,
                  source: str = "RADB",
                  now: dt.datetime | None = None) -> DataFrame:
    """RPSL paragraph records -> info_route rows. Records separate on
    blank lines (gen_whois_route.py:70-171); only route/origin/descr
    attributes are consumed. ``lineSep`` splits whole paragraphs so
    parsing stays distributed."""
    paras = spark.read.text(path, lineSep="\n\n")
    lines = F.split(F.col("value"), "\n")
    get = lambda attr: F.array_max(F.transform(  # noqa: E731
        F.filter(lines, lambda l: l.startswith(f"{attr}:")),
        lambda l: F.trim(F.substring_index(l, ":", -1))))
    route = F.array_max(F.transform(
        F.filter(lines, lambda l: l.startswith("route:")),
        lambda l: F.trim(F.regexp_replace(l, "^route:", ""))))
    origin = F.array_max(F.transform(
        F.filter(lines, lambda l: l.startswith("origin:")),
        lambda l: F.trim(F.regexp_replace(l, "^origin:", ""))))
    descr = get("descr")
    rec = paras.select(
        route.alias("prefix_cidr"), origin.alias("origin_raw"), descr.alias("descr"))
    rec = rec.filter(F.col("prefix_cidr").isNotNull()
                     & F.col("origin_raw").isNotNull())
    out = rec.select(
        net.host(F.col("prefix_cidr")).alias("prefix"),
        net.masklen(F.col("prefix_cidr")).cast("short").alias("prefix_len"),
        F.coalesce(F.col("descr"), F.lit("")).alias("descr"),
        net.asn_dot_to_long(F.regexp_replace("origin_raw", "^AS", ""))
         .alias("origin_as"),
        F.lit(source).alias("source"),
        F.lit(now or dt.datetime.utcnow()).alias("timestamp"),
    )
    # DISTINCT ON (prefix, origin_as) (gen_whois_route.py:195,210)
    return out.dropDuplicates(["prefix", "prefix_len", "origin_as"])


# ---------------------------------------------------------------------------
# S9/S10: PeeringDB + whois (driver-side fetch; stubbed offline)
# ---------------------------------------------------------------------------

def load_peeringdb_exchange_peers(spark: SparkSession,
                                  records: list[dict]) -> DataFrame:
    """Build pdb_exchange_peers from pre-fetched API dicts
    (cron_scripts/peeringdb/peeringdb.py:118-272). The HTTP walk is
    driver-side; pass its output here. Offline environments feed
    fixture dicts."""
    from ..schemas import TABLE_SCHEMAS  # noqa: F401
    cols = ("ix_id", "ix_name", "ix_prefix_v4", "ix_prefix_v6", "ix_country",
            "ix_city", "ix_region", "rs_peer", "peer_name", "peer_ipv4",
            "peer_ipv6", "peer_asn", "speed", "policy", "poc_policy_email",
            "poc_noc_email", "timestamp")
    rows = [tuple(r.get(c) for c in cols) for r in records]
    schema = ("ix_id int, ix_name string, ix_prefix_v4 string, ix_prefix_v6 string, "
              "ix_country string, ix_city string, ix_region string, rs_peer boolean, "
              "peer_name string, peer_ipv4 string, peer_ipv6 string, peer_asn long, "
              "speed int, policy string, poc_policy_email string, "
              "poc_noc_email string, timestamp timestamp")
    return spark.createDataFrame(rows, schema)


def parse_whois_asn_block(text: str) -> dict:
    """key: value whois block -> info_asn dict (gen_whois_asn.py:
    115-301). The per-ASN whois walk itself is rate-limited
    driver-side work (S10) — deliberately NOT Spark-parallel."""
    fields = {"as_name": "", "org_name": "", "address": "", "city": "",
              "state_prov": "", "postal_code": "", "country": "", "source": ""}
    keymap = {"as-name": "as_name", "asname": "as_name", "org-name": "org_name",
              "orgname": "org_name", "descr": "org_name", "address": "address",
              "city": "city", "stateprov": "state_prov",
              "postalcode": "postal_code", "country": "country",
              "source": "source"}
    for line in text.splitlines():
        if ":" not in line or line.startswith(("%", "#")):
            continue
        k, v = line.split(":", 1)
        k = k.strip().lower()
        if k in keymap and not fields[keymap[k]]:
            fields[keymap[k]] = v.strip()
    return fields


PRIVATE_ASN_RANGES = ((0, 0), (23456, 23456), (64496, 65535),
                      (65536, 131071), (4200000000, 4294967295))


def is_private_asn(asn: int) -> bool:
    """P3 (gen_whois_asn.py:100-108)."""
    return any(lo <= asn <= hi for lo, hi in PRIVATE_ASN_RANGES)
