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
    """Attach numeric bound columns for LPM/containment joins:
    v4-only single-long (prefix_start, prefix_end) plus the
    unified-family two-long (start_hi, start_lo, end_hi, end_lo) —
    v4 as (0, start)..(0, end), v6 parsed + masked natively. The
    reference's inet columns are family-blind (1_base.sql:40-59)."""
    start, end = net.ipv4_prefix_bounds(F.col(prefix_col))
    is_v4 = ~F.col(prefix_col).contains(":")
    m6 = F.when(F.col(prefix_col).contains("/"),
                F.split(F.col(prefix_col), "/").getItem(1).try_cast("int")) \
         .otherwise(F.lit(128))
    v6 = net.ipv6_to_longs(F.when(~is_v4, net.host(F.col(prefix_col))))
    sh, sl, eh, el = net.ipv6_bounds_longs(v6["hi"], v6["lo"], m6)
    zero = F.lit(0).cast("long")
    return (
        df.withColumn("prefix_start", F.when(is_v4, start))
        .withColumn("prefix_end", F.when(is_v4, end))
        .withColumn("masklen", F.when(is_v4, net.masklen(F.col(prefix_col)))
                                .otherwise(m6).cast("int"))
        .withColumn("start_hi", F.when(is_v4, zero).otherwise(sh))
        .withColumn("start_lo", F.when(is_v4, start).otherwise(sl))
        .withColumn("end_hi", F.when(is_v4, zero).otherwise(eh))
        .withColumn("end_lo", F.when(is_v4, end).otherwise(el))
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
    cidrs = raw.withColumn(
        "ip", F.explode(net.iprange_to_cidrs(F.col("start_ip"), F.col("end_ip"))))
    geo = cidrs.select(
        F.when(F.col("ip").contains(":"), 6).otherwise(4)
         .cast("short").alias("family"),
        "ip", "country", "stateprov", "city",
        F.col("latitude").try_cast("double").alias("latitude"),
        F.col("longitude").try_cast("double").alias("longitude"),
        F.lit(0.0).alias("timezone_offset"),
        "timezone_name",
        F.lit("").alias("isp_name"),
        F.lit("").alias("connection_type"),
        F.lit("").alias("organization_name"),
    )
    return _with_bounds(geo)


def load_geo_maxmind_csv(spark: SparkSession, locations_path: str,
                         *block_paths: str) -> DataFrame:
    """MaxMind GeoLite2-City variant (geo-csv-to-psql.py:209-302):
    Locations-en.csv (geoname_id -> country/stateprov/city/tz) joined
    against one or both Blocks-IPv4/IPv6.csv files (network CIDR,
    geoname_id, latitude, longitude). Blocks with an unknown
    geoname_id are dropped (the reference logs and skips them);
    family comes from the network string, and both families get
    unified bounds."""
    if not block_paths:
        raise ValueError("need at least one GeoLite2-City-Blocks-* CSV")
    loc = spark.read.csv(locations_path, header=True).select(
        F.col("geoname_id"),
        F.col("country_iso_code").alias("country"),
        F.col("subdivision_1_name").alias("stateprov"),
        F.col("city_name").alias("city"),
        F.col("time_zone").alias("timezone_name"),
    )
    blocks = spark.read.csv(list(block_paths), header=True).select(
        F.col("network").alias("ip"),
        F.col("geoname_id"),
        F.col("latitude").try_cast("double").alias("latitude"),
        F.col("longitude").try_cast("double").alias("longitude"),
    )
    joined = blocks.join(F.broadcast(loc), "geoname_id")
    geo = joined.select(
        F.when(F.col("ip").contains("."), 4).otherwise(6)
         .cast("short").alias("family"),
        "ip",
        F.coalesce("country", F.lit("")).alias("country"),
        F.coalesce("stateprov", F.lit("")).alias("stateprov"),
        F.coalesce("city", F.lit("")).alias("city"),
        "latitude", "longitude",
        F.lit(0.0).alias("timezone_offset"),
        F.coalesce("timezone_name", F.lit("")).alias("timezone_name"),
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
        F.col("r.maxLength").try_cast("short").alias("prefix_len_max"),
        F.regexp_replace(F.col("r.asn").cast("string"), "^AS", "")
         .try_cast("long").alias("origin_as"),
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


# ---------------------------------------------------------------------------
# S9: PeeringDB 6-endpoint walk (peeringdb.py:118-272) — injectable fetch
# ---------------------------------------------------------------------------

PEERINGDB_ENDPOINTS = ("net", "ix", "org", "netixlan", "poc", "ixpfx")


def walk_peeringdb(fetch_json, base_url: str = "https://www.peeringdb.com/api",
                   now: dt.datetime | None = None) -> list[dict]:
    """Full PeeringDB walk: fetch the six endpoints, key each payload
    by id (api_get, peeringdb.py:119-137), re-key POCs by role/net_id
    (:197-217) and IX prefixes by protocol/ixlan_id (:219-240), then
    assemble one record per operational netixlan peering
    (import_ix_peering, :274-360). ``fetch_json(url)`` -> parsed JSON
    (injectable: offline tests pass fixture payloads; production
    passes a requests-backed closure)."""
    data = {}
    for ep in PEERINGDB_ENDPOINTS:
        raw = fetch_json(f"{base_url}/{ep}")
        if not raw or "data" not in raw:
            raise RuntimeError(f"peeringdb walk failed at /{ep}")
        data[ep] = {e["id"]: e for e in raw["data"]}

    pocs: dict = {"noc": {}, "policy": {}}
    for v in data["poc"].values():
        if v.get("role") == "NOC":
            pocs["noc"][v["net_id"]] = v
        elif v.get("role") == "Policy":
            pocs["policy"][v["net_id"]] = v
    pfxs: dict = {"v4": {}, "v6": {}}
    for v in data["ixpfx"].values():
        if v.get("protocol") == "IPv4":
            pfxs["v4"][v["ixlan_id"]] = v
        elif v.get("protocol") == "IPv6":
            pfxs["v6"][v["ixlan_id"]] = v

    ts = now or dt.datetime.utcnow()
    out = []
    for e in data["netixlan"].values():
        if not e.get("operational"):
            continue
        p4 = e.get("ipaddr4") or "0.0.0.0"
        p6 = e.get("ipaddr6") or "::"
        if p4 == "0.0.0.0" and p6 == "::":
            continue
        ix = data["ix"][e["ix_id"]]
        net_ = data["net"][e["net_id"]]
        out.append({
            "ix_id": e["ix_id"],
            "ix_name": e["name"],
            "ix_prefix_v4": (pfxs["v4"].get(e["ixlan_id"]) or {}).get("prefix"),
            "ix_prefix_v6": (pfxs["v6"].get(e["ixlan_id"]) or {}).get("prefix"),
            "ix_country": ix.get("country"),
            "ix_city": (ix.get("city") or "")[:128],
            "ix_region": (ix.get("region_continent") or "")[:128],
            "rs_peer": bool(e.get("is_rs_peer")),
            "peer_name": f"{net_.get('name')} | {net_.get('aka', '')}"[:254],
            "peer_ipv4": p4,
            "peer_ipv6": p6,
            "peer_asn": e.get("asn"),
            "speed": e.get("speed"),
            "policy": net_.get("policy_general"),
            "poc_policy_email": (pocs["policy"].get(e["net_id"]) or {}).get("email", ""),
            "poc_noc_email": (pocs["noc"].get(e["net_id"]) or {}).get("email", ""),
            "timestamp": ts,
        })
    return out


def load_peeringdb(spark: SparkSession, fetch_json,
                   base_url: str = "https://www.peeringdb.com/api",
                   now: dt.datetime | None = None) -> DataFrame:
    """S9 end-to-end: walk + DataFrame assembly."""
    return load_peeringdb_exchange_peers(
        spark, walk_peeringdb(fetch_json, base_url, now))


# ---------------------------------------------------------------------------
# S10: whois/DNS ASN walk (gen_whois_asn.py:219-301) — injectable queriers
# ---------------------------------------------------------------------------

WHOIS_SOURCES = (("arin", "whois.arin.net"), ("ripe", "whois.ripe.net"),
                 ("apnic", "whois.apnic.net"), ("afrinic", "whois.afrinic.net"),
                 ("lacnic", "whois.lacnic.net"), ("ntt", "rr.ntt.net"))


def _parse_cymru_txt(txt: str) -> dict:
    """'64512 | US | arin | 2001-01-01 | NAME - Org Name' -> record
    (gen_whois_asn.py:252-268)."""
    parts = txt.split("|")
    if len(parts) < 5:
        return {}
    a_name = parts[4].split(" - ", 2)
    as_name = a_name[0].replace('"', "").strip()
    org = a_name[1].replace('"', "").strip() if len(a_name) > 1 else as_name
    return {"source": "cymru-" + parts[2].strip(),
            "as_name": as_name, "org_name": org,
            "country": parts[1].strip()}


def walk_whois(asn_list, query_whois, dns_txt=None,
               throttle=None, max_per_interval: int = 100) -> list[dict]:
    """Per-ASN whois walk: try each registry in order until a source
    yields an as_name, fall back to the Team Cymru DNS TXT lookup,
    then apply the address->country/state fixups (walkWhois,
    gen_whois_asn.py:219-301). Driver-side by design — the walk is
    rate-limited external I/O, not data-parallel work; ``throttle``
    is called every ``max_per_interval`` lookups (:297-301).

    ``query_whois(asn, host) -> raw text`` and
    ``dns_txt(name) -> str | None`` are injectable for offline tests.
    """
    out = []
    since_pause = 0
    for asn in asn_list:
        since_pause += 1
        record: dict = {}
        for source, host in WHOIS_SOURCES:
            record = parse_whois_asn_block(query_whois(asn, host) or "")
            if record.get("as_name"):
                record["source"] = source
                break
        if not record.get("as_name") and dns_txt is not None:
            txt = dns_txt(f"AS{asn}.asn.cymru.com")
            if txt:
                record = _parse_cymru_txt(txt)
        if record.get("as_name"):
            addr = record.get("address", "")
            if addr:
                lines = addr.split("\n")
                if not record.get("country"):
                    record["country"] = lines[-1]
                if not record.get("state_prov") and len(lines) >= 2:
                    record["state_prov"] = lines[-2]
            out.append({"asn": asn, **record})
        if throttle is not None and since_pause >= max_per_interval:
            throttle()
            since_pause = 0
    return out


def load_info_asn(spark: SparkSession, records: list[dict],
                  now: dt.datetime | None = None) -> DataFrame:
    """Assemble info_asn rows from walk_whois records (P3 filters
    private ASNs — the reference skips them before the walk,
    gen_whois_asn.py:100-108)."""
    from ..schemas import TABLE_SCHEMAS
    ts = now or dt.datetime.utcnow()
    cols = ("asn", "as_name", "org_id", "org_name", "remarks", "address",
            "city", "state_prov", "postal_code", "country", "raw_output",
            "source")
    rows = [tuple(r.get(c) or ("" if c != "asn" else None) for c in cols) + (ts,)
            for r in records if not is_private_asn(r["asn"])]
    return spark.createDataFrame(rows, TABLE_SCHEMAS["info_asn"])
