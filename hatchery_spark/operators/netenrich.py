"""CIDR longest-prefix-match enrichment (the classic log-pipeline lookup).

Hatchery's enrich step maps a parsed field against a per-source config
table (reference analog: the per-SaaS source configs under source/*/ and
the destination wiring in pipeline/pipeline.go); for network telemetry
the canonical form of that lookup is *longest-prefix match* of an
extracted IP against a CIDR routing/zone table.

Design (Spark-first, zero-shuffle):

The zone table is config-sized (like a routing table: tens to a few
thousand entries), so it belongs *inside the plan*, not in a join.  We
group the table by prefix length, turn each group into a literal
``MAP<BIGINT, STRING>`` keyed by the masked network integer, and emit

    coalesce(try_element_at(map_32, ip & mask_32),
             try_element_at(map_24, ip & mask_24), ...)

ordered by descending prefix length — longest match wins by coalesce
order.  The whole enrichment is a single codegen'd ``Project``: no
explode, no join, no Exchange, and it composes with whatever the
surrounding stage is doing.  (For a table too large to inline —
a full BGP dump — the same masked-key construction becomes an equi-join
per distinct prefix length against a broadcast table; the map form is
the right call for config-sized tables and is what we ship.)

The DuckDB oracle is *generated from the same Python table* (per-plen
CASE chains), so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: (cidr, zone) — nets must be pre-masked (validated at parse time).
#: Chosen to discriminate the synthetic transcript IPs 10.0.X.Y at
#: several depths, including nested prefixes where LPM order matters.
DEFAULT_CIDR_TABLE: list[tuple[str, str]] = [
    ("0.0.0.0/0", "internet"),
    ("10.0.0.0/8", "corp"),
    ("10.0.0.0/16", "corp-lan"),
    ("10.0.7.0/24", "mgmt"),
    ("10.0.7.128/25", "mgmt-restricted"),
    ("10.0.16.0/20", "pod-a"),
    ("10.0.32.0/19", "pod-b"),
    ("10.0.128.0/17", "pod-c"),
    ("10.0.160.0/21", "pod-c-gpu"),
    ("192.168.0.0/16", "lab"),
]

_IPV4_RE = r"(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})"


def parse_cidr(cidr: str) -> tuple[int, int]:
    """``'10.0.7.0/24'`` → ``(net_as_long, prefix_len)``; rejects
    host bits set below the mask (a mis-keyed table entry would
    silently never match)."""
    net_s, plen_s = cidr.split("/")
    plen = int(plen_s)
    if not 0 <= plen <= 32:
        raise ValueError(f"prefix length out of range: {cidr}")
    octets = [int(o) for o in net_s.split(".")]
    if len(octets) != 4 or any(not 0 <= o <= 255 for o in octets):
        raise ValueError(f"bad IPv4 network: {cidr}")
    net = (octets[0] << 24) | (octets[1] << 16) | (octets[2] << 8) | octets[3]
    mask = ((1 << plen) - 1) << (32 - plen) if plen else 0
    if net & ~mask & 0xFFFFFFFF:
        raise ValueError(f"host bits set below /{plen}: {cidr}")
    return net, plen


def _by_plen(table: list[tuple[str, str]]) -> list[tuple[int, dict[int, str]]]:
    """Group the table into ``[(plen, {net: zone})]`` sorted by
    descending plen (LPM evaluation order)."""
    groups: dict[int, dict[int, str]] = {}
    for cidr, zone in table:
        net, plen = parse_cidr(cidr)
        if groups.setdefault(plen, {}).setdefault(net, zone) != zone:
            raise ValueError(f"duplicate entry for {cidr}")
    return sorted(groups.items(), reverse=True)


def extract_ipv4(text: Column) -> Column:
    """First IPv4 literal in ``text`` ('' if none) — same regex the
    oracle replays."""
    return F.regexp_extract(text, _IPV4_RE, 1)


def ipv4_to_long(ip: Column) -> Column:
    """Dotted quad → BIGINT (codegen: split + shifts)."""
    o = F.split(ip, r"\.", -1)

    def part(i: int, sh: int) -> Column:
        return F.shiftleft(
            F.coalesce(F.try_element_at(o, F.lit(i)), F.lit("0")).cast("long"),
            sh,
        )

    return part(1, 24) + part(2, 16) + part(3, 8) + part(4, 0)


def _masked(ip_long: Column, plen: int) -> Column:
    if plen == 0:
        return F.lit(0).cast("long")
    return F.shiftleft(F.shiftright(ip_long, 32 - plen), 32 - plen)


def cidr_enrich(
    df: DataFrame,
    text_col: str = "text",
    table: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Rows with an IPv4 in ``text_col`` → ``(…, ip, ip_long, plen,
    zone)`` via longest-prefix match.  Pure Project — no shuffle."""
    table = DEFAULT_CIDR_TABLE if table is None else table
    ip = extract_ipv4(F.col(text_col))
    out = df.withColumn("ip", ip).where(F.col("ip") != "")
    out = out.withColumn("ip_long", ipv4_to_long(F.col("ip")))

    hits = []  # one struct per plen, coalesced longest-first
    for plen, nets in _by_plen(table):
        entries: list[Column] = []
        for net, zone in sorted(nets.items()):
            entries.append(F.lit(net).cast("long"))
            entries.append(F.lit(zone))
        lookup = F.try_element_at(
            F.create_map(*entries), _masked(F.col("ip_long"), plen)
        )
        hits.append(
            F.when(
                lookup.isNotNull(),
                F.struct(
                    F.lit(plen).cast("int").alias("plen"),
                    lookup.alias("zone"),
                ),
            )
        )
    match = F.coalesce(*hits) if hits else F.lit(None)
    return out.withColumn("plen", match["plen"]).withColumn(
        "zone", match["zone"]
    ).drop("ip_long")


def cidr_oracle_case_chain(
    ip_long_expr: str, table: list[tuple[str, str]] | None = None
) -> tuple[str, str]:
    """DuckDB SQL fragments ``(plen_expr, zone_expr)``: scalar coalesce
    of per-plen CASE chains, generated from the SAME table so the
    oracle cannot drift from the Spark plan."""
    table = DEFAULT_CIDR_TABLE if table is None else table

    def chains(value: str) -> list[str]:
        out = []
        for plen, nets in _by_plen(table):
            masked = (
                f"(({ip_long_expr} >> {32 - plen}) << {32 - plen})"
                if plen
                else "0"
            )
            whens = " ".join(
                f"WHEN {net} THEN {value.format(plen=plen, zone=zone)!s}"
                for net, zone in sorted(nets.items())
            )
            out.append(f"CASE {masked} {whens} END")
        return out

    plen_expr = "coalesce(" + ", ".join(chains("cast({plen} AS int)")) + ")"
    zone_expr = "coalesce(" + ", ".join(chains("'{zone}'")) + ")"
    return plen_expr, zone_expr


def ip_pseudonymize(ip_long: Column, salt: str = "hs") -> Column:
    """Prefix-preserving IP pseudonymization (the Crypto-PAn / Xu et al.
    2002 construction, with the repo-standard md5 as the PRF so the
    oracle replays it): output bit i = input bit i XOR
    PRF(salt, i, input bits 0..i-1).  Two addresses sharing a k-bit
    prefix map to outputs sharing EXACTLY a k-bit prefix — subnet
    structure (and therefore CIDR analytics) survives, identities
    don't.  Pure codegen: 32 md5 terms folded into one expression, the
    same width class as the Morton-interleave z-order key.  Production
    swap: replace md5 with a keyed AES PRF; the bit lattice is
    identical."""
    out = F.lit(0).cast("long")
    for i in range(32):
        bit = F.shiftright(ip_long, 31 - i) % 2
        prefix = F.shiftright(ip_long, 32 - i) if i else F.lit(0).cast("long")
        prf = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}:{i}:"), prefix.cast("string")
                        )
                    ),
                    1,
                    1,
                ),
                16,
                10,
            ).cast("long")
            % 2
        )
        out = out + F.shiftleft((bit + prf) % 2, 31 - i)
    return out


def long_to_ipv4(v: Column) -> Column:
    """BIGINT → dotted quad."""
    return F.concat_ws(
        ".",
        (F.shiftright(v, 24) % 256).cast("string"),
        (F.shiftright(v, 16) % 256).cast("string"),
        (F.shiftright(v, 8) % 256).cast("string"),
        (v % 256).cast("string"),
    )


def ip_pseudonymize_oracle_terms(ip_expr: str, salt: str = "hs") -> str:
    """DuckDB replay of :func:`ip_pseudonymize` over a BIGINT column."""
    terms = []
    for i in range(32):
        prefix = f"({ip_expr} >> {32 - i})" if i else "0"
        prf = (
            f"((strpos('0123456789abcdef', substr(md5(concat('{salt}:{i}:',"
            f" cast({prefix} AS varchar))), 1, 1)) - 1) % 2)"
        )
        bit = f"(({ip_expr} >> {31 - i}) % 2)"
        terms.append(f"((({bit} + {prf}) % 2) << {31 - i})")
    return " + ".join(terms)


# ------------------------------------------------------------- biflow --


def stitch_flows(df: DataFrame) -> DataFrame:
    """Bidirectional flow stitching (RFC 5103 biflows): pair A→B and B→A
    unidirectional records into one canonical flow row.

    Expects ``(src_ip, src_port, dst_ip, dst_port, ts, bytes)``. The
    canonical key orders the two endpoints lexicographically (lo/hi), so
    BOTH directions of a conversation hash to the same group — the whole
    stitch is ONE partially-aggregated groupBy, no self-join, no second
    shuffle (the textbook reversed-tuple join doubles the exchange for
    nothing). Emits per-direction byte totals, record counts, the time
    span, a ``bidirectional`` flag, and the initiator (the endpoint whose
    earliest record is first; ties break toward the lo endpoint, exactly
    replayable)."""
    a_is_lo = (F.col("src_ip") < F.col("dst_ip")) | (
        (F.col("src_ip") == F.col("dst_ip"))
        & (F.col("src_port") <= F.col("dst_port"))
    )

    def pick(lo_side: Column, a: str, b: str) -> Column:
        return F.when(lo_side, F.col(a)).otherwise(F.col(b))

    keyed = df.select(
        pick(a_is_lo, "src_ip", "dst_ip").alias("lo_ip"),
        pick(a_is_lo, "src_port", "dst_port").alias("lo_port"),
        pick(a_is_lo, "dst_ip", "src_ip").alias("hi_ip"),
        pick(a_is_lo, "dst_port", "src_port").alias("hi_port"),
        a_is_lo.alias("from_lo"),
        "ts",
        "bytes",
    )
    agg = keyed.groupBy("lo_ip", "lo_port", "hi_ip", "hi_port").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.coalesce(
            F.sum(F.when(F.col("from_lo"), F.col("bytes"))), F.lit(0)
        ).cast("long").alias("bytes_ab"),
        F.coalesce(
            F.sum(F.when(~F.col("from_lo"), F.col("bytes"))), F.lit(0)
        ).cast("long").alias("bytes_ba"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.min(F.when(F.col("from_lo"), F.col("ts"))).alias("_t_lo"),
        F.min(F.when(~F.col("from_lo"), F.col("ts"))).alias("_t_hi"),
    )
    initiator = (
        F.when(F.col("_t_hi").isNull(), F.col("lo_ip"))
        .when(F.col("_t_lo").isNull(), F.col("hi_ip"))
        .when(F.col("_t_lo") <= F.col("_t_hi"), F.col("lo_ip"))
        .otherwise(F.col("hi_ip"))
    )
    return agg.select(
        "lo_ip", "lo_port", "hi_ip", "hi_port", "n_records",
        "bytes_ab", "bytes_ba", "first_ts", "last_ts",
        (F.col("_t_lo").isNotNull() & F.col("_t_hi").isNotNull()).alias(
            "bidirectional"
        ),
        initiator.alias("initiator_ip"),
    )


def flow_stitch_oracle_sql(src_sql: str) -> str:
    """DuckDB replay of :func:`stitch_flows` over the same flow rows."""
    return f"""
        WITH f AS ({src_sql}),
        keyed AS (
          SELECT
            CASE WHEN src_ip < dst_ip OR (src_ip = dst_ip AND src_port <= dst_port)
                 THEN src_ip ELSE dst_ip END AS lo_ip,
            CASE WHEN src_ip < dst_ip OR (src_ip = dst_ip AND src_port <= dst_port)
                 THEN src_port ELSE dst_port END AS lo_port,
            CASE WHEN src_ip < dst_ip OR (src_ip = dst_ip AND src_port <= dst_port)
                 THEN dst_ip ELSE src_ip END AS hi_ip,
            CASE WHEN src_ip < dst_ip OR (src_ip = dst_ip AND src_port <= dst_port)
                 THEN dst_port ELSE src_port END AS hi_port,
            (src_ip < dst_ip OR (src_ip = dst_ip AND src_port <= dst_port))
              AS from_lo,
            ts, bytes
          FROM f),
        agg AS (
          SELECT lo_ip, lo_port, hi_ip, hi_port,
                 count(*) AS n_records,
                 coalesce(sum(CASE WHEN from_lo THEN bytes END), 0) AS bytes_ab,
                 coalesce(sum(CASE WHEN NOT from_lo THEN bytes END), 0) AS bytes_ba,
                 min(ts) AS first_ts, max(ts) AS last_ts,
                 min(CASE WHEN from_lo THEN ts END) AS t_lo,
                 min(CASE WHEN NOT from_lo THEN ts END) AS t_hi
          FROM keyed GROUP BY 1, 2, 3, 4)
        SELECT lo_ip, lo_port, hi_ip, hi_port,
               cast(n_records AS bigint) AS n_records,
               cast(bytes_ab AS bigint) AS bytes_ab,
               cast(bytes_ba AS bigint) AS bytes_ba,
               first_ts, last_ts,
               (t_lo IS NOT NULL AND t_hi IS NOT NULL) AS bidirectional,
               CASE WHEN t_hi IS NULL THEN lo_ip
                    WHEN t_lo IS NULL THEN hi_ip
                    WHEN t_lo <= t_hi THEN lo_ip ELSE hi_ip END
                 AS initiator_ip
        FROM agg"""


# ----------------------------------------------------- impossible travel --


def impossible_travel(
    df: DataFrame,
    max_kmh: int = 900,
    round_km: int = 3,
) -> DataFrame:
    """Impossible-travel login triage: per actor, haversine distance between
    consecutive login coordinates divided by the elapsed time; flag speeds a
    commercial jet cannot reach.

    Expects ``(actor, event_id, ts, lat, lon)``. One hash shuffle on actor +
    a lag window ordered by ``(ts, event_id)`` (the tiebreak keeps the replay
    deterministic when two logins share a timestamp). The trig is one-shot
    per row — ``round`` pins the float surface for the oracle; Δt=0 pairs
    yield NULL speed (never flagged) rather than a division blowup."""
    w = Window.partitionBy("actor").orderBy("ts", "event_id")
    p_lat, p_lon, p_ts = (
        F.lag("lat").over(w), F.lag("lon").over(w), F.lag("ts").over(w)
    )
    rad = F.radians
    a = (
        F.pow(F.sin((rad(F.col("lat")) - rad(p_lat)) / 2), 2)
        + F.cos(rad(p_lat))
        * F.cos(rad(F.col("lat")))
        * F.pow(F.sin((rad(F.col("lon")) - rad(p_lon)) / 2), 2)
    )
    km = F.lit(2 * 6371.0) * F.asin(F.sqrt(a))
    dt_s = F.unix_timestamp(F.col("ts")) - F.unix_timestamp(p_ts)
    speed = F.when(dt_s > 0, km / (dt_s / F.lit(3600.0)))
    return df.select(
        "actor",
        "ts",
        p_ts.alias("prev_ts"),
        F.round(km, round_km).alias("km"),
        F.round(speed, 2).alias("speed_kmh"),
        F.coalesce(F.round(speed, 2) > max_kmh, F.lit(False)).alias(
            "impossible"
        ),
    )


def impossible_travel_oracle_sql(
    src_sql: str, max_kmh: int = 900, round_km: int = 3
) -> str:
    hav = (
        "2 * 6371.0 * asin(sqrt("
        "pow(sin((radians(lat) - radians(p_lat)) / 2), 2)"
        " + cos(radians(p_lat)) * cos(radians(lat))"
        " * pow(sin((radians(lon) - radians(p_lon)) / 2), 2)))"
    )
    return f"""
        WITH s AS ({src_sql}),
        lagged AS (
          SELECT actor, ts, lat, lon,
                 lag(lat) OVER win AS p_lat,
                 lag(lon) OVER win AS p_lon,
                 lag(ts) OVER win AS p_ts
          FROM s
          WINDOW win AS (PARTITION BY actor ORDER BY ts, event_id)),
        d AS (
          SELECT actor, ts, p_ts, {hav} AS km,
                 cast(floor(epoch(ts)) AS bigint)
                   - cast(floor(epoch(p_ts)) AS bigint) AS dt_s
          FROM lagged)
        SELECT actor, ts, p_ts AS prev_ts,
               round(km, {round_km}) AS km,
               round(CASE WHEN dt_s > 0 THEN km / (dt_s / 3600.0) END, 2)
                 AS speed_kmh,
               coalesce(round(CASE WHEN dt_s > 0
                                   THEN km / (dt_s / 3600.0) END, 2)
                        > {max_kmh}, false) AS impossible
        FROM d"""
