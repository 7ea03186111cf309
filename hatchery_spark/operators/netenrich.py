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

from pyspark.sql import Column, DataFrame
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
