"""Crawl-politeness filtering: robots.txt parsing + longest-match URL gating
(RFC 9309 / the Google REP semantics) — stage zero of a web-crawl corpus,
upstream of URL canonicalization and content dedup.

Two halves:

* ``parse_robots_rules`` — a REAL robots.txt parser in mapInPandas (line
  splitting, comment stripping, User-agent group accumulation including
  multi-agent groups, Allow/Disallow directives, empty-pattern skip). Rules
  tables are domain-sized — tiny next to the URL corpus — so downstream
  joins broadcast.
* ``robots_allowed`` — the verdict per (url, agent), fully declarative:
  host/path extraction (codegen regexps), RFC group selection (a specific
  user-agent group, when present, REPLACES the '*' group — via one
  domain-sized semi-aggregate), wildcard matching by translating robots
  patterns to SQL LIKE (escape %/_/\\, '*'→'%', trailing '$' anchors), and
  the longest-match-wins / allow-wins-ties rule as ONE rank window over
  matched rules. URLs matching no rule are allowed (RFC default).

Scale shape: the corpus-sized URL frame shuffles once for the per-URL
verdict window; every rules-side frame is domain-bounded and broadcast.

Reference parity note: upstream-source gating analog of hatchery's selector
stage (source/select.go:18) applied to the crawl domain.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RULES_SCHEMA = (
    "domain string, agent string, allow int, pattern string, pattern_len int"
)


def parse_robots_text(text: str) -> list[tuple[str, int, str]]:
    """One robots.txt → [(agent, allow, pattern)]. Groups follow RFC 9309
    §2.2: consecutive User-agent lines open a shared group; rules attach to
    every agent of the current group; comments (#) and unknown directives
    are ignored; empty patterns are skipped (an empty Disallow allows all,
    i.e. contributes no rule)."""
    rules: list[tuple[str, int, str]] = []
    agents: list[str] = []
    in_group_header = True
    for raw_line in (text or "").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_group_header:
                agents = []
                in_group_header = True
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_header = False
            if val:
                for a in agents:
                    rules.append((a, 1 if key == "allow" else 0, val))
    return rules


def parse_robots_rules(
    df: DataFrame, domain_col: str = "domain", content_col: str = "robots_txt"
) -> DataFrame:
    """(domain, robots_txt) → one row per (domain, agent, rule)."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for dom, text in zip(b[domain_col], b[content_col]):
                for agent, allow, pattern in parse_robots_text(text):
                    rows.append((dom, agent, allow, pattern, len(pattern)))
            yield pd.DataFrame(
                rows, columns=["domain", "agent", "allow", "pattern", "pattern_len"]
            )

    return df.select(domain_col, content_col).mapInPandas(_parse, RULES_SCHEMA)


def _like_pattern(pattern: Column) -> Column:
    """Translate a robots path pattern to a SQL LIKE pattern (ESCAPE '\\'):
    literal \\, %, _ escaped; '*' → '%'; a trailing '$' anchors the match
    (no trailing '%'), otherwise the pattern is a prefix."""
    p = F.replace(pattern, F.lit("\\"), F.lit("\\\\"))
    p = F.replace(p, F.lit("%"), F.lit("\\%"))
    p = F.replace(p, F.lit("_"), F.lit("\\_"))
    p = F.replace(p, F.lit("*"), F.lit("%"))
    return F.when(
        p.endswith("$"), F.substring(p, F.lit(1), F.length(p) - 1)
    ).otherwise(F.concat(p, F.lit("%")))


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    agent_col: str = "agent",
    id_col: str = "doc_id",
) -> DataFrame:
    """Verdict per URL row: (id, url, agent, domain, path, allowed).

    RFC 9309 semantics: the most specific matching group (exact agent name
    if present, else '*') supplies the rules; among matching rules the
    LONGEST pattern wins, Allow winning length ties; no match → allowed.
    """
    u = urls.select(
        "*",
        F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)", 1).alias("domain"),
        F.coalesce(
            F.nullif(F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/]+(/.*)$", 1),
                     F.lit("")),
            F.lit("/"),
        ).alias("path"),
    )
    # group selection: does a (domain, agent) specific group exist? (both
    # rules-derived frames share lineage, so the joins use string-qualified
    # aliases to keep resolution unambiguous)
    specific = (
        rules.filter(F.col("agent") != "*")
        .select("domain", F.col("agent").alias(agent_col))
        .distinct()
        .withColumn("has_specific", F.lit(1))
    )
    u = u.join(F.broadcast(specific), ["domain", agent_col], "left")
    r = rules.withColumn("like_pat", _like_pattern(F.col("pattern")))
    joined = (
        u.alias("u")
        .join(
            F.broadcast(r.alias("r")),
            F.expr(
                "u.domain = r.domain AND ("
                f"(u.has_specific = 1 AND r.agent = u.{agent_col}) OR "
                "(u.has_specific IS NULL AND r.agent = '*'))"
            ),
            "left",
        )
        .select(
            "u.*",
            F.col("r.allow").alias("allow"),
            F.col("r.pattern_len").alias("pattern_len"),
            F.expr("u.path LIKE r.like_pat ESCAPE '\\\\'").alias("matched"),
        )
    )
    ranked = joined.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(
                F.when(F.col("matched"), 0).otherwise(1),
                F.desc(F.when(F.col("matched"), F.col("pattern_len")).otherwise(-1)),
                F.desc(F.when(F.col("matched"), F.col("allow")).otherwise(1)),
            )
        ),
    ).filter(F.col("rn") == 1)
    return ranked.select(
        id_col,
        url_col,
        agent_col,
        "domain",
        "path",
        F.when(F.col("matched").isNull() | ~F.col("matched"), F.lit(1))
        .otherwise(F.col("allow"))
        .cast("int")
        .alias("allowed"),
    )


# ---------------------------------------------------------------------------
# Sitemaps (sitemaps.org XML protocol): the crawl-discovery companion to
# robots.txt — <urlset> leaves carry per-URL metadata, <sitemapindex> nodes
# fan out to child sitemaps. Parsing is one mapInPandas pass per file blob
# (stdlib ElementTree, namespace-tolerant); sitemap files are ≤50k URLs by
# spec, so memory per task is bounded by construction.
# ---------------------------------------------------------------------------

_SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def build_sitemaps(
    docs: DataFrame,
    files: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """documents → (file_id, content) sitemap.xml blobs (urlset form),
    doc_id % files groups, entries in doc_id order: deterministic at any
    parallelism. Field values are closed-form in doc_id so a parser oracle
    can replay them."""

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rid")
        freq = ["daily", "weekly", "monthly"]
        parts = [
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<urlset xmlns="{_SITEMAP_NS}">'
        ]
        for rid in pdf["_rid"]:
            rid = int(rid)
            parts.append(
                "<url>"
                f"<loc>https://example.com/doc/{rid}</loc>"
                f"<lastmod>2025-01-{rid % 28 + 1:02d}</lastmod>"
                f"<changefreq>{freq[rid % 3]}</changefreq>"
                f"<priority>0.{rid % 10}</priority>"
                "</url>"
            )
        parts.append("</urlset>")
        return pd.DataFrame(
            {
                "file_id": [int(pdf.file_id.iloc[0])],
                "content": ["".join(parts).encode("utf-8")],
            }
        )

    recs = docs.select(
        F.pmod(F.col(id_col), F.lit(files)).alias("file_id"),
        F.col(id_col).alias("_rid"),
    )
    return recs.groupBy("file_id").applyInPandas(
        _encode, "file_id bigint, content binary"
    )


def parse_sitemap_xml(buf: bytes) -> tuple[str, list[tuple]]:
    """One sitemap blob → ('urlset'|'sitemapindex', entries). urlset
    entries are (loc, lastmod, changefreq, priority); index entries are
    (loc, lastmod, None, None). Namespace-tolerant: matches on the local
    tag name so files with or without the sitemaps.org xmlns parse the
    same."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(buf)
    kind = root.tag.rsplit("}", 1)[-1]
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap root: {root.tag!r}")

    def _txt(el, name):
        for child in el:
            if child.tag.rsplit("}", 1)[-1] == name:
                return (child.text or "").strip()
        return None

    entries = []
    for el in root:
        tag = el.tag.rsplit("}", 1)[-1]
        if tag not in ("url", "sitemap"):
            continue
        loc = _txt(el, "loc")
        if not loc:
            continue
        pr = _txt(el, "priority")
        entries.append(
            (
                loc,
                _txt(el, "lastmod"),
                _txt(el, "changefreq") if tag == "url" else None,
                float(pr) if tag == "url" and pr is not None else None,
            )
        )
    return kind, entries


def parse_sitemaps(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Sitemap blobs → one row per <url>/<sitemap> entry with its in-file
    order; zero shuffle, O(file bytes) per task."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, buf in zip(pdf["file_id"], pdf[content_col]):
                kind, entries = parse_sitemap_xml(bytes(buf))
                for i, (loc, lastmod, changefreq, priority) in enumerate(entries):
                    rows.append(
                        (int(fid), kind, i, loc, lastmod, changefreq, priority)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id", "kind", "entry_idx", "loc",
                    "lastmod", "changefreq", "priority",
                ],
            )

    return df.mapInPandas(
        _parse,
        "file_id bigint, kind string, entry_idx int, loc string, "
        "lastmod string, changefreq string, priority double",
    )


def frontier_schedule(urls: DataFrame, url_col: str = "url",
                      priority_col: str = "priority") -> DataFrame:
    """Politeness-aware crawl-frontier ordering: assign every URL a global
    fetch key such that consecutive "waves" hit each host at most once —
    the per-host rate-limit a well-behaved crawler must observe — while
    within a host URLs drain by priority (descending, url ascending on
    ties).

    Closed-form position arithmetic, not a global sequence window:
    ``fetch_key = (slot-1) · n_hosts + host_idx`` where ``slot`` is the
    URL's per-host rank and ``host_idx`` ranks the DISTINCT hosts. The
    only corpus-sized shuffle is the per-host rank (one host-keyed
    exchange); the host index window sorts only the distinct-host frame
    (hosts ≪ urls — bounded like a dimension table) and the n_hosts
    scalar broadcasts. No single reducer ever sees the full frontier —
    the same trick as sampling.interleave_sources.
    """
    host = F.regexp_extract(url_col, r"^[a-z]+://([^/]+)", 1)
    per_host = Window.partitionBy("host").orderBy(
        F.col(priority_col).desc(), F.col(url_col)
    )
    with_slot = urls.withColumn("host", host).withColumn(
        "slot", F.row_number().over(per_host)
    )
    hosts = with_slot.select("host").distinct()
    host_idx = hosts.withColumn(
        "host_idx", F.row_number().over(Window.orderBy("host"))
    )
    n_hosts = host_idx.agg(F.count(F.lit(1)).alias("n_hosts"))
    return (
        with_slot.join(F.broadcast(host_idx), "host")
        .crossJoin(F.broadcast(n_hosts))
        .select(
            F.col(url_col).alias("url"),
            "host",
            F.col("slot").cast("int").alias("slot"),
            ((F.col("slot") - 1).cast("long") * F.col("n_hosts")
             + F.col("host_idx")).alias("fetch_key"),
        )
    )
