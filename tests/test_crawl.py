"""robots.txt parsing + RFC 9309 longest-match URL gating."""

import pyspark.sql.functions as F
import pytest

from hatchery_spark.functions.crawl import (
    parse_robots_rules,
    parse_robots_text,
    robots_allowed,
)


def test_parse_groups_comments_multiagent():
    text = (
        "# policy\n"
        "User-agent: a\n"
        "User-agent: b\n"
        "Disallow: /x  # inline comment\n"
        "Allow: /x/ok\n"
        "\n"
        "User-agent: *\n"
        "Disallow:\n"  # empty pattern → no rule
        "Disallow: /y\n"
        "Crawl-delay: 10\n"  # unknown directive ignored
        "User-agent: c\n"  # new group after rules
        "Allow: /z\n"
    )
    rules = parse_robots_text(text)
    assert ("a", 0, "/x") in rules and ("b", 0, "/x") in rules
    assert ("a", 1, "/x/ok") in rules and ("b", 1, "/x/ok") in rules
    assert ("*", 0, "/y") in rules
    assert ("c", 1, "/z") in rules
    assert not any(p == "" for _, _, p in rules)
    assert len(rules) == 6


@pytest.fixture(scope="module")
def verdicts(spark):
    robots = spark.createDataFrame(
        [
            (
                "d.com",
                "User-agent: *\n"
                "Disallow: /a/\n"
                "Allow: /a/ok\n"
                "Disallow: /w*ild\n"
                "Disallow: /end$\n"
                "Disallow: /pct%25_\n"  # literal % and _ must not be LIKE wildcards
                "User-agent: bot\n"
                "Allow: /\n",
            )
        ],
        "domain string, robots_txt string",
    )
    rules = parse_robots_rules(robots)
    urls = spark.createDataFrame(
        [
            (0, "https://d.com/a/x", "g"),
            (1, "https://d.com/a/ok/page", "g"),
            (2, "https://d.com/wooooild-stuff", "g"),
            (3, "https://d.com/end", "g"),
            (4, "https://d.com/endx", "g"),
            (5, "https://d.com/pct%25_", "g"),
            (6, "https://d.com/pctX25Y", "g"),  # would match if %/_ leaked
            (7, "https://d.com/a/x", "bot"),  # specific group replaces '*'
            (8, "https://d.com", "g"),  # bare host → path '/'
            (9, "https://other.com/a/x", "g"),  # unknown domain → allowed
        ],
        "doc_id long, url string, agent string",
    )
    return {r.doc_id: r for r in robots_allowed(urls, rules).collect()}


def test_rfc_semantics(verdicts):
    v = verdicts
    assert v[0].allowed == 0  # longest match: Disallow /a/
    assert v[1].allowed == 1  # Allow /a/ok longer
    assert v[2].allowed == 0  # '*' wildcard spans
    assert v[3].allowed == 0  # '$' anchor exact
    assert v[4].allowed == 1  # anchor does NOT prefix-match
    assert v[5].allowed == 0  # literal %/_ matched literally
    assert v[6].allowed == 1  # ...and never as LIKE wildcards
    assert v[7].allowed == 1  # bot group (Allow /) replaces the '*' group
    assert v[8].allowed == 1 and v[8].path == "/"
    assert v[9].allowed == 1  # no rules for the domain


def test_rules_are_rows(spark, verdicts):
    # sanity on the distributed parser output shape
    robots = spark.createDataFrame(
        [("x.com", "User-agent: *\nDisallow: /q\n")],
        "domain string, robots_txt string",
    )
    rows = parse_robots_rules(robots).collect()
    assert [tuple(r) for r in rows] == [("x.com", "*", 0, "/q", 2)]


# ---------------------------------------------------------------- sitemaps


def test_parse_sitemap_urlset_and_index():
    from hatchery_spark.functions.crawl import parse_sitemap_xml

    urlset = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://a.com/1 </loc><lastmod>2024-05-01</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://a.com/2</loc></url>
  <url><junk/></url>
</urlset>"""
    kind, entries = parse_sitemap_xml(urlset)
    assert kind == "urlset"
    assert entries == [
        ("https://a.com/1", "2024-05-01", "daily", 0.8),
        ("https://a.com/2", None, None, None),
    ]
    index = b"""<sitemapindex>
  <sitemap><loc>https://a.com/sitemap1.xml</loc>
           <lastmod>2024-01-01</lastmod></sitemap>
</sitemapindex>"""
    kind, entries = parse_sitemap_xml(index)
    assert kind == "sitemapindex"
    assert entries == [("https://a.com/sitemap1.xml", "2024-01-01", None, None)]
    with pytest.raises(ValueError, match="not a sitemap root"):
        parse_sitemap_xml(b"<html></html>")


def test_sitemap_distributed_roundtrip(spark):
    from hatchery_spark.functions.crawl import build_sitemaps, parse_sitemaps

    docs = spark.createDataFrame(
        [(i,) for i in range(50)], "doc_id long"
    )
    out = parse_sitemaps(build_sitemaps(docs, files=6)).collect()
    assert len(out) == 50
    for r in out:
        doc_id = int(r.loc.rsplit("/", 1)[1])
        assert r.file_id == doc_id % 6
        assert r.kind == "urlset"
        assert r.lastmod == f"2025-01-{doc_id % 28 + 1:02d}"
        assert r.changefreq == ["daily", "weekly", "monthly"][doc_id % 3]
        assert r.priority == float(f"0.{doc_id % 10}")
    # entry_idx dense per file in doc_id order
    per = {}
    for r in sorted(out, key=lambda r: (r.file_id, r.entry_idx)):
        per.setdefault(r.file_id, []).append(int(r.loc.rsplit("/", 1)[1]))
    for fid, ids in per.items():
        assert ids == sorted(ids)


# ---------------------------------------------------------------------------
# frontier politeness scheduling
# ---------------------------------------------------------------------------


def test_frontier_waves_hit_each_host_once(spark):
    from hatchery_spark.functions.crawl import frontier_schedule

    rows = [
        (f"https://{h}.example.com/{i}", i)
        for h in ("a", "b", "c")
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "url string, priority int")
    out = sorted(frontier_schedule(df).collect(), key=lambda r: r.fetch_key)
    # fetch keys are unique and wave-major: any 3 consecutive fetches
    # (= one wave over 3 hosts) touch 3 distinct hosts
    keys = [r.fetch_key for r in out]
    assert len(set(keys)) == len(keys)
    for w in range(0, len(out), 3):
        wave = out[w : w + 3]
        assert len({r.host for r in wave}) == len(wave)


def test_frontier_priority_orders_within_host(spark):
    from hatchery_spark.functions.crawl import frontier_schedule

    rows = [
        ("https://x.example.com/low", 1),
        ("https://x.example.com/high", 9),
        ("https://x.example.com/mid", 5),
    ]
    df = spark.createDataFrame(rows, "url string, priority int")
    out = sorted(frontier_schedule(df).collect(), key=lambda r: r.slot)
    assert [r.url.rsplit("/", 1)[1] for r in out] == ["high", "mid", "low"]


def test_frontier_skewed_host_never_monopolizes(spark):
    from hatchery_spark.functions.crawl import frontier_schedule

    rows = [(f"https://whale.example.com/{i}", 0) for i in range(50)]
    rows += [("https://minnow.example.com/only", 0)]
    df = spark.createDataFrame(rows, "url string, priority int")
    out = sorted(frontier_schedule(df).collect(), key=lambda r: r.fetch_key)
    # the minnow's single url is fetched in the first wave, not after the whale
    assert out[1].host == "minnow.example.com" or out[0].host == "minnow.example.com"
