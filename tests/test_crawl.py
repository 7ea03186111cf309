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
