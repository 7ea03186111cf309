"""CIDR longest-prefix enrichment: LPM order, table validation, plan shape."""

import pytest
from pyspark.sql import functions as F

from hatchery_spark.operators.netenrich import (
    cidr_enrich,
    extract_ipv4,
    ipv4_to_long,
    parse_cidr,
)


def test_parse_cidr_and_validation():
    assert parse_cidr("10.0.7.0/24") == ((10 << 24) + (7 << 8), 24)
    assert parse_cidr("0.0.0.0/0") == (0, 0)
    assert parse_cidr("255.255.255.255/32") == (0xFFFFFFFF, 32)
    with pytest.raises(ValueError):
        parse_cidr("10.0.7.1/24")  # host bits below the mask
    with pytest.raises(ValueError):
        parse_cidr("10.0.0.0/33")
    with pytest.raises(ValueError):
        parse_cidr("10.0.256.0/24")


def test_ip_extraction_and_long(spark):
    df = spark.createDataFrame(
        [("a", "ip=10.0.7.129 rest"), ("b", "no address here")],
        "k string, text string",
    )
    got = df.select(
        "k", extract_ipv4(F.col("text")).alias("ip")
    ).orderBy("k").collect()
    assert got[0].ip == "10.0.7.129" and got[1].ip == ""
    (v,) = (
        df.where(F.col("k") == "a")
        .select(ipv4_to_long(extract_ipv4(F.col("text"))).alias("v"))
        .collect()
    )
    assert v.v == (10 << 24) + (7 << 8) + 129


def test_longest_prefix_wins(spark):
    rows = [
        ("10.0.7.129", 25, "mgmt-restricted"),  # /25 beats /24 beats /16
        ("10.0.7.5", 24, "mgmt"),
        ("10.0.99.1", 16, "corp-lan"),
        ("10.0.17.2", 20, "pod-a"),
        ("10.0.40.9", 19, "pod-b"),
        ("10.0.161.3", 21, "pod-c-gpu"),
        ("10.0.129.3", 17, "pod-c"),
        ("10.200.1.1", 8, "corp"),
        ("192.168.3.4", 16, "lab"),
        ("8.8.8.8", 0, "internet"),  # falls through to the default route
    ]
    df = spark.createDataFrame(
        [(ip, f"x ip={ip} y") for ip, _, _ in rows], "ipk string, text string"
    )
    got = {
        r.ipk: (r.plen, r.zone)
        for r in cidr_enrich(df).select("ipk", "plen", "zone").collect()
    }
    for ip, plen, zone in rows:
        assert got[ip] == (plen, zone), (ip, got[ip])


def test_no_ip_rows_dropped_and_no_exchange(spark):
    df = spark.createDataFrame(
        [("a", "ip=10.0.0.1"), ("b", "free form")], "k string, text string"
    )
    out = cidr_enrich(df)
    assert out.count() == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure Project over the scan


def test_ip_pseudonymize_prefix_preserving(spark):
    from pyspark.sql import functions as F

    from hatchery_spark.operators.netenrich import (
        ip_pseudonymize,
        ipv4_to_long,
        long_to_ipv4,
    )

    ips = [
        "10.0.7.1", "10.0.7.2",      # share /30 (bits equal thru 30)
        "10.0.7.129",                 # shares /24 with the two above
        "10.0.99.1",                  # shares /16
        "192.168.1.1", "192.168.1.1", # identical → identical output
    ]
    df = spark.createDataFrame([(ip,) for ip in ips], "ip string")
    got = df.select(
        "ip",
        ipv4_to_long(F.col("ip")).alias("v"),
        ip_pseudonymize(ipv4_to_long(F.col("ip"))).alias("a"),
        long_to_ipv4(ip_pseudonymize(ipv4_to_long(F.col("ip")))).alias("s"),
    ).collect()
    by = {}
    for r in got:
        by.setdefault(r.ip, (r.v, r.a, r.s))

    def shared_prefix(a, b):
        x = a ^ b
        return 32 - x.bit_length()

    # prefix preservation is EXACT: shared output prefix == shared input
    for i1, i2 in [("10.0.7.1", "10.0.7.2"), ("10.0.7.1", "10.0.7.129"),
                   ("10.0.7.1", "10.0.99.1"), ("10.0.7.1", "192.168.1.1")]:
        v1, a1, _ = by[i1]
        v2, a2, _ = by[i2]
        assert shared_prefix(a1, a2) == shared_prefix(v1, v2), (i1, i2)
    # deterministic, and output is a valid dotted quad ≠ input
    same = [r for r in got if r.ip == "192.168.1.1"]
    assert same[0].a == same[1].a
    assert all(0 <= int(p) <= 255 for p in same[0].s.split("."))
    assert not any(r.s == r.ip for r in got)  # salt actually flips bits
