"""DNS tunnel detector: separation margins, entropy fold, derivation."""

import math

from pyspark.sql import functions as F

from hatchery_spark.operators.dns import derive_qnames, detect_tunnels

QSCHEMA = "domain string, label string"


def test_uniform_hex_label_flags_tunnel(spark):
    labels = ["0123456789abcdef" * 2] * 10      # 32 chars, all 16 symbols
    df = spark.createDataFrame([("evil.example.com", l) for l in labels], QSCHEMA)
    [r] = detect_tunnels(df).collect()
    assert r.is_tunnel and abs(r.char_entropy - 4.0) < 1e-9
    assert r.mean_label_len == 32.0


def test_service_names_do_not_flag(spark):
    df = spark.createDataFrame(
        [("ok.example.com", t) for t in ["click", "signup", "purchase"] * 5],
        QSCHEMA,
    )
    [r] = detect_tunnels(df).collect()
    assert not r.is_tunnel and r.mean_label_len < 10


def test_entropy_matches_reference(spark):
    df = spark.createDataFrame([("d.example.com", "aab")], QSCHEMA)
    [r] = detect_tunnels(df).collect()
    p = [2 / 3, 1 / 3]
    want = -sum(x * math.log2(x) for x in p)
    assert abs(r.char_entropy - round(want, 4)) < 1e-9


def test_long_but_low_entropy_does_not_flag(spark):
    # repetition padding: long labels, single symbol → entropy 0
    df = spark.createDataFrame([("pad.example.com", "a" * 40)] * 3, QSCHEMA)
    [r] = detect_tunnels(df).collect()
    assert not r.is_tunnel and r.char_entropy == 0.0


def test_qname_derivation_stripes_actors(spark):
    rows = [("conv-7", 0, "user", "secret payload", "chat", "2025-06-01 00:00:00"),
            ("conv-8", 0, "user", "hello", "chat", "2025-06-01 00:00:00")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string").withColumn("ts", F.to_timestamp("ts"))
    out = {r.domain: r.label for r in derive_qnames(df).collect()}
    assert len(out["svc7.example.com"]) == 32     # uid 7 → md5 exfil
    assert out["svc8.example.com"] == "chat"      # uid 8 → service label
