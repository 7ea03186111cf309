"""JWT render/parse/verify + ULID codec."""

from __future__ import annotations

import base64
import hmac
import json

from pyspark.sql import functions as F

from hatchery_spark.functions.encoding import (
    ULID_ALPHABET,
    ulid_decode_ms_sql,
    ulid_encode_sql,
)
from hatchery_spark.operators.jwtauth import parse_jwt, render_jwt

SECRET = "s3cr3t"


def _mint(spark, claims):
    df = spark.createDataFrame([(1, json.dumps(claims))], "event_id long, cj string")
    return render_jwt(df, F.col("cj"), SECRET).first()["token"]


def test_jwt_matches_reference_construction(spark):
    claims = {"sub": "user1", "iat": 100, "exp": 3700, "scope": "x"}
    token = _mint(spark, claims)
    h, b, s = token.split(".")

    def b64u(x: bytes) -> str:
        return base64.urlsafe_b64encode(x).rstrip(b"=").decode()

    assert b == b64u(json.dumps(claims).encode())
    assert h == b64u(b'{"alg":"HS256","typ":"JWT"}')
    expected = b64u(hmac.new(SECRET.encode(), f"{h}.{b}".encode(), "sha256").digest())
    assert s == expected


def test_jwt_long_payload_single_line(spark):
    # regression: Spark's base64 MIME-chunks at 76 chars — tokens must not
    # contain CR/LF and must still verify
    claims = {"sub": "u" * 200, "iat": 1, "exp": 2, "scope": "s" * 100}
    token = _mint(spark, claims)
    assert "\r" not in token and "\n" not in token
    df = spark.createDataFrame([(token,)], "token string")
    r = parse_jwt(df, SECRET, "1970-01-02 00:00:00").first()
    assert r["sig_valid"] and r["sub"] == "u" * 200 and r["expired"]


def test_jwt_payload_tamper_flags(spark):
    token = _mint(spark, {"sub": "user1", "iat": 100, "exp": 3700, "scope": "x"})
    h, b, s = token.split(".")
    # re-sign nothing: swap one payload char; claims change, sig stays
    b2 = ("A" if b[0] != "A" else "B") + b[1:]
    df = spark.createDataFrame([(f"{h}.{b2}.{s}",)], "token string")
    assert parse_jwt(df, SECRET, "1970-01-01 00:00:00").first()["sig_valid"] is False


def test_jwt_wrong_secret_flags(spark):
    token = _mint(spark, {"sub": "user1", "iat": 100, "exp": 3700, "scope": "x"})
    df = spark.createDataFrame([(token,)], "token string")
    assert parse_jwt(df, "other", "1970-01-01 00:00:00").first()["sig_valid"] is False


def _ulid_df(spark, rows):
    df = spark.createDataFrame(rows, "ts_ms long, r_hi long, r_lo long")
    df.createOrReplaceTempView("ulid_in")
    enc = ulid_encode_sql("ts_ms", "r_hi", "r_lo")
    return spark.sql(f"SELECT ts_ms, {enc} AS u FROM ulid_in")


def test_ulid_roundtrip_and_shape(spark):
    rows = [(1469922850259, (1 << 40) - 1, 12345), (0, 0, 0),
            ((1 << 48) - 1, 7, (1 << 40) - 1)]
    out = _ulid_df(spark, rows)
    out.createOrReplaceTempView("ulid_out")
    dec = ulid_decode_ms_sql("u")
    back = spark.sql(f"SELECT ts_ms, u, {dec} AS b FROM ulid_out").collect()
    for r in back:
        assert len(r["u"]) == 26
        assert r["b"] == r["ts_ms"]
        assert all(c in ULID_ALPHABET for c in r["u"])
    # spec: max 48-bit timestamp encodes to leading '7Z…'
    mx = next(r for r in back if r["ts_ms"] == (1 << 48) - 1)
    assert mx["u"].startswith("7ZZZZZZZZZ")


def test_ulid_sorts_by_timestamp(spark):
    rows = [(t, 999999, 5) for t in (5000, 10, 99999999, 77, 12345678901)]
    got = [r["u"] for r in _ulid_df(spark, rows).collect()]
    by_ts = [u for _, u in sorted(zip([r[0] for r in rows], got))]
    assert sorted(got) == by_ts


def test_ulid_alphabet_is_crockford():
    assert len(ULID_ALPHABET) == 32
    assert not set("ILOU") & set(ULID_ALPHABET)
