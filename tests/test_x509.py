"""X.509/DER: primitive codecs, profile walk, edge tags."""

import pytest

from hatchery_spark.functions.x509 import (
    build_cert,
    der_children,
    der_int,
    der_oid,
    der_utctime,
    parse_cert,
    parse_int,
    parse_oid,
    parse_utctime,
)


def test_der_integer_minimal_encoding():
    # leading-0x00 rule when the high bit would flip the sign
    assert der_int(127) == b"\x02\x01\x7f"
    assert der_int(128) == b"\x02\x02\x00\x80"
    assert der_int(0) == b"\x02\x01\x00"
    for n in (0, 1, 127, 128, 255, 256, 2**40 + 5):
        tag, body = der_children(der_int(n))[0]
        assert tag == 0x02 and parse_int(body) == n


def test_oid_roundtrip_and_multibyte_arcs():
    for oid in ("1.2.840.113549.1.1.11", "2.5.4.3", "2.5.29.17", "1.3.6.1.4.1.99999"):
        _, body = der_children(der_oid(oid))[0]
        assert parse_oid(body) == oid


def test_utctime_sliding_window():
    # 2025 encodes as '25...' → decodes to 2025; epoch for 1999 → '99' → 1999
    t2025 = 1_750_000_000
    _, body = der_children(der_utctime(t2025))[0]
    assert parse_utctime(body) == t2025
    t1999 = 915_148_800  # 1999-01-01
    _, body = der_children(der_utctime(t1999))[0]
    assert parse_utctime(body) == t1999


def test_long_form_length():
    # >127-byte body forces the 0x81/0x82 long-form length path
    cert = build_cert(1, "A CA", "conv-1", 1_750_000_000,
                      ["x" * 200 + ".example.com"])
    meta = parse_cert(cert)
    assert meta["sans"].startswith("x" * 200)


def test_full_profile_fields():
    nb = 1_749_999_960
    cert = build_cert(7919 * 5 + 13, "svc5 CA", "conv-5", nb,
                      ["svc5.example.com", "conv-5.agents.example.com"])
    m = parse_cert(cert)
    assert m["serial"] == 7919 * 5 + 13
    assert m["sig_alg"] == "1.2.840.113549.1.1.11"
    assert m["issuer_cn"] == "svc5 CA" and m["subject_cn"] == "conv-5"
    assert m["not_before_ms"] == nb * 1000
    assert m["not_after_ms"] == (nb + 90 * 86400) * 1000
    assert m["sans"] == "svc5.example.com,conv-5.agents.example.com"


def test_garbage_rejected():
    with pytest.raises(Exception):
        parse_cert(b"\x04\x03abc")          # OCTET STRING, not a SEQUENCE
