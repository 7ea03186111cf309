r"""X.509 certificate metadata extraction: a from-scratch ASN.1 DER
walker (RFC 5280 profile) plus a deterministic DER certificate builder,
so TLS/certificate-transparency-style logs stop being opaque blobs —
the parse side is what a CT-log or TLS-inspection pipeline runs at
scale; the build side exists to make every parsed field value-pinned
from source data.

DER machinery implemented from the public ITU-T X.690 rules:

  * TLV with definite lengths (short and long form), INTEGER
    (two's-complement, minimal, leading-0x00 rule), OBJECT IDENTIFIER
    (40·a+b first octet, base-128 continuation), UTCTime (RFC 5280
    YY≥50→19YY sliding window), PrintableString/UTF8String/IA5String,
    BIT STRING (leading unused-bits octet), OCTET STRING, SEQUENCE /
    SET and context-specific [0]/[3] EXPLICIT plus [2] IMPLICIT
    (the SubjectAltName dNSName tag 0x82).

Certificate profile (RFC 5280 §4.1): tbsCertificate carries [0]
version=v3, serialNumber, AlgorithmIdentifier
(sha256WithRSAEncryption, 1.2.840.113549.1.1.11), issuer/subject
RDNSequences with CN (2.5.4.3), Validity (UTCTime pair), a stub
SubjectPublicKeyInfo, and [3] Extensions with SubjectAltName
(2.5.29.17, two dNSNames). The signature BIT STRING is a digest stub —
this module does metadata extraction, not signature verification, and
says so.

One cert per conversation, every field data-derived: serial =
uid·7919+13, issuer CN = the uid-striped CA, validity = first-turn ts
(second precision — UTCTime's own resolution) + 90 days, SANs from the
uid. Expiry is judged against a FIXED as-of instant so the flag is
replayable.

Scale shape: build = one conv_id aggregate (min ts) + mapInPandas;
parse = shuffle-free mapInPandas, one DER walk per blob; certs are
O(conversations), bytes are hundreds per cert.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OID_SHA256_RSA = "1.2.840.113549.1.1.11"
OID_CN = "2.5.4.3"
OID_SAN = "2.5.29.17"
VALIDITY_SECS = 90 * 86400
AS_OF_MS = 1_751_328_000_000  # 2025-07-01T00:00:00Z — fixed expiry reference


# ---------------------------------------------------------------------------
# DER primitives (X.690)
# ---------------------------------------------------------------------------


def _len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def tlv(tag: int, body: bytes) -> bytes:
    return bytes([tag]) + _len(len(body)) + body


def der_int(n: int) -> bytes:
    body = n.to_bytes(max(1, (n.bit_length() + 8) // 8), "big", signed=True)
    return tlv(0x02, body)


def der_oid(dotted: str) -> bytes:
    parts = [int(x) for x in dotted.split(".")]
    body = bytearray([40 * parts[0] + parts[1]])
    for p in parts[2:]:
        chunk = [p & 0x7F]
        p >>= 7
        while p:
            chunk.append((p & 0x7F) | 0x80)
            p >>= 7
        body += bytes(reversed(chunk))
    return tlv(0x06, bytes(body))


def der_utctime(epoch_s: int) -> bytes:
    t = dt.datetime.fromtimestamp(epoch_s, dt.timezone.utc)
    return tlv(0x17, t.strftime("%y%m%d%H%M%SZ").encode())


def der_seq(*items: bytes) -> bytes:
    return tlv(0x30, b"".join(items))


def _parse_tlv(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    tag = buf[pos]
    pos += 1
    first = buf[pos]
    pos += 1
    if first < 0x80:
        ln = first
    else:
        n = first & 0x7F
        ln = int.from_bytes(buf[pos:pos + n], "big")
        pos += n
    return tag, buf[pos:pos + ln], pos + ln


def der_children(body: bytes) -> list[tuple[int, bytes]]:
    out, pos = [], 0
    while pos < len(body):
        tag, val, pos = _parse_tlv(body, pos)
        out.append((tag, val))
    return out


def parse_oid(body: bytes) -> str:
    parts = [body[0] // 40, body[0] % 40]
    v = 0
    for b in body[1:]:
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            parts.append(v)
            v = 0
    return ".".join(str(p) for p in parts)


def parse_utctime(body: bytes) -> int:
    s = body.decode()
    yy = int(s[:2])
    year = 1900 + yy if yy >= 50 else 2000 + yy
    t = dt.datetime(year, int(s[2:4]), int(s[4:6]), int(s[6:8]),
                    int(s[8:10]), int(s[10:12]), tzinfo=dt.timezone.utc)
    return int(t.timestamp())


def parse_int(body: bytes) -> int:
    return int.from_bytes(body, "big", signed=True)


# ---------------------------------------------------------------------------
# certificate build / parse
# ---------------------------------------------------------------------------


def _name(cn: str) -> bytes:
    atv = der_seq(der_oid(OID_CN), tlv(0x0C, cn.encode()))  # UTF8String
    return der_seq(tlv(0x31, atv))                           # SET { ATV }


def build_cert(serial: int, issuer_cn: str, subject_cn: str,
               not_before_s: int, sans: list[str]) -> bytes:
    validity = der_seq(der_utctime(not_before_s),
                       der_utctime(not_before_s + VALIDITY_SECS))
    alg = der_seq(der_oid(OID_SHA256_RSA), tlv(0x05, b""))   # params NULL
    spki = der_seq(alg, tlv(0x03, b"\x00" + b"\xA5" * 32))   # stub key
    general_names = der_seq(*[tlv(0x82, s.encode()) for s in sans])
    san_ext = der_seq(der_oid(OID_SAN), tlv(0x04, general_names))
    extensions = tlv(0xA3, der_seq(san_ext))                 # [3] EXPLICIT
    tbs = der_seq(
        tlv(0xA0, der_int(2)),                               # [0] version v3
        der_int(serial),
        alg,
        _name(issuer_cn),
        validity,
        _name(subject_cn),
        spki,
        extensions,
    )
    sig = tlv(0x03, b"\x00" + bytes((serial * 37 + i) % 256 for i in range(16)))
    return der_seq(tbs, alg, sig)


def parse_cert(buf: bytes) -> dict:
    """Certificate blob → metadata dict (no signature verification)."""
    top = der_children(buf)
    if len(top) != 1 or top[0][0] != 0x30:
        raise ValueError("x509: not a SEQUENCE")
    tbs_raw, alg_raw, _sig = der_children(top[0][1])
    fields = der_children(tbs_raw[1])
    i = 0
    if fields[i][0] == 0xA0:                                  # [0] version
        i += 1
    serial = parse_int(fields[i][1]); i += 1
    sig_alg = parse_oid(der_children(fields[i][1])[0][1]); i += 1
    issuer_cn = _cn_of(fields[i][1]); i += 1
    nb_raw, na_raw = der_children(fields[i][1]); i += 1
    subject_cn = _cn_of(fields[i][1]); i += 1
    i += 1                                                    # spki
    sans = []
    while i < len(fields):
        if fields[i][0] == 0xA3:                              # [3] extensions
            # [3] EXPLICIT wraps one SEQUENCE OF Extension
            ext_list = der_children(der_children(fields[i][1])[0][1])
            for _, ext in ext_list:
                ext_id, *rest = der_children(ext)
                if parse_oid(ext_id[1]) == OID_SAN:
                    octet = rest[-1][1]                       # skip critical
                    for gtag, gval in der_children(
                            der_children(octet)[0][1]):
                        if gtag == 0x82:                      # dNSName
                            sans.append(gval.decode())
        i += 1
    return {
        "serial": serial,
        "sig_alg": sig_alg,
        "issuer_cn": issuer_cn,
        "subject_cn": subject_cn,
        "not_before_ms": parse_utctime(nb_raw[1]) * 1000,
        "not_after_ms": parse_utctime(na_raw[1]) * 1000,
        "sans": ",".join(sans),
    }


def _cn_of(name_body: bytes) -> str:
    for _, rdn_set in der_children(name_body):
        for _, atv in der_children(rdn_set):
            oid_raw, val_raw = der_children(atv)
            if parse_oid(oid_raw[1]) == OID_CN:
                return val_raw[1].decode()
    raise ValueError("x509: no CN")


# ---------------------------------------------------------------------------
# DataFrame surface
# ---------------------------------------------------------------------------


def issue_certs(turns: DataFrame) -> DataFrame:
    """One deterministic cert per conversation (blob binary)."""
    per_conv = turns.groupBy("conv_id").agg(
        F.unix_millis(F.min("ts").cast("timestamp")).alias("_nb_ms"),
    ).select(
        "conv_id", "_nb_ms",
        F.substring("conv_id", 6, 32).cast("long").alias("_uid"),
    )

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for conv, nb_ms, uid in zip(pdf["conv_id"], pdf["_nb_ms"],
                                        pdf["_uid"]):
                uid = int(uid)
                blobs.append(build_cert(
                    uid * 7919 + 13,
                    f"svc{uid % 20} CA",
                    conv,
                    int(nb_ms) // 1000,
                    [f"svc{uid % 20}.example.com",
                     f"{conv}.agents.example.com"],
                ))
            yield pd.DataFrame({"cert": blobs})

    return per_conv.mapInPandas(_build, "cert binary")


def extract_cert_metadata(df: DataFrame, cert_col: str = "cert") -> DataFrame:
    """cert blobs → one metadata row each, expiry judged vs AS_OF_MS."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_cert(bytes(raw)) for raw in pdf[cert_col]]
            yield pd.DataFrame(
                rows,
                columns=["serial", "sig_alg", "issuer_cn", "subject_cn",
                         "not_before_ms", "not_after_ms", "sans"],
            )

    parsed = df.mapInPandas(
        _parse,
        "serial bigint, sig_alg string, issuer_cn string, subject_cn "
        "string, not_before_ms bigint, not_after_ms bigint, sans string",
    )
    return parsed.withColumn("is_expired", F.col("not_after_ms") < AS_OF_MS)


def x509_oracle_sql(transcripts_sql: str) -> str:
    """DuckDB replay: every metadata field recomputed from the first-turn
    timestamp and uid arithmetic; the DER bytes are never touched."""
    return f"""
        WITH t AS ({transcripts_sql}),
        c AS (
          SELECT conv_id,
                 cast(substring(conv_id, 6) AS bigint) AS uid,
                 (epoch_ms(min(ts)) // 1000) * 1000 AS nb_ms
          FROM t GROUP BY conv_id
        )
        SELECT uid * 7919 + 13 AS serial,
               '{OID_SHA256_RSA}' AS sig_alg,
               'svc' || cast(uid % 20 AS varchar) || ' CA' AS issuer_cn,
               conv_id AS subject_cn,
               nb_ms AS not_before_ms,
               nb_ms + {VALIDITY_SECS * 1000} AS not_after_ms,
               'svc' || cast(uid % 20 AS varchar) || '.example.com,'
                 || conv_id || '.agents.example.com' AS sans,
               nb_ms + {VALIDITY_SECS * 1000} < {AS_OF_MS} AS is_expired
        FROM c"""
