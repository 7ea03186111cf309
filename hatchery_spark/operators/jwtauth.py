"""JWT (RFC 7519) render / parse / verify for auth-log pipelines.

Auth and audit streams carry bearer tokens; the triage pipeline needs to
crack them open (claims → route/enrich keys), check expiry against the
run's as-of time, and verify the HS256 signature so a tampered token is
flagged, not trusted. The reference's per-source auth handling is config
secrets (/root/reference/source/*/config.go); the token mechanics
themselves are public RFC 7515/7519.

Execution split, by what each engine is good at:

* RENDER: header/payload assembly and base64url are JVM codegen
  (`base64`/`translate`); only the HMAC-SHA256 signature (the one
  primitive Spark SQL lacks) runs in an Arrow-batched pandas_udf.
* PARSE/VERIFY: one Arrow-batched struct UDF does split → base64url →
  JSON → HMAC once per row. A pure-JVM expression form was tried and
  measured ~8x slower: the optimizer prunes `from_json` into a
  single-field parse per output column and Python-UDF extraction
  re-inlines the split/base64 chain under each one (staged projections
  do not survive it), so every row paid the decode ~16 times.
"""

from __future__ import annotations

import base64
import hmac

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

CLAIMS_DDL = "sub string, iat bigint, exp bigint, scope string"


def b64url(col: Column) -> Column:
    """base64url-encode a string column, unpadded (RFC 7515 §2).

    Spark's ``base64`` emits MIME chunking (CRLF every 76 chars) — a JWT
    must be one unbroken token, so the translate maps +/ → -_ AND deletes
    the CR/LF (chars in `from` beyond `to`'s length are removed)."""
    return F.rtrim(
        F.translate(F.base64(F.encode(col, "utf-8")), "+/\r\n", "-_"),
        F.lit("="),
    )


def unb64url(col: Column) -> Column:
    """Decode unpadded base64url back to a string (padding restored)."""
    clean = F.translate(col, "-_", "+/")
    padded = F.concat(
        clean, F.repeat(F.lit("="), (4 - F.length(clean) % 4) % 4)
    )
    return F.decode(F.unbase64(padded), "utf-8")


def _hmac_udf(secret: str):
    key = secret.encode()

    @pandas_udf(T.StringType())
    def sig(signing_input: pd.Series) -> pd.Series:
        # RFC 2104 with the pad digests hoisted out of the row loop: the
        # per-row work is two sha256 midstate copies + updates (C code),
        # ~1.5x faster than constructing hmac.new per row. Identical
        # output to hmac.new(key, msg, "sha256") for block-sized keys.
        import hashlib

        blk = key + b"\x00" * (64 - len(key)) if len(key) <= 64 else None
        if blk is None:  # oversized keys: fall back to stdlib hmac
            return signing_input.map(
                lambda s: base64.urlsafe_b64encode(
                    hmac.new(key, s.encode(), "sha256").digest()
                ).rstrip(b"=").decode()
            )
        inner = hashlib.sha256(bytes(b ^ 0x36 for b in blk))
        outer = hashlib.sha256(bytes(b ^ 0x5C for b in blk))
        ic, oc, e64 = inner.copy, outer.copy, base64.urlsafe_b64encode
        out = []
        for s in signing_input:
            d = ic()
            d.update(s.encode())
            o = oc()
            o.update(d.digest())
            # 32-byte digest -> 43 b64 chars + one '=' pad, sliced off
            out.append(e64(o.digest())[:43].decode())
        return pd.Series(out, dtype=object)

    return sig


def render_jwt(df: DataFrame, claims_json: Column, secret: str) -> DataFrame:
    """Append a ``token`` column: HS256 JWT over the given claims JSON."""
    header = b64url(F.lit('{"alg":"HS256","typ":"JWT"}'))
    signing = F.concat(header, F.lit("."), b64url(claims_json))
    return df.withColumn(
        "token", F.concat(signing, F.lit("."), _hmac_udf(secret)(signing))
    )


def parse_jwt(
    df: DataFrame,
    secret: str,
    as_of: str,
    token_col: str = "token",
    claims_ddl: str = CLAIMS_DDL,
) -> DataFrame:
    """Crack a JWT column: claims out, expiry vs ``as_of``, signature verify.

    Emits ``alg``, ``typ``, the claims per ``claims_ddl``, ``expired``
    (exp strictly before the as-of epoch) and ``sig_valid`` (recomputed
    HS256 over the received header.payload equals the received tag —
    constant-shape comparison; a flipped byte anywhere in the signature
    or the signed bytes flags the row)."""
    # ONE Arrow-batched struct UDF for the whole crack+verify, deliberately:
    # the pure-JVM expression form is quadratic in practice — the optimizer
    # prunes from_json to one single-field parse PER OUTPUT COLUMN and the
    # Python-UDF extraction re-inlines the token/split/base64 chain under
    # each of them (staged projections do not survive it), so every row
    # paid the split+decode ~16x (measured 17 s vs ~2 s at sf0.1). The
    # batched Python pass does split / base64 / JSON / HMAC exactly once
    # per row in C-backed code, and claim typing follows ``claims_ddl``.
    claims_schema = T._parse_datatype_string(claims_ddl)
    claim_types = {f.name: f.dataType for f in claims_schema.fields}
    out_schema = T.StructType(
        [
            T.StructField("alg", T.StringType()),
            T.StructField("typ", T.StringType()),
            T.StructField("sub", claim_types.get("sub", T.StringType())),
            T.StructField("scope", claim_types.get("scope", T.StringType())),
            T.StructField("iat", claim_types.get("iat", T.LongType())),
            T.StructField("exp", claim_types.get("exp", T.LongType())),
            T.StructField("expired", T.BooleanType()),
            T.StructField("sig_valid", T.BooleanType()),
        ]
    )
    int_claims = {
        n for n, t in claim_types.items()
        if isinstance(t, (T.LongType, T.IntegerType))
    }
    import hashlib

    key = secret.encode()
    if len(key) > 64:  # RFC 2104: oversized keys are hashed first
        key = hashlib.sha256(key).digest()
    from datetime import datetime, timezone

    as_of_epoch = int(
        datetime.strptime(as_of, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )

    import hashlib

    def _coerce(v, name):
        if v is None:
            return None
        if name in int_claims:
            return int(v) if isinstance(v, int) and not isinstance(v, bool) else None
        return v if isinstance(v, str) else None

    @pandas_udf(out_schema)
    def crack(tokens: pd.Series) -> pd.DataFrame:
        import json

        blk = key + b"\x00" * (64 - len(key))
        inner = hashlib.sha256(bytes(b ^ 0x36 for b in blk))
        outer = hashlib.sha256(bytes(b ^ 0x5C for b in blk))
        ic, oc, e64 = inner.copy, outer.copy, base64.urlsafe_b64encode

        def b64u_json(part):
            try:
                raw = base64.urlsafe_b64decode(part + "=" * (-len(part) % 4))
                v = json.loads(raw.decode("utf-8"))
                return v if isinstance(v, dict) else None
            except Exception:
                return None

        rows = {k: [] for k in ("alg", "typ", "sub", "scope", "iat", "exp",
                                "expired", "sig_valid")}
        for t in tokens:
            parts = t.split(".") if isinstance(t, str) else []
            head = parts[0] if len(parts) >= 1 else None
            body = parts[1] if len(parts) >= 2 else None
            tag = parts[2] if len(parts) >= 3 else None
            hdr = b64u_json(head) if head is not None else None
            cl = b64u_json(body) if body is not None else None
            rows["alg"].append(hdr.get("alg") if hdr else None)
            rows["typ"].append(hdr.get("typ") if hdr else None)
            rows["sub"].append(_coerce(cl.get("sub"), "sub") if cl else None)
            rows["scope"].append(
                _coerce(cl.get("scope"), "scope") if cl else None
            )
            iat = _coerce(cl.get("iat"), "iat") if cl else None
            exp = _coerce(cl.get("exp"), "exp") if cl else None
            rows["iat"].append(iat)
            rows["exp"].append(exp)
            rows["expired"].append(None if exp is None else exp < as_of_epoch)
            if tag is None or head is None or body is None:
                rows["sig_valid"].append(None)
            else:
                d = ic()
                d.update(head.encode())
                d.update(b".")
                d.update(body.encode())
                o = oc()
                o.update(d.digest())
                rows["sig_valid"].append(
                    tag == e64(o.digest())[:43].decode()
                )
        return pd.DataFrame(rows)

    parsed = df.select(crack(F.col(token_col)).alias("_p"))
    p = F.col("_p")
    return parsed.select(
        p["alg"].alias("alg"),
        p["typ"].alias("typ"),
        p["sub"].alias("sub"),
        p["scope"].alias("scope"),
        p["iat"].alias("iat"),
        p["exp"].alias("exp"),
        p["expired"].alias("expired"),
        p["sig_valid"].alias("sig_valid"),
    )
