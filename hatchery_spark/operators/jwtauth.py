"""JWT (RFC 7519) render / parse / verify for auth-log pipelines.

Auth and audit streams carry bearer tokens; the triage pipeline needs to
crack them open (claims → route/enrich keys), check expiry against the
run's as-of time, and verify the HS256 signature so a tampered token is
flagged, not trusted. The reference's per-source auth handling is config
secrets (/root/reference/source/*/config.go); the token mechanics
themselves are public RFC 7515/7519.

Execution split, by what each engine is good at:

* header/payload assembly, base64url (translate +/→-_ and strip padding),
  the dot-join, the split-and-decode, and the JSON claim extraction are
  ALL JVM-side codegen (`base64`/`unbase64`/`translate`/`from_json`) —
  zero Python for the structural path.
* HMAC-SHA256 is the one primitive Spark SQL lacks (no secret-keyed hash
  builtin), so signing and verification run in ONE Arrow-batched
  pandas_udf over the signing input — Python's `hmac` is the ground
  truth; per-batch it's a tight C loop, never per-row Python in the plan.
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
        return signing_input.map(
            lambda s: base64.urlsafe_b64encode(
                hmac.new(key, s.encode(), "sha256").digest()
            ).rstrip(b"=").decode()
        )

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
    parts = F.split(F.col(token_col), r"\.")
    head, body, tag = (F.try_element_at(parts, F.lit(i)) for i in (1, 2, 3))
    hdr = F.from_json(unb64url(head), "alg string, typ string")
    claims = F.from_json(unb64url(body), claims_ddl)
    signing = F.concat(head, F.lit("."), body)
    expected = _hmac_udf(secret)(signing)
    return df.select(
        hdr["alg"].alias("alg"),
        hdr["typ"].alias("typ"),
        claims["sub"].alias("sub"),
        claims["scope"].alias("scope"),
        claims["iat"].alias("iat"),
        claims["exp"].alias("exp"),
        (claims["exp"] < F.unix_timestamp(F.lit(as_of).cast("timestamp"))).alias(
            "expired"
        ),
        (tag == expected).alias("sig_valid"),
    )
