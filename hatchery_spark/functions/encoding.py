"""Mojibake detection and repair (ftfy-style, principled subset).

Web-scraped corpora are full of UTF-8 text that was decoded as
cp1252/latin-1 somewhere upstream ("é" → "Ã©", "€" → "â‚¬", em-dash →
"â€""), sometimes twice. The standard repair inverts the bad decode:
re-encode the text with SLOPPY cp1252 and strictly re-decode as UTF-8 —
applied only when the full round trip succeeds AND changes the string, so
healthy text containing real accented characters is provably untouched (a
lone 'é' re-encodes to byte 0xE9, which is not a valid UTF-8 sequence
start, so the strict decode fails and the original is kept).

"Sloppy" cp1252 (the ftfy convention) maps the five cp1252-UNDEFINED
bytes 0x81/0x8D/0x8F/0x90/0x9D to their C1 control code points instead of
erroring — required because double-mojibake routinely produces characters
like U+201D whose UTF-8 encoding contains 0x9D, and real-world decoders
(browsers, ftfy) treat those bytes exactly this way.

Runs as one Arrow mapInPandas pass — per-row work is bounded by text
length, no shuffle, no driver involvement.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# cp1252's 0x80-0x9F block (Unicode mappings per the public cp1252 table);
# bytes absent here are undefined in strict cp1252 and map to chr(byte) in
# the sloppy variant.
_CP1252_C1 = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}
_C1_INVERSE = {cp: b for b, cp in _CP1252_C1.items()}


def sloppy_cp1252_decode(data: bytes) -> str:
    return "".join(
        chr(_CP1252_C1[b]) if b in _CP1252_C1 else chr(b) for b in data
    )


def sloppy_cp1252_encode(t: str) -> bytes | None:
    """Inverse of sloppy decode; None when any char has no byte image."""
    out = bytearray()
    for c in t:
        cp = ord(c)
        if cp in _C1_INVERSE:
            out.append(_C1_INVERSE[cp])
        elif cp <= 0xFF:
            out.append(cp)
        else:
            return None
    return bytes(out)


def repair_mojibake_text(t: str, max_rounds: int = 3) -> tuple[str, int]:
    """Undo up to ``max_rounds`` layers of utf8-read-as-cp1252 corruption.
    Returns (repaired, rounds_applied)."""
    rounds = 0
    for _ in range(max_rounds):
        raw = sloppy_cp1252_encode(t)
        if raw is None:
            break
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if fixed == t:
            break
        t = fixed
        rounds += 1
    return t, rounds


def corrupt_mojibake(t: str, times: int = 1) -> str:
    """The inverse operation, for fixtures/tests: read utf-8 bytes as
    sloppy-cp1252 ``times`` times."""
    for _ in range(times):
        t = sloppy_cp1252_decode(t.encode("utf-8"))
    return t


def fix_mojibake(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``repaired`` (the fixed text) and ``rounds`` (how many
    corruption layers were peeled; 0 = text was already healthy)."""
    out_cols = df.columns + ["repaired", "rounds"]
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", repaired string, rounds int"

    def _fix(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fixed = [
                repair_mojibake_text(t if isinstance(t, str) else "")
                for t in pdf[text_col]
            ]
            pdf = pdf.copy()
            pdf["repaired"] = [f[0] for f in fixed]
            pdf["rounds"] = [f[1] for f in fixed]
            yield pdf[out_cols]

    return df.mapInPandas(_fix, ddl)


def corrupt_mojibake_df(
    df: DataFrame, text_col: str = "text", times_col: str = "times"
) -> DataFrame:
    """Fixture/test helper: corrupt ``text_col`` by ``times_col`` layers of
    utf8-read-as-cp1252 (0 = leave healthy). Same shape out."""
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def _corrupt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[text_col] = [
                corrupt_mojibake(t, int(k)) if isinstance(t, str) else t
                for t, k in zip(pdf[text_col], pdf[times_col])
            ]
            yield pdf

    return df.mapInPandas(_corrupt, ddl)


# ------------------------------------------------------------------ ULID --

#: Crockford base32 (ULID spec): no I, L, O, U — sorts lexicographically
#: in timestamp order, the property log pipelines key object names on.
ULID_ALPHABET = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def ulid_encode_sql(ts_ms: str, r_hi: str, r_lo: str) -> str:
    """One neutral SQL expression (Spark ≥4 and DuckDB both parse it)
    rendering a 26-char ULID from a 48-bit millisecond timestamp and an
    80-bit random split as two 40-bit halves.

    Each output char is ``substr(alphabet, ((x >> s) & 31) + 1, 1)`` —
    26 codegen'd terms, no UDF, no shuffle. Lexicographic order of the
    result equals numeric order of (ts_ms, r_hi, r_lo) by construction
    (5-bit big-endian groups), which is the whole point of ULIDs as
    sortable object keys."""
    a = ULID_ALPHABET

    def ch(x: str, shift: int) -> str:
        return f"substr('{a}', cast((({x}) >> {shift}) & 31 AS int) + 1, 1)"

    parts = (
        [ch(ts_ms, 45 - 5 * i) for i in range(10)]
        + [ch(r_hi, 35 - 5 * i) for i in range(8)]
        + [ch(r_lo, 35 - 5 * i) for i in range(8)]
    )
    return "concat(" + ", ".join(parts) + ")"


def ulid_decode_ms_sql(u: str) -> str:
    """Neutral SQL recovering the millisecond timestamp from a ULID's
    first 10 chars: Σ (instr(alphabet, cᵢ) − 1) · 2^(45−5i)."""
    a = ULID_ALPHABET
    terms = [
        f"(cast(instr('{a}', substr({u}, {i + 1}, 1)) AS bigint) - 1)"
        f" * {1 << (45 - 5 * i)}"
        for i in range(10)
    ]
    return "(" + " + ".join(terms) + ")"
