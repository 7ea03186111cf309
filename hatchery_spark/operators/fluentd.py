r"""Fluentd Forward-protocol chunks: render transcript turns into
msgpack Forward messages (the fluentd/fluent-bit log-shipping bus wire
format) and parse them back to rows, with the chunk framing byte-exact
enough that the oracle pins every chunk's serialized LENGTH from the
source rows alone.

A Forward-mode message (public spec:
fluent/fluentd wiki "Forward Protocol Specification v1") is

    [ tag:str, entries:[[EventTime, record:map], ...], option:map ]

where EventTime is msgpack fixext8 type 0 (32-bit sec ‖ 32-bit nsec)
and ``option["size"]`` declares the entry count — a receiver MUST
verify it against the actual array (we do; mismatch raises, pytest
covers it). Records carry ``{conv, turn, role, message}`` with
``message`` = the turn text UNTOUCHED, so the per-turn text-equality
invariant travels through the binary framing; entries are ordered by
(conv_id, turn_idx) inside each chunk — the stable-turn-order rule.

One chunk per (tag = tool, stripe = uid % N_STRIPES): grouping is ONE
exchange, each group serializes in a single Arrow batch
(applyInPandas), chunk sizes stay O(rows/tag/stripe) at any corpus
scale. Parse is mapInPandas over the chunk column + one explode back
to rows — no shuffle at all.

The oracle (fluentd_oracle_sql) replays the ENTIRE wire arithmetic in
SQL: fixstr/str8/str16 head widths for the message text, positive
fixint vs uint8/16/32 for turn indices, the fixarray/array16/32 head
for the entry count, the fixext8 EventTime (10 bytes), and the option
map — so a single head-width bug in the encoder shifts ``chunk_bytes``
on exactly the chunks whose values straddle a width boundary, the
cbor-roundtrip posture.

Reference analog: hatchery's per-source raw decode before field
extraction (source/*/client.go); codec: functions/msgpack.py.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hatchery_spark.functions import msgpack

N_STRIPES = 8
NSEC_STEP = 1000003  # nsec = turn_idx * NSEC_STEP % 1e9 — SQL-replayable


def render_forward_chunks(turns: DataFrame) -> DataFrame:
    """turns → (tag, stripe, chunk): one Forward message per (tool,
    uid % N_STRIPES) group, entries in (conv_id, turn_idx) order."""
    import pandas as pd

    uid = F.substring("conv_id", 6, 32).cast("long")
    src = turns.select(
        F.col("tool").alias("tag"),
        (uid % N_STRIPES).cast("int").alias("stripe"),
        "conv_id", "turn_idx", "role", "text",
        F.unix_timestamp("ts").alias("epoch_s"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["conv_id", "turn_idx"])
        entries = []
        for conv, turn, role, text, epoch in zip(
            pdf["conv_id"].tolist(), pdf["turn_idx"].tolist(),
            pdf["role"].tolist(), pdf["text"].tolist(),
            pdf["epoch_s"].tolist(),
        ):
            ts = msgpack.event_time(epoch, turn * NSEC_STEP % 1_000_000_000)
            rec = {
                "conv": conv,
                "turn": turn,
                "role": role,
                "message": text,
            }
            entries.append([ts, rec])
        msg = [pdf["tag"].iloc[0], entries, {"size": len(entries)}]
        return pd.DataFrame(
            [(pdf["tag"].iloc[0], int(pdf["stripe"].iloc[0]),
              msgpack.encode(msg))],
            columns=["tag", "stripe", "chunk"],
        )

    return src.groupBy("tag", "stripe").applyInPandas(
        build, "tag string, stripe int, chunk binary"
    )


def parse_forward_chunks(chunks: DataFrame) -> DataFrame:
    """(chunk) → per-turn rows. Strict: option.size must match the
    entry count, EventTime must be fixext8 type 0, and the chunk must
    decode to exactly one well-formed Forward message (functions/
    msgpack.decode already rejects truncation and trailing bytes)."""
    import pandas as pd

    def split(batches):
        for b in batches:
            out = []
            for chunk in b["chunk"]:
                wire = bytes(chunk)
                msg = msgpack.decode(wire)
                if not (isinstance(msg, list) and len(msg) == 3):
                    raise msgpack.MsgpackError("not a Forward message")
                tag, entries, option = msg
                if option.get("size") != len(entries):
                    raise msgpack.MsgpackError(
                        f"option.size {option.get('size')} != "
                        f"{len(entries)} entries"
                    )
                for et, rec in entries:
                    if not isinstance(et, msgpack.Ext) or et.type != 0:
                        raise msgpack.MsgpackError("bad EventTime ext")
                    sec, nsec = struct.unpack(">II", et.data)
                    out.append((
                        tag, len(wire), len(entries), rec["conv"],
                        rec["turn"], rec["role"], rec["message"],
                        sec, nsec,
                    ))
            yield pd.DataFrame(
                out,
                columns=["tag", "chunk_bytes", "n_entries", "conv_id",
                         "turn_idx", "role", "message", "epoch_s", "nsec"],
            )

    return chunks.select("chunk").mapInPandas(
        split,
        "tag string, chunk_bytes long, n_entries long, conv_id string, "
        "turn_idx long, role string, message string, epoch_s long, "
        "nsec long",
    )


def _str_sz(e: str) -> str:
    """SQL: serialized size of an ASCII msgpack str of length ``e``."""
    return (f"(CASE WHEN {e} < 32 THEN 1 WHEN {e} < 256 THEN 2"
            f" WHEN {e} < 65536 THEN 3 ELSE 5 END + {e})")


def _uint_sz(e: str) -> str:
    """SQL: serialized size of msgpack uint ``e`` (shortest form)."""
    return (f"(CASE WHEN {e} < 128 THEN 1 WHEN {e} < 256 THEN 2"
            f" WHEN {e} < 65536 THEN 3 WHEN {e} < 4294967296 THEN 5"
            f" ELSE 9 END)")


def fluentd_oracle_sql(transcripts_sql: str) -> str:
    """DuckDB replay: per-row fields from the source turns; chunk_bytes
    and n_entries re-derived by summing the spec's head-size arithmetic
    over each (tag, stripe) group — 1 (fixarray3) + tag str + entries
    array head + Σ entry + fixmap1 + "size" fixstr + uint(n)."""
    entry = " + ".join([
        "1",                                  # fixarray2 [EventTime, rec]
        "10",                                 # fixext8 EventTime
        "1",                                  # record fixmap4
        "5", _str_sz("length(conv_id)"),      # "conv" + value
        "5", _uint_sz("turn_idx"),            # "turn" + value
        "5", _str_sz("length(role)"),         # "role" + value
        "8", _str_sz("length(text)"),         # "message" + value
    ])
    n = "count(*)"
    arr_head = (f"(CASE WHEN {n} < 16 THEN 1 WHEN {n} < 65536 THEN 3"
                f" ELSE 5 END)")
    return f"""
        WITH t AS ({transcripts_sql}),
        g AS (
          SELECT tool AS tag,
                 cast(substring(conv_id, 6) AS bigint) % {N_STRIPES}
                   AS stripe,
                 count(*) AS n_entries,
                 cast(1 + {_str_sz('length(tool)')} + {arr_head}
                   + sum({entry})
                   + 1 + 5 + {_uint_sz(n)} AS bigint) AS chunk_bytes
          FROM t GROUP BY 1, 2
        )
        SELECT t.tool AS tag,
               g.chunk_bytes,
               g.n_entries,
               t.conv_id,
               cast(t.turn_idx AS bigint) AS turn_idx,
               t.role,
               t.text AS message,
               cast(floor(epoch(t.ts)) AS bigint) AS epoch_s,
               cast(t.turn_idx AS bigint) * {NSEC_STEP} % 1000000000
                 AS nsec
        FROM t
        JOIN g ON g.tag = t.tool
              AND g.stripe = cast(substring(t.conv_id, 6) AS bigint)
                    % {N_STRIPES}"""
