r"""GELF (Graylog Extended Log Format) UDP chunking: render transcript
turns to GELF datagrams (chunked when the payload exceeds the datagram
budget) and reassemble them back — render is one explode fan-out, parse
is ONE message-id shuffle; both directions pure codegen, no UDF.

GELF is the wire format the Graylog shipper family emits; its chunked
mode is the interesting distributed-reassembly case: a message larger
than the UDP budget is split into up to 128 chunks, each prefixed with

    0x1E 0x0F | 8-byte message id | seq (1 byte) | count (1 byte)

and the receiver must reassemble by message id, in sequence order,
declaring the message lost unless EVERY declared chunk arrives
(reference analog: the raw-frame decode stage the per-source clients
apply before field extraction, source/*/client.go). Messages that fit
in one datagram are sent as the bare JSON payload (first byte ``{``),
so the parser branches on the magic bytes.

The payload JSON is assembled by string concatenation from a SHARED
template (not ``to_json``) so the oracle can reproduce the exact byte
length — chunk counts, chunk boundaries and message ids are therefore
all value-pinned from the source rows, and the reassembled
``short_message`` must equal the source text byte-for-byte (the
per-turn text-equality invariant through the frame). A deterministic
"UDP loss" predicate drops chunk seq=1 of every 50th multi-chunk
message, exercising the incomplete-message dead-letter branch; the
oracle replays the predicate, never the loss.

Scale shape: render = one codegen'd Project + one explode (fan-out is
ceil(len/chunk) per row, bounded by the 128-chunk GELF limit); parse =
ONE groupBy on message id (the only shuffle), reassembly via
array_sort + a binary-concat higher-order aggregate, then one
from_json. Unchunked rows never enter the shuffle (union of the two
branches), so the exchange carries only multi-chunk traffic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: syslog numeric levels GELF uses; freeform turns default to notice(5)
GELF_LEVEL = {"debug": 7, "info": 6, "warn": 4, "error": 3, "critical": 2}
DEFAULT_GELF_LEVEL = 5

#: payload bytes per chunk (deliberately small so sf-scale turns chunk)
CHUNK_BYTES = 96

#: GELF caps a message at 128 chunks
MAX_CHUNKS = 128

_JSON_SCHEMA = (
    "version string, host string, short_message string, level int, "
    "_conv_id string, _turn_idx int"
)


def _level_col(text: Column) -> Column:
    lvl = F.regexp_extract(text, r"^\[(\w+)\]", 1)
    out = F.lit(DEFAULT_GELF_LEVEL)
    for k, v in GELF_LEVEL.items():
        out = F.when(lvl == k, F.lit(v)).otherwise(out)
    return out


def _level_sql() -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in GELF_LEVEL.items())
    return (
        f"cast(CASE regexp_extract(text, '^\\[(\\w+)\\]', 1) {whens} "
        f"ELSE {DEFAULT_GELF_LEVEL} END AS int)"
    )


def render_gelf(df: DataFrame, chunk_bytes: int = CHUNK_BYTES) -> DataFrame:
    """Render each transcript turn to its GELF datagram(s): one output
    row per datagram, column ``frame`` (binary). Multi-chunk messages
    explode into `ceil(len/chunk_bytes)` rows; single-chunk messages
    emit the bare JSON payload. Expects (conv_id, turn_idx, text, tool).
    """
    level = _level_col(F.col("text"))
    host = F.concat(F.lit("agent-"), F.col("tool"))
    # single-source JSON template — mirrored byte-for-byte by gelf_oracle_sql
    payload = F.concat(
        F.lit('{"version":"1.1","host":"'), host,
        F.lit('","short_message":"'), F.col("text"),
        F.lit('","level":'), level.cast("string"),
        F.lit(',"_conv_id":"'), F.col("conv_id"),
        F.lit('","_turn_idx":'), F.col("turn_idx").cast("string"),
        F.lit("}"),
    )
    n_chunks = F.least(
        F.lit(MAX_CHUNKS),
        F.floor((F.length(payload) + chunk_bytes - 1) / chunk_bytes).cast("int"),
    )
    msg_id_hex = F.substring(
        F.md5(F.concat_ws(":", F.col("conv_id"), F.col("turn_idx").cast("string"))),
        1, 16,
    )
    base = df.select(
        payload.alias("_payload"),
        n_chunks.alias("_n"),
        msg_id_hex.alias("_mid"),
        F.col("turn_idx").alias("_ti"),
    )
    single = base.filter(F.col("_n") == 1).select(
        F.col("_payload").cast("binary").alias("frame"),
        F.col("_ti"),
        F.lit(1).alias("_n"),
    )
    byte = lambda c: F.unhex(F.lpad(F.hex(c), 2, "0"))  # noqa: E731
    chunked = (
        base.filter(F.col("_n") > 1)
        .select(
            "_payload", "_n", "_mid", "_ti",
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("_seq"),
        )
        .select(
            F.concat(
                F.lit(bytes([0x1E, 0x0F])),
                F.unhex(F.col("_mid")),
                byte(F.col("_seq")),
                byte(F.col("_n")),
                F.substring(
                    F.col("_payload"), F.col("_seq") * chunk_bytes + 1,
                    F.lit(chunk_bytes),
                ).cast("binary"),
            ).alias("frame"),
            F.col("_ti"),
            F.col("_seq"),
            F.col("_n"),
        )
    )
    return single.select("frame", "_ti", F.lit(None).cast("int").alias("_seq"), "_n") \
        .unionByName(chunked)


def drop_lost_chunks(frames: DataFrame) -> DataFrame:
    """Deterministic 'UDP loss' fixture: drop chunk seq=1 of every
    multi-chunk message whose turn_idx % 50 == 7 (replayed, not
    simulated, by the oracle). Requires render_gelf's _ti/_seq/_n."""
    lost = (F.col("_n") > 1) & (F.col("_seq") == 1) & (F.col("_ti") % 50 == 7)
    return frames.filter(~F.coalesce(lost, F.lit(False))).select("frame")


def parse_gelf(df: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Reassemble GELF datagrams back into messages. Returns one row per
    message: (msg_id, complete, n_chunks, host, level, conv_id,
    turn_idx, short_message) — msg_id NULL for unchunked datagrams,
    field columns NULL for incomplete (lost-chunk) messages.

    ONE shuffle: the groupBy on message id, carrying only multi-chunk
    traffic (unchunked frames take the union branch). Reassembly =
    array_sort on (seq, body) structs + a binary-concat aggregate;
    completeness = count == declared count AND a distinct, gap-free
    sequence (max seq == count-1 covers both with distinctness).
    """
    frame = F.col(frame_col)
    is_chunk = F.hex(F.substring(frame, 1, 2)) == "1E0F"

    single = df.filter(~is_chunk).select(
        F.lit(None).cast("string").alias("msg_id"),
        F.lit(True).alias("complete"),
        F.lit(1).alias("n_chunks"),
        frame.cast("string").alias("_payload"),
    )

    chunks = df.filter(is_chunk).select(
        F.lower(F.hex(F.substring(frame, 3, 8))).alias("msg_id"),
        F.conv(F.hex(F.substring(frame, 11, 1)), 16, 10).cast("int").alias("_seq"),
        F.conv(F.hex(F.substring(frame, 12, 1)), 16, 10).cast("int").alias("_cnt"),
        F.expr(f"substring({frame_col}, 13)").alias("_body"),
    )
    grouped = chunks.groupBy("msg_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_seq").alias("seq"),
                                    F.col("_body").alias("body")))
        ).alias("_parts"),
        F.max("_cnt").alias("n_chunks"),
        F.count(F.lit(1)).alias("_got"),
        F.countDistinct("_seq").alias("_uniq"),
        F.max("_seq").alias("_maxseq"),
    )
    reassembled = grouped.select(
        "msg_id",
        (
            (F.col("_got") == F.col("n_chunks"))
            & (F.col("_uniq") == F.col("n_chunks"))
            & (F.col("_maxseq") == F.col("n_chunks") - 1)
        ).alias("complete"),
        "n_chunks",
        F.aggregate(
            F.col("_parts"),
            F.lit("").cast("binary"),
            lambda acc, x: F.concat(acc, x["body"]),
        ).cast("string").alias("_payload"),
    )

    both = single.unionByName(reassembled)
    parsed = F.from_json(F.col("_payload"), _JSON_SCHEMA)
    ok = F.col("complete")
    return both.select(
        "msg_id",
        "complete",
        F.col("n_chunks").cast("int").alias("n_chunks"),
        F.when(ok, parsed["host"]).alias("host"),
        F.when(ok, parsed["level"]).cast("int").alias("level"),
        F.when(ok, parsed["_conv_id"]).alias("conv_id"),
        F.when(ok, parsed["_turn_idx"]).cast("int").alias("turn_idx"),
        F.when(ok, parsed["short_message"]).alias("short_message"),
    )


def gelf_oracle_sql(transcripts_sql: str, chunk_bytes: int = CHUNK_BYTES) -> str:
    """DuckDB replay: every output field computed DIRECTLY from the
    source turns — payload length (hence chunk count and the
    chunked/unchunked branch), message id, the loss predicate, and the
    reassembled fields; the frame bytes are never touched."""
    return f"""
        WITH t AS ({transcripts_sql}),
        m AS (
          SELECT conv_id, turn_idx, text,
                 'agent-' || tool AS host,
                 {_level_sql()} AS level,
                 length('{{"version":"1.1","host":"agent-' || tool ||
                        '","short_message":"' || text ||
                        '","level":') + length(cast({_level_sql()} AS varchar))
                   + length(',"_conv_id":"' || conv_id || '","_turn_idx":')
                   + length(cast(turn_idx AS varchar)) + 1 AS plen
          FROM t
        ),
        s AS (
          SELECT *,
            least({MAX_CHUNKS},
                  cast(ceil(plen / {chunk_bytes}.0) AS int)) AS n_chunks
          FROM m
        )
        SELECT
          CASE WHEN n_chunks > 1
               THEN substring(md5(conv_id || ':' || cast(turn_idx AS varchar)), 1, 16)
          END AS msg_id,
          NOT (n_chunks > 1 AND turn_idx % 50 = 7) AS complete,
          n_chunks,
          CASE WHEN NOT (n_chunks > 1 AND turn_idx % 50 = 7) THEN host END AS host,
          CASE WHEN NOT (n_chunks > 1 AND turn_idx % 50 = 7) THEN level END AS level,
          CASE WHEN NOT (n_chunks > 1 AND turn_idx % 50 = 7) THEN conv_id END AS conv_id,
          CASE WHEN NOT (n_chunks > 1 AND turn_idx % 50 = 7) THEN turn_idx END AS turn_idx,
          CASE WHEN NOT (n_chunks > 1 AND turn_idx % 50 = 7) THEN text END
            AS short_message
        FROM s"""
