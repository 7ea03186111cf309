"""TCP stream reassembly — sequence-number algebra as pure relational ops.

The capture side of this repo (operators/pcap.py) frames UDP, where every
datagram is independent. TCP flows are the other half of real capture
analysis: segments arrive OUT OF ORDER, duplicated (retransmits), and
OVERLAPPING (a retransmit that re-sends old bytes plus new ones), and the
collector must rebuild the exact byte stream or flag the flow incomplete
(a capture gap). Wireshark's "Follow TCP Stream" and Zeek's stream
reassembler implement exactly this contract.

The whole algorithm is windows + string algebra — no UDF anywhere:

* order segments by ``(seq ASC, end DESC)`` — at a duplicated seq the
  longest segment wins the front;
* ``covered`` = running max of ``end`` over all PRIOR segments — the
  high-water mark of bytes already reassembled;
* each segment contributes ``piece``: nothing if fully covered
  (``covered >= end`` — an exact retransmit), its tail beyond the mark
  if partially covered (``substr(payload, covered - seq + 1)`` — an
  overlapping retransmit), else the whole payload;
* a segment with ``seq > covered`` starts past the high-water mark — a
  HOLE; the flow dead-letters as ``complete = false`` (Zeek's
  content_gap). Reassembly still emits the bytes it has.

Offsets are CHARACTER positions (both engines' substr/length are
character-based; the synthetic payloads are single-byte chars, so char
== octet here). Per-flow concat is order-proof: pieces travel as
``struct(seq, neg_end, piece)`` through ``array_sort`` — shuffle order
can never corrupt the stream.

Plan shape: segmentation is one conv-keyed ordered aggregate (the
stream rebuild) + a codegen explode; reassembly is ONE flow-keyed
window pass + one flow-keyed aggregate. Flows are independent — the
shape scales by adding executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEG = 64          # segment payload chars
OVERLAP_EXTRA = 16  # overlapping-retransmit extension

#: md5 gates (mod 16 on the segment key): 0 = exact duplicate retransmit,
#: 1 = overlapping retransmit; flow-level mod 10 == 0 drops the middle
#: segment (capture hole)
DUP_GATE = 0
OVERLAP_GATE = 1
HOLE_MOD = 10


def _md5_long(col):
    from hatchery_spark.functions.graph import _md5_prefix_long

    return _md5_prefix_long(col)


def segment_streams(conv: DataFrame) -> DataFrame:
    """Cut each conversation's rebuilt text into TCP-style segments with
    planted retransmits, overlaps, and capture holes.

    ``conv``: (conv_id, conv_text) — one row per flow. Returns
    ``(conv_id, seq, payload)`` with seq = 0-based char offset. The
    planting is md5-gated so the oracle replays every decision.
    """
    # The stream is cut into SEG-char chunks in ONE linear regex pass and
    # the wire (segments + planted copies) is then built from the chunk
    # ARRAY, deliberately. Two prior forms were each quadratic in stream
    # length and dominated this stage (7.8 s → 0.9 s at sf0.1):
    #   * explode-index-then-substring carried the FULL conv_text through
    #     the Generate into every segment row (O(len²/SEG) bytes);
    #   * per-k substring inside a transform lambda avoided the copy but
    #     paid UTF8String's O(position) char-offset scan per slice.
    # Chunk equality with substring slicing is exact: '(?s).{1,SEG}' is
    # greedy and consecutive, so chunk k == substring(text, k·SEG+1, SEG)
    # for any text (char semantics in both, verified concat-identity).
    # One flatten/explode pass, NOT a 3-branch union: a union of three
    # filters over the same frame re-executes the conversation rebuild
    # (and its source window) once per branch — 3× the work at any scale.
    base = conv.select(
        "conv_id",
        F.expr(
            f"regexp_extract_all(conv_text, '(?s).{{1,{SEG}}}', 0)"
        ).alias("_chunks"),
        # flow-level gate hashed ONCE per conversation, not per segment
        F.pmod(_md5_long(F.col("conv_id")), F.lit(HOLE_MOD)).alias("hole_g"),
    ).select(
        "conv_id", "_chunks", "hole_g",
        F.size("_chunks").cast("long").alias("nseg"),
    )
    seg_t = "array<struct<seq:bigint,payload:string>>"
    empty = F.array().cast(seg_t)
    chunks = F.col("_chunks")

    def _per_k(k):
        seq = (k * SEG).cast("long")
        payload = F.element_at(chunks, (k + 1).cast("int"))
        # overlapping retransmit re-sends the segment plus the next
        # OVERLAP_EXTRA chars — the first slice of the following chunk
        payload_ov = F.concat(
            payload,
            F.coalesce(
                F.substring(
                    F.try_element_at(chunks, (k + 2).cast("int")),
                    1, OVERLAP_EXTRA,
                ),
                F.lit(""),
            ),
        )
        gate = F.pmod(
            _md5_long(F.concat_ws("-", F.col("conv_id"), k)), F.lit(16)
        )
        one = lambda pl: F.array(  # noqa: E731
            F.struct(seq.alias("seq"), pl.alias("payload"))
        )
        copies = F.concat(
            one(payload),
            F.when(gate == DUP_GATE, one(payload)).otherwise(empty),
            F.when(gate == OVERLAP_GATE, one(payload_ov)).otherwise(empty),
        )
        # capture hole: gated flows lose their middle segment entirely
        return F.when(
            (F.col("hole_g") == 0)
            & (k == (F.col("nseg") / 2).cast("long")),
            empty,
        ).otherwise(copies)

    wire = F.flatten(
        F.transform(F.sequence(F.lit(0), F.col("nseg") - 1), _per_k)
    )
    return base.where(F.col("nseg") > 0).select(
        "conv_id", F.explode(wire).alias("_s")
    ).select(
        "conv_id",
        F.col("_s")["seq"].alias("seq"),
        F.col("_s")["payload"].alias("payload"),
    )


def reassemble_streams(segments: DataFrame) -> DataFrame:
    """Rebuild each flow from its segments. Returns per flow:
    ``conv_id, n_segments, n_redundant, complete, stream_len, stream``.
    """
    end = (F.col("seq") + F.length("payload")).alias("end")
    s = segments.select("conv_id", "seq", F.col("payload"), end)
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("seq").asc(), F.col("end").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = s.withColumn("covered", F.coalesce(F.max("end").over(w), F.lit(0)))
    pieces = marked.select(
        "conv_id", "seq", "end",
        F.when(F.col("covered") >= F.col("end"), F.lit(""))
        .when(
            F.col("covered") > F.col("seq"),
            F.expr("substring(payload, cast(covered - seq + 1 AS int))"),
        )
        .otherwise(F.col("payload"))
        .alias("piece"),
        (F.col("seq") > F.col("covered")).alias("gap"),
        (F.col("covered") >= F.col("end")).alias("redundant"),
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("seq"), (-F.col("end")).alias("ne"), F.col("piece")))
    )
    return pieces.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(F.col("redundant").cast("long")).cast("long").alias("n_redundant"),
        (~F.max("gap")).alias("complete"),
        F.concat_ws("", F.transform(ordered, lambda x: x.piece)).alias("stream"),
    ).withColumn("stream_len", F.length("stream").cast("long"))


def tcp_oracle_sql(conv_sql: str) -> str:
    """DuckDB replay of segmentation, planting gates, and reassembly.
    ``conv_sql`` must yield (conv_id, conv_text)."""
    from hatchery_spark.plans.driver_queries import _hex_decode_terms

    seg_gate = _hex_decode_terms("hk")
    flow_gate = _hex_decode_terms("hc")
    return f"""
        WITH conv AS ({conv_sql}),
        base AS (
          SELECT conv_id, conv_text, length(conv_text) AS slen,
                 cast(ceil(length(conv_text) / {SEG}.0) AS bigint) AS nseg
          FROM conv),
        segs AS (
          SELECT conv_id, nseg, k,
                 cast(k * {SEG} AS bigint) AS seq,
                 substr(conv_text, cast(k * {SEG} + 1 AS int), {SEG})
                   AS payload,
                 substr(conv_text, cast(k * {SEG} + 1 AS int),
                        {SEG + OVERLAP_EXTRA}) AS payload_ov,
                 substr(md5(conv_id || '-' || cast(k AS varchar)), 1, 8)
                   AS hk,
                 substr(md5(conv_id), 1, 8) AS hc
          FROM base, unnest(range(0, nseg)) AS u(k)),
        gated AS (
          SELECT *, ({seg_gate}) % 16 AS gate,
                 ({flow_gate}) % {HOLE_MOD} AS hole_g
          FROM segs),
        kept AS (
          SELECT * FROM gated
          WHERE NOT (hole_g = 0 AND k = nseg // 2)),
        wire AS (
          SELECT conv_id, seq, payload FROM kept
          UNION ALL
          SELECT conv_id, seq, payload FROM kept WHERE gate = {DUP_GATE}
          UNION ALL
          SELECT conv_id, seq, payload_ov FROM kept
          WHERE gate = {OVERLAP_GATE}),
        marked AS (
          SELECT conv_id, seq, seq + length(payload) AS e, payload,
                 coalesce(max(seq + length(payload)) OVER (
                   PARTITION BY conv_id
                   ORDER BY seq ASC, seq + length(payload) DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS covered
          FROM wire),
        pieces AS (
          SELECT conv_id, seq, e,
                 CASE WHEN covered >= e THEN ''
                      WHEN covered > seq
                        THEN substr(payload, cast(covered - seq + 1 AS int))
                      ELSE payload END AS piece,
                 seq > covered AS gap,
                 covered >= e AS redundant
          FROM marked)
        SELECT conv_id,
               cast(count(*) AS bigint) AS n_segments,
               cast(sum(CASE WHEN redundant THEN 1 ELSE 0 END) AS bigint)
                 AS n_redundant,
               NOT bool_or(gap) AS complete,
               cast(length(string_agg(piece, '' ORDER BY seq, e DESC))
                    AS bigint) AS stream_len,
               string_agg(piece, '' ORDER BY seq, e DESC) AS stream
        FROM pieces GROUP BY conv_id"""
