"""Log-shipper framing operators: multiline record stitching.

A raw log stream is lines, not records: a Java stack trace, a wrapped JSON
body, or a continued syslog message arrives as one header line followed by
continuation lines that belong to it. Every shipper (filebeat's ``multiline``,
fluentd ``concat``, vector ``reduce``) stitches these back into records before
parsing — the reference sidesteps it because its SaaS sources emit structured
JSON objects (e.g. /root/reference/source/falcon_data_replicator/client.go
reads whole S3 objects), but a transcript/log pipeline ingesting raw text at
10^12 lines cannot.

Semantics (filebeat ``multiline.match: after``): a line that does NOT match
the header predicate attaches to the nearest PRECEDING header within its
stream. Orphan continuations (before any header — mid-file pickup after a
rotation) keep a NULL record id and surface as dead-letter records rather
than silently vanishing.

Plan shape at scale: one hash shuffle keyed on the stream id (the file /
conversation — the natural unit of log locality), a running ``max`` window
ordered by line number to propagate the header's line number forward, then
one partial-aggregated groupBy per record. The window never sees more than
one stream per frame — no global sort anywhere — and record sizes bound the
collect_list (a record is one stack trace, not a corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stitch_multiline(
    df: DataFrame,
    header_pred: Column,
    stream_col: str = "conv_id",
    order_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """Stitch continuation lines onto their preceding header line.

    Returns one row per record: ``(stream, rec_no, n_lines, message)`` where
    ``rec_no`` is the header's line number (−1 for the orphan dead-letter
    record) and ``message`` is the newline-joined record body in line order.

    The running header id is ``max(CASE WHEN header THEN line_no END)`` over
    an unbounded-preceding frame — ``max`` skips NULLs in every ANSI engine,
    which makes the propagation oracle-replayable (``last_value IGNORE
    NULLS`` is not spelled identically across engines). Line order inside a
    record is restored with ``array_sort`` over ``(line_no, line)`` structs,
    so the concat is deterministic regardless of shuffle arrival order.
    """
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rec = F.max(F.when(header_pred, F.col(order_col))).over(w)
    lined = df.select(
        F.col(stream_col).alias("stream"),
        F.coalesce(rec, F.lit(-1)).alias("rec_no"),
        F.struct(F.col(order_col).alias("n"), F.col(line_col).alias("l")).alias("sl"),
    )
    return (
        lined.groupBy("stream", "rec_no")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.concat_ws(
                "\n", F.transform(F.array_sort(F.collect_list("sl")), lambda s: s["l"])
            ).alias("message"),
        )
    )
