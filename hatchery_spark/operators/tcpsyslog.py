"""RFC 6587 syslog transport over TCP: octet-counted framing + the
stream splitter — the composition layer between operators/syslog.py
(message framing) and operators/tcpstream.py (segment reassembly).

Syslog over TCP is not self-delimiting: RFC 6587 §3.4.1 prefixes every
SYSLOG-MSG with ``MSG-LEN SP`` (octet counting), and a collector must
(a) rebuild the TCP byte stream from out-of-order / duplicated /
overlapping segments, then (b) walk the length prefixes to cut message
boundaries — content is never inspected, so messages containing digits,
spaces, or things that look like frames cannot confuse the cut. A
desync (corrupted or truncated stream) dead-letters the REMAINDER of
that flow: once the length walk loses its footing there is no reliable
resynchronization point (the RFC's own caveat about octet counting).

Scale shape: framing is one conv-keyed order-proof aggregate; the
splitter is one Arrow-batched ``mapInPandas`` walk per flow row — no
shuffle beyond the reassembly's own, flows stay independent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sanity cap on the MSG-LEN prefix (RFC 5424 messages are < 1 MiB here)
_MAX_LEN_DIGITS = 9


def frame_octet_counted(lines: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, line) → (conv_id, conv_text): each line
    becomes ``LEN SP line`` (LEN = character count; the synthetic lines
    are ASCII so char == octet, matching tcpstream's char offsets), and
    a flow's frames concatenate in turn order. Order-proof: frames
    travel as (turn_idx, frame) structs through array_sort, so shuffle
    order can never reorder the wire."""
    frame = F.concat(
        F.length("line").cast("string"), F.lit(" "), F.col("line")
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("turn_idx"), frame.alias("frame")))
    )
    return lines.groupBy("conv_id").agg(
        F.concat_ws("", F.transform(ordered, lambda s: s.frame)).alias(
            "conv_text"
        )
    )


def split_octet_counted(streams: DataFrame) -> DataFrame:
    """(conv_id, stream) → (conv_id, msg_idx, line, ok): walk the
    ``MSG-LEN SP`` prefixes sequentially. Any malformed prefix or
    truncated payload dead-letters the remainder as one row
    (msg_idx = -1, ok = false)."""

    def walk(batches):
        for pdf in batches:
            cids, idxs, lns, oks = [], [], [], []
            for cid, s in zip(pdf["conv_id"], pdf["stream"]):
                i, idx = 0, 0
                n_s = len(s)
                while i < n_s:
                    j = s.find(" ", i, i + _MAX_LEN_DIGITS + 1)
                    if j > i and s[i:j].isdigit():
                        n = int(s[i:j])
                        start = j + 1
                        if start + n <= n_s:
                            cids.append(cid)
                            idxs.append(idx)
                            lns.append(s[start : start + n])
                            oks.append(True)
                            idx += 1
                            i = start + n
                            continue
                    cids.append(cid)
                    idxs.append(-1)
                    lns.append(s[i:])
                    oks.append(False)
                    break
            yield pd.DataFrame(
                {"conv_id": cids, "msg_idx": idxs, "line": lns, "ok": oks}
            )

    return streams.mapInPandas(
        walk, "conv_id string, msg_idx int, line string, ok boolean"
    )
