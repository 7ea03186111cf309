r"""HTTP/1.1 request extraction from reassembled TCP streams — the
"follow TCP stream → application transactions" step (Zeek's http.log,
Wireshark's HTTP dissector) on top of operators/tcpstream.py.

Each turn renders as one pipelined request on its flow's connection:

    POST /t/<turn_idx> HTTP/1.1\r\n
    Host: hatchery.example\r\n
    X-Conv: <conv_id>\r\n
    Content-Length: <n>\r\n            (even turns)
      — or —
    Transfer-Encoding: chunked\r\n     (odd turns)
    \r\n
    <body = the raw turn text>

Chunked bodies cut into 32-octet chunks (``<hex-size>\r\n<chunk>\r\n``,
``0\r\n\r\n`` terminator) — a structurally different length walk from
Content-Length: sizes are in-band, hex, and repeat per chunk, so the
extractor's two framing branches are both exercised by every flow.
Bodies are the raw turn text: the per-turn text-equality invariant
rides through render → TCP segmentation (retransmits/overlaps) →
reassembly → HTTP framing walk.

A malformed request line, header block, or truncated body dead-letters
the REMAINDER of the flow (no reliable resync point mid-stream, same
contract as the RFC 6587 splitter).

Scale shape: rendering is pure codegen (the chunked body is a
transform/sequence expression — no UDF); the stream concat is one
conv-keyed order-proof aggregate; the extractor is one Arrow-batched
``mapInPandas`` walk per flow.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOST = "hatchery.example"
CHUNK = 32  # chunked-TE body slice, octets

_CRLF = "\r\n"


def _chunked_body(text: Column) -> Column:
    """``text`` → chunked-TE wire form, fully codegen: ceil(len/CHUNK)
    size-prefixed chunks plus the zero terminator."""
    n = F.ceil(F.length(text) / F.lit(CHUNK)).cast("int")
    chunks = F.when(
        F.length(text) > 0,
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda k: F.concat(
                F.lower(F.conv(
                    F.length(F.substring(text, k * CHUNK + 1, CHUNK))
                    .cast("string"),
                    10, 16,
                )),
                F.lit(_CRLF),
                F.substring(text, k * CHUNK + 1, CHUNK),
                F.lit(_CRLF),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(
        F.concat_ws("", chunks),
        F.lit("0" + _CRLF + _CRLF),
    )


def render_http_requests(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a ``req`` column: one HTTP/1.1 request per turn. Framing
    rotates by turn parity: even → Content-Length, odd → chunked."""
    text = F.col(text_col)
    head = F.concat(
        F.lit("POST /t/"),
        F.col("turn_idx").cast("string"),
        F.lit(" HTTP/1.1" + _CRLF + "Host: " + HOST + _CRLF + "X-Conv: "),
        F.col("conv_id"),
        F.lit(_CRLF),
    )
    even = F.pmod(F.col("turn_idx"), F.lit(2)) == 0
    req = F.when(
        even,
        F.concat(
            head,
            F.lit("Content-Length: "),
            F.length(text).cast("string"),
            F.lit(_CRLF + _CRLF),
            text,
        ),
    ).otherwise(
        F.concat(
            head,
            F.lit("Transfer-Encoding: chunked" + _CRLF + _CRLF),
            _chunked_body(text),
        )
    )
    return df.withColumn("req", req)


def concat_requests(df: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, req) → (conv_id, conv_text): the connection's
    byte stream, requests pipelined in turn order (order-proof)."""
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("turn_idx"), F.col("req")))
    )
    return df.groupBy("conv_id").agg(
        F.concat_ws("", F.transform(ordered, lambda s: s.req)).alias(
            "conv_text"
        )
    )


def extract_http_requests(streams: DataFrame) -> DataFrame:
    """(conv_id, stream) → one row per request: (conv_id, msg_idx,
    method, target, host, te, body, ok). Walks request-line → headers →
    body (Content-Length or chunked). Desync dead-letters the remainder
    (msg_idx = -1, ok = false, body = unconsumed suffix)."""

    def walk(batches):
        for pdf in batches:
            rows = {k: [] for k in
                    ("conv_id", "msg_idx", "method", "target", "host",
                     "te", "body", "ok")}

            def emit(cid, idx, method, target, host, te, body, ok):
                rows["conv_id"].append(cid)
                rows["msg_idx"].append(idx)
                rows["method"].append(method)
                rows["target"].append(target)
                rows["host"].append(host)
                rows["te"].append(te)
                rows["body"].append(body)
                rows["ok"].append(ok)

            for cid, s in zip(pdf["conv_id"], pdf["stream"]):
                i, idx, n_s = 0, 0, len(s)
                while i < n_s:
                    ok, parts = _one_request(s, i)
                    if not ok:
                        emit(cid, -1, "", "", "", "", s[i:], False)
                        break
                    i, method, target, host, te, body = parts
                    emit(cid, idx, method, target, host, te, body, True)
                    idx += 1
            yield pd.DataFrame(rows)

    return streams.mapInPandas(
        walk,
        "conv_id string, msg_idx int, method string, target string, "
        "host string, te string, body string, ok boolean",
    )


def _one_request(s: str, i: int):
    """Parse one request starting at offset i. Returns (True, (next_i,
    method, target, host, te, body)) or (False, None)."""
    end_head = s.find(_CRLF + _CRLF, i)
    if end_head < 0:
        return False, None
    head_lines = s[i:end_head].split(_CRLF)
    rq = head_lines[0].split(" ")
    if len(rq) != 3 or rq[2] != "HTTP/1.1":
        return False, None
    method, target = rq[0], rq[1]
    headers: dict[str, str] = {}
    for ln in head_lines[1:]:
        k, sep, v = ln.partition(":")
        if not sep:
            return False, None
        headers[k.strip().lower()] = v.strip()
    body_at = end_head + 4
    if headers.get("transfer-encoding") == "chunked":
        parts: list[str] = []
        j = body_at
        while True:
            nl = s.find(_CRLF, j)
            if nl < 0:
                return False, None
            size_hex = s[j:nl]
            try:
                size = int(size_hex, 16)
            except ValueError:
                return False, None
            j = nl + 2
            if size == 0:
                if s[j : j + 2] != _CRLF:
                    return False, None
                j += 2
                break
            if j + size + 2 > len(s) or s[j + size : j + size + 2] != _CRLF:
                return False, None
            parts.append(s[j : j + size])
            j += size + 2
        body = "".join(parts)
        te = "chunked"
        next_i = j
    else:
        cl = headers.get("content-length")
        if cl is None or not cl.isdigit():
            return False, None
        size = int(cl)
        if body_at + size > len(s):
            return False, None
        body = s[body_at : body_at + size]
        te = "cl"
        next_i = body_at + size
    return True, (next_i, method, target, headers.get("host", ""), te, body)
