"""mbox mailbox framing + RFC-5322 message parsing.

Mailing-list archives (a major pretraining corpus class) ship as mbox
files: messages concatenated, each introduced by a ``From `` separator
line, bodies From-munged so a body line that itself starts with ``From ``
cannot open a phantom message, headers folded at 78 columns, bodies
commonly quoted-printable encoded (RFC 2045 §6.7).

Same architecture as the WARC pair (warc.py): a distributed encoder
(applyInPandas, one file_id shuffle) builds the container from documents,
and a mapInPandas splitter/parser recovers every message. The catalog
oracle derives every output field — including the BODY TEXT — directly
from the source table, so any encode/decode asymmetry (QP escaping,
munging, folding, boundary handling) value-mismatches.

mboxrd munging is used (the variant that quotes ``>*From `` by adding one
more ``>``), because plain mboxo corrupts bodies that already contain
``>From `` — the decoder strips exactly one ``>``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP_LINE = "From MAILER-DAEMON Wed Jan  1 00:00:00 2025"
_QP_SAFE = set(
    bytes(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        "!\"#$%&'()*+,-./:;<>?@[\\]^_`{|}~ \t",
        "ascii",
    )
) - {ord("=")}


def qp_encode(text: str, width: int = 76) -> str:
    """Quoted-printable per RFC 2045 §6.7: '=' and non-printables become
    =XX (uppercase hex), trailing space/tab on a line is encoded, lines
    longer than ``width`` are wrapped with soft breaks ('=' + newline)."""
    out_lines = []
    for raw_line in text.split("\n"):
        data = raw_line.encode("utf-8")
        enc = []
        for i, b in enumerate(data):
            last = i == len(data) - 1
            if b in _QP_SAFE and not (last and b in (0x20, 0x09)):
                enc.append(chr(b))
            else:
                enc.append(f"={b:02X}")
        line = "".join(enc)
        # soft-wrap: each emitted line <= width incl. the trailing '='
        wrapped = []
        while len(line) > width:
            cut = width - 1
            # never split an =XX escape
            if line[cut - 1] == "=":
                cut -= 1
            elif line[cut - 2] == "=":
                cut -= 2
            wrapped.append(line[:cut] + "=")
            line = line[cut:]
        wrapped.append(line)
        out_lines.extend(wrapped)
    return "\n".join(out_lines)


def qp_decode(text: str) -> str:
    """Inverse of qp_encode: joins soft breaks, decodes =XX escapes
    (either hex case, per RFC 2045's robustness note)."""
    data = text.replace("=\n", "").encode("utf-8")
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == ord("=") and i + 2 < n:
            try:
                out.append(int(data[i + 1 : i + 3].decode("ascii"), 16))
                i += 3
                continue
            except (ValueError, UnicodeDecodeError):
                pass
        out.append(b)
        i += 1
    return out.decode("utf-8")


def mboxrd_mung(body: str) -> str:
    """Quote every body line matching />*From / with one more '>'."""
    out = []
    for ln in body.split("\n"):
        stripped = ln.lstrip(">")
        if stripped.startswith("From "):
            out.append(">" + ln)
        else:
            out.append(ln)
    return "\n".join(out)


def mboxrd_unmung(body: str) -> str:
    out = []
    for ln in body.split("\n"):
        stripped = ln.lstrip(">")
        if stripped.startswith("From ") and ln.startswith(">"):
            out.append(ln[1:])
        else:
            out.append(ln)
    return "\n".join(out)


def fold_header(name: str, value: str, width: int = 78) -> str:
    """RFC 5322 §2.2.3 folding: continuation lines start with one space."""
    line = f"{name}: {value}"
    if len(line) <= width:
        return line
    words = value.split(" ")
    lines, cur = [], f"{name}:"
    for w in words:
        if cur and len(cur) + 1 + len(w) > width and cur != f"{name}:":
            lines.append(cur)
            cur = " " + w
        else:
            cur += " " + w
    lines.append(cur)
    return "\n".join(lines)


def encode_mbox_message(msg_id: str, subject: str, sender: str, body: str) -> str:
    head = "\n".join(
        [
            _SEP_LINE,
            fold_header("Message-ID", f"<{msg_id}>"),
            fold_header("Subject", subject),
            fold_header("From", sender),
            "Date: Wed, 1 Jan 2025 00:00:00 +0000",
            "MIME-Version: 1.0",
            "Content-Type: text/plain; charset=utf-8",
            "Content-Transfer-Encoding: quoted-printable",
        ]
    )
    # A body-final newline is QP-escaped (=0A): in mbox the newline before
    # the next 'From ' line belongs to the SEPARATOR, so a literal trailing
    # newline would be silently eaten by any splitter — the classic mbox
    # trailing-blank-line ambiguity. Escaping it keeps the roundtrip exact.
    if body.endswith("\n"):
        qp = qp_encode(body[:-1]) + "=0A"
    else:
        qp = qp_encode(body)
    return head + "\n\n" + mboxrd_mung(qp) + "\n"


def build_mbox_files(
    docs: DataFrame,
    files: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents → (file_id, content) mbox blobs; membership and in-file
    order are data-derived (doc_id % files, ascending doc_id), so the
    output is deterministic at any parallelism."""
    recs = docs.select(
        F.pmod(F.col(id_col), F.lit(files)).alias("file_id"),
        F.col(id_col).alias("_rid"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_payload"),
    )

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rid")
        blob = "".join(
            encode_mbox_message(
                f"msg-{int(rid)}@example.com",
                f"Re: document {int(rid)} ingest",
                f"user{int(rid)}@example.com",
                payload,
            )
            for rid, payload in zip(pdf["_rid"], pdf["_payload"])
        )
        return pd.DataFrame(
            {"file_id": [int(pdf.file_id.iloc[0])], "content": [blob.encode("utf-8")]}
        )

    return recs.groupBy("file_id").applyInPandas(
        _encode, "file_id bigint, content binary"
    )


def split_mbox(buf: str) -> list[tuple[int, dict, str]]:
    """Split one mbox blob into (msg_idx, headers, decoded_body)."""
    msgs = []
    if not buf.startswith("From "):
        raise ValueError("mbox must start with a 'From ' separator line")
    # boundary = a line starting with 'From ' (bodies are munged, so any
    # in-body 'From ' was quoted by the encoder)
    chunks = ("\n" + buf).split("\nFrom ")[1:]
    for idx, chunk in enumerate(chunks):
        sep_and_rest = chunk.split("\n", 1)
        rest = sep_and_rest[1] if len(sep_and_rest) > 1 else ""
        head_raw, _, body_raw = rest.partition("\n\n")
        # unfold: continuation lines start with WSP
        unfolded: list[str] = []
        for ln in head_raw.split("\n"):
            if ln[:1] in (" ", "\t") and unfolded:
                unfolded[-1] += ln
            else:
                unfolded.append(ln)
        headers = {}
        for ln in unfolded:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        body = body_raw[:-1] if body_raw.endswith("\n") else body_raw
        cte = headers.get("content-transfer-encoding", "7bit").lower()
        decoded = mboxrd_unmung(body)
        if cte == "quoted-printable":
            decoded = qp_decode(decoded)
        msgs.append((idx, headers, decoded))
    return msgs


def parse_mbox(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mbox blobs → one row per message with parsed headers + decoded body."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, buf in zip(pdf["file_id"], pdf[content_col]):
                for idx, hdrs, body in split_mbox(bytes(buf).decode("utf-8")):
                    rows.append(
                        (
                            int(fid),
                            idx,
                            hdrs.get("message-id", "").strip("<>"),
                            hdrs.get("subject", ""),
                            hdrs.get("from", ""),
                            body,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["file_id", "msg_idx", "msg_id", "subject", "sender", "body"],
            )

    return df.mapInPandas(
        _parse,
        "file_id bigint, msg_idx int, msg_id string, subject string, "
        "sender string, body string",
    )
