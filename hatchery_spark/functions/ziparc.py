"""ZIP container codec (PKWARE APPNOTE / ISO 21320-1) and DOCX text
extraction built on it — from scratch on the repo's own DEFLATE pair
(functions/deflate_enc.py encoder, functions/inflate.py decoder); stdlib
``zlib`` is used only for CRC-32 (the polynomial table, not a codec).

Why ZIP matters to a training-data engine: office formats (DOCX/XLSX/PPTX),
EPUB, and many dataset drops are ZIP containers; a corpus pipeline that
cannot open them treats real corpora as opaque bytes. The walker is strict
(signature, size, and CRC verification per member; overrun detection) with
a per-member error channel rather than silent truncation.

Reference analog: hatchery decodes gzip payloads in its source adapters
(pkg/adapter/*gzip paths); the container walk itself is engine-level work.

Scale shape: archives are rows (binary column); build and extract run in
mapInPandas/applyInPandas — per-task Python over Arrow batches, zero
shuffle beyond the one groupBy that assembles members into their archive.
Member extraction is pure per-row compute at any corpus size.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hatchery_spark.functions.deflate_enc import deflate_encode
from hatchery_spark.functions.inflate import inflate

__all__ = [
    "build_zip",
    "walk_zip",
    "zip_roundtrip_members",
    "build_docx_bytes",
    "docx_extract",
    "docx_roundtrip",
    "build_epub_bytes",
    "epub_extract",
    "epub_roundtrip",
]

_LOCAL_SIG = 0x04034B50
_CENTRAL_SIG = 0x02014B50
_EOCD_SIG = 0x06054B50
# fixed DOS timestamp (2025-01-01 00:00:00) — archives are byte-deterministic
_DOS_DATE = ((2025 - 1980) << 9) | (1 << 5) | 1
_DOS_TIME = 0


def build_zip(members: list[tuple[str, bytes, str]]) -> bytes:
    """Serialize ``(name, content, method)`` members ('store'|'deflate')
    into a ZIP archive: local headers + data, then the central directory,
    then end-of-central-directory. No encryption, no zip64 (4 GiB per
    member is plenty for a row-sized archive), no data descriptors."""
    out = bytearray()
    central = bytearray()
    for name, content, method in members:
        nb = name.encode("utf-8")
        crc = zlib.crc32(content) & 0xFFFFFFFF
        if method == "store":
            m, payload = 0, content
        elif method == "deflate":
            m, payload = 8, deflate_encode(content)
        else:
            raise ValueError(f"unsupported method {method!r}")
        offset = len(out)
        hdr = struct.pack(
            "<IHHHHHIIIHH",
            _LOCAL_SIG, 20, 0, m, _DOS_TIME, _DOS_DATE,
            crc, len(payload), len(content), len(nb), 0,
        )
        out += hdr + nb + payload
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII",
            _CENTRAL_SIG, 20, 20, 0, m, _DOS_TIME, _DOS_DATE,
            crc, len(payload), len(content), len(nb), 0, 0, 0, 0, 0, offset,
        ) + nb
    cd_off = len(out)
    out += central
    out += struct.pack(
        "<IHHHHIIH",
        _EOCD_SIG, 0, 0, len(members), len(members), len(central), cd_off, 0,
    )
    return bytes(out)


def walk_zip(blob: bytes) -> list[dict]:
    """Strict central-directory walk. Returns one dict per member:
    ``{name, method, crc_ok, size_ok, content}`` — content is the
    decompressed bytes (None when the method is unsupported). Raises
    ValueError on a structurally broken archive (missing/overrunning
    EOCD or directory)."""
    # EOCD: scan backwards over the trailing comment window
    tail = blob[-(0xFFFF + 22):] if len(blob) > 0xFFFF + 22 else blob
    pos = tail.rfind(struct.pack("<I", _EOCD_SIG))
    if pos < 0:
        raise ValueError("zip: no end-of-central-directory")
    eocd = tail[pos:]
    if len(eocd) < 22:
        raise ValueError("zip: truncated EOCD")
    (_, _, _, n_here, n_total, cd_size, cd_off, _) = struct.unpack(
        "<IHHHHIIH", eocd[:22]
    )
    if cd_off + cd_size > len(blob):
        raise ValueError("zip: central directory overruns archive")
    out: list[dict] = []
    p = cd_off
    for _ in range(n_total):
        if p + 46 > len(blob):
            raise ValueError("zip: truncated central entry")
        fields = struct.unpack("<IHHHHHHIIIHHHHHII", blob[p : p + 46])
        if fields[0] != _CENTRAL_SIG:
            raise ValueError("zip: bad central signature")
        (_, _, _, _, method, _, _, crc, csize, usize,
         nlen, xlen, clen, _, _, _, off) = fields
        name = blob[p + 46 : p + 46 + nlen].decode("utf-8")
        p += 46 + nlen + xlen + clen
        if off + 30 > len(blob):
            raise ValueError("zip: local header overruns archive")
        lh = struct.unpack("<IHHHHHIIIHH", blob[off : off + 30])
        if lh[0] != _LOCAL_SIG:
            raise ValueError("zip: bad local signature")
        data_off = off + 30 + lh[9] + lh[10]
        if data_off + csize > len(blob):
            raise ValueError("zip: member data overruns archive")
        payload = blob[data_off : data_off + csize]
        if method == 0:
            content: bytes | None = payload
        elif method == 8:
            content = inflate(payload)
        else:
            content = None
        rec = {
            "name": name,
            "method": {0: "store", 8: "deflate"}.get(method, f"m{method}"),
            "crc_ok": content is not None
            and (zlib.crc32(content) & 0xFFFFFFFF) == crc,
            "size_ok": content is not None and len(content) == usize,
            "content": content,
        }
        out.append(rec)
    return out


def zip_roundtrip_members(
    docs: DataFrame,
    archives: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """documents → ``archives`` ZIP blobs (member per doc, store/deflate
    alternating by doc_id parity) → strict walk back out. Returns one row
    per member: (doc_id, method, crc_ok, size_ok, text). Build is an
    applyInPandas over the archive key (bounded groups); extraction is the
    same task — the blob never leaves the executor, pinning the full
    serialize→parse loop."""

    def _roundtrip(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        members = [
            (
                f"doc/{did}.txt",
                str(txt).encode("utf-8"),
                "store" if did % 2 == 0 else "deflate",
            )
            for did, txt in zip(
                pdf[id_col].tolist(), pdf[text_col].tolist()
            )
        ]
        blob = build_zip(members)
        rows = []
        for m in walk_zip(blob):
            rows.append(
                {
                    "doc_id": int(m["name"].split("/")[1].split(".")[0]),
                    "method": m["method"],
                    "crc_ok": bool(m["crc_ok"]),
                    "size_ok": bool(m["size_ok"]),
                    "text": m["content"].decode("utf-8"),
                }
            )
        return pd.DataFrame(rows)

    return (
        docs.select(id_col, text_col)
        .withColumn("archive_id", (F.col(id_col) % archives).cast("long"))
        .groupBy("archive_id")
        .applyInPandas(
            _roundtrip,
            "doc_id long, method string, crc_ok boolean, size_ok boolean, text string",
        )
    )


# ------------------------------------------------------------------- DOCX

_DOCX_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
    'package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>'
)
_DOCX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/></Relationships>'
)
_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def build_docx_bytes(title: str, body: str) -> bytes:
    """Minimal valid DOCX: content types + package rels + document.xml with
    TWO paragraphs — the title, then the body split across two runs at the
    character midpoint (run rejoining is pinned by text equality on
    extraction). Runs carry xml:space="preserve" so edge spaces survive."""
    half = len(body) // 2
    runs = (
        f'<w:r><w:t xml:space="preserve">{_xml_escape(body[:half])}</w:t></w:r>'
        f'<w:r><w:t xml:space="preserve">{_xml_escape(body[half:])}</w:t></w:r>'
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>'
        f'<w:p><w:r><w:t xml:space="preserve">{_xml_escape(title)}</w:t></w:r></w:p>'
        f"<w:p>{runs}</w:p>"
        "</w:body></w:document>"
    )
    # members are STORED: the OOXML walk is what this builder exercises;
    # DEFLATE compression cost is paid (and pinned) by zip_roundtrip_members
    # and rel_deflate_encode, not 3× per document here
    return build_zip(
        [
            ("[Content_Types].xml", _DOCX_CT.encode(), "store"),
            ("_rels/.rels", _DOCX_RELS.encode(), "store"),
            ("word/document.xml", doc.encode("utf-8"), "store"),
        ]
    )


def docx_extract(blob: bytes) -> tuple[int, str]:
    """(n_paragraphs, text) from a DOCX blob: walk the ZIP, parse
    word/document.xml, join runs' <w:t> text within each paragraph and
    paragraphs with newlines — the standard plain-text projection."""
    import xml.etree.ElementTree as ET

    doc = None
    for m in walk_zip(blob):
        if m["name"] == "word/document.xml":
            if not (m["crc_ok"] and m["size_ok"]):
                raise ValueError("docx: corrupt document.xml member")
            doc = m["content"]
    if doc is None:
        raise ValueError("docx: no word/document.xml")
    root = ET.fromstring(doc)
    paras = []
    for p in root.iter(f"{{{_W_NS}}}p"):
        paras.append(
            "".join(t.text or "" for t in p.iter(f"{{{_W_NS}}}t"))
        )
    return len(paras), "\n".join(paras)


def docx_roundtrip(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document DOCX build → extract: (doc_id, n_paragraphs, text).
    One zero-shuffle Arrow pass; text must equal 'doc-<id>\\n<original>'."""

    def _rt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n_paras, texts = [], []
            for did, t in zip(b[id_col], b[text_col]):
                blob = build_docx_bytes(f"doc-{int(did)}", str(t))
                n, txt = docx_extract(blob)
                n_paras.append(n)
                texts.append(txt)
            yield pd.DataFrame(
                {id_col: b[id_col], "n_paragraphs": n_paras, "text": texts}
            )

    return docs.select(id_col, text_col).mapInPandas(
        _rt, f"{id_col} long, n_paragraphs int, text string"
    )


# ------------------------------------------------------------------- EPUB

_EPUB_CONTAINER = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:'
    'container"><rootfiles><rootfile full-path="OEBPS/content.opf" '
    'media-type="application/oebps-package+xml"/></rootfiles></container>'
)
_CNT_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF_NS = "http://www.idpf.org/2007/opf"
_XHTML_NS = "http://www.w3.org/1999/xhtml"


def build_epub_bytes(title: str, chapters: list[str]) -> bytes:
    """Minimal valid EPUB 3: the ``mimetype`` member FIRST and STORED (the
    OCF requirement that makes EPUBs sniffable at byte offset 38), a
    META-INF/container.xml pointing at the OPF package, and one XHTML
    spine item per chapter."""
    manifest = "".join(
        f'<item id="c{i}" href="c{i}.xhtml" media-type="application/xhtml+xml"/>'
        for i in range(len(chapters))
    )
    spine = "".join(f'<itemref idref="c{i}"/>' for i in range(len(chapters)))
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<package xmlns="{_OPF_NS}" version="3.0" unique-identifier="uid">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f'<dc:identifier id="uid">{_xml_escape(title)}</dc:identifier>'
        f"<dc:title>{_xml_escape(title)}</dc:title></metadata>"
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    )
    members = [
        ("mimetype", b"application/epub+zip", "store"),
        ("META-INF/container.xml", _EPUB_CONTAINER.encode(), "store"),
        ("OEBPS/content.opf", opf.encode("utf-8"), "store"),
    ]
    for i, ch in enumerate(chapters):
        x = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            f'<html xmlns="{_XHTML_NS}"><head><title>{_xml_escape(title)}'
            f"</title></head><body><p>{_xml_escape(ch)}</p></body></html>"
        )
        members.append((f"OEBPS/c{i}.xhtml", x.encode("utf-8"), "store"))
    return build_zip(members)


def epub_extract(blob: bytes) -> tuple[str, int, str]:
    """(title, n_chapters, text) — container.xml → OPF → spine-ordered
    XHTML chapters, body text joined with newlines. Strict: the mimetype
    member must be present, stored, and first; CRC/size must verify."""
    import xml.etree.ElementTree as ET

    members = walk_zip(blob)
    if not members or members[0]["name"] != "mimetype":
        raise ValueError("epub: mimetype member missing or not first")
    m0 = members[0]
    if m0["method"] != "store" or m0["content"] != b"application/epub+zip":
        raise ValueError("epub: mimetype must be stored application/epub+zip")
    parts = {}
    for m in members:
        if not (m["crc_ok"] and m["size_ok"]):
            raise ValueError(f"epub: corrupt member {m['name']}")
        parts[m["name"]] = m["content"]
    cont = ET.fromstring(parts["META-INF/container.xml"])
    root = cont.find(
        f"{{{_CNT_NS}}}rootfiles/{{{_CNT_NS}}}rootfile"
    ).get("full-path")
    base = root.rsplit("/", 1)[0] + "/" if "/" in root else ""
    opf = ET.fromstring(parts[root])
    title = opf.find(
        f"{{{_OPF_NS}}}metadata/{{http://purl.org/dc/elements/1.1/}}title"
    ).text
    hrefs = {
        it.get("id"): it.get("href")
        for it in opf.iter(f"{{{_OPF_NS}}}item")
    }
    texts = []
    for ref in opf.iter(f"{{{_OPF_NS}}}itemref"):
        x = ET.fromstring(parts[base + hrefs[ref.get("idref")]])
        body = x.find(f"{{{_XHTML_NS}}}body")
        texts.append("".join(body.itertext()))
    return title, len(texts), "\n".join(texts)


def epub_roundtrip(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document EPUB build → extract: (doc_id, title, n_chapters,
    text). Two chapters — first 40 chars, then the remainder — pin spine
    ordering and chapter joining; zero-shuffle Arrow pass."""

    def _rt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            titles, ns, texts = [], [], []
            for did, t in zip(b[id_col], b[text_col]):
                t = str(t)
                blob = build_epub_bytes(
                    f"book-{int(did)}", [t[:40], t[40:]]
                )
                title, n, txt = epub_extract(blob)
                titles.append(title)
                ns.append(n)
                texts.append(txt)
            yield pd.DataFrame(
                {id_col: b[id_col], "title": titles, "n_chapters": ns,
                 "text": texts}
            )

    return docs.select(id_col, text_col).mapInPandas(
        _rt, f"{id_col} long, title string, n_chapters int, text string"
    )
