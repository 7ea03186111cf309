"""XLSX (SpreadsheetML, ECMA-376 / ISO 29500) build + extract on the repo's
ZIP container codec (functions/ziparc.py) — spreadsheet ingestion for a
corpus engine: real-world dataset drops and business corpora arrive as
workbooks, and a pipeline that cannot open them loses tabular training data.

Implements the minimum-but-real subset: workbook/worksheet/sharedStrings
parts wired by relationships, A1 cell references (bijective base-26 column
letters), shared-string cells (t="s"), inline-string cells (t="inlineStr"),
and numeric cells (no t). Formulas, styles, dates-as-serials, and multiple
sheets per workbook are out of scope and raise/surface honestly rather than
guessing.

Scale shape: workbooks are rows (binary blobs); build is an applyInPandas
over the workbook key (bounded groups), extraction a zero-shuffle
mapInPandas — per-row Python over Arrow batches, nothing corpus-sized on
the driver.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hatchery_spark.functions.ziparc import build_zip, walk_zip, _xml_escape

__all__ = ["col_letters", "letters_col", "build_xlsx", "parse_xlsx", "xlsx_roundtrip"]

_SS_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

_XLSX_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
    'package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>'
)
_XLSX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/></Relationships>'
)
_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://'
    'schemas.openxmlformats.org/officeDocument/2006/relationships/'
    'sharedStrings" Target="sharedStrings.xml"/></Relationships>'
)
_WB_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<workbook xmlns="{_SS_NS}" xmlns:r="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships"><sheets>'
    '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)


def col_letters(idx: int) -> str:
    """0-based column index → A1 letters (0→A, 25→Z, 26→AA … bijective
    base 26)."""
    if idx < 0:
        raise ValueError("column index must be >= 0")
    out = ""
    n = idx + 1
    while n:
        n, r = divmod(n - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def letters_col(ref: str) -> int:
    """A1 letters → 0-based column index (inverse of col_letters)."""
    n = 0
    for ch in ref:
        if not "A" <= ch <= "Z":
            raise ValueError(f"bad column letters {ref!r}")
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def build_xlsx(rows: list[list], kinds) -> bytes:
    """One-sheet workbook from ``rows`` (list of cell lists). ``kinds``: per
    column — 'n' numeric, 's' shared string, 'i' inline string — either ONE
    list applied to every row or a list of per-row lists (e.g. an
    inline-string header row over typed data rows). Numbers are serialized
    with repr (shortest round-trip form) so float() recovers the identical
    IEEE double."""
    per_row = bool(kinds) and isinstance(kinds[0], (list, tuple))
    shared: dict[str, int] = {}
    body = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        rk = kinds[ri - 1] if per_row else kinds
        for ci, (v, k) in enumerate(zip(row, rk)):
            ref = f"{col_letters(ci)}{ri}"
            if k == "n":
                cells.append(f'<c r="{ref}"><v>{repr(v)}</v></c>')
            elif k == "s":
                s = str(v)
                if s not in shared:
                    shared[s] = len(shared)
                cells.append(f'<c r="{ref}" t="s"><v>{shared[s]}</v></c>')
            elif k == "i":
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is>'
                    f'<t xml:space="preserve">{_xml_escape(str(v))}</t></is></c>'
                )
            else:
                raise ValueError(f"unknown cell kind {k!r}")
        body.append(f'<row r="{ri}">{"".join(cells)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_SS_NS}"><sheetData>{"".join(body)}</sheetData>'
        "</worksheet>"
    )
    ss_items = "".join(
        f'<si><t xml:space="preserve">{_xml_escape(s)}</t></si>'
        for s in shared  # dict preserves insertion order = index order
    )
    ss = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_SS_NS}" count="{len(shared)}" uniqueCount="{len(shared)}">'
        f"{ss_items}</sst>"
    )
    # stored members: the SpreadsheetML walk is the point here; DEFLATE cost
    # is exercised by the dedicated codec queries, not 6× per workbook
    return build_zip(
        [
            ("[Content_Types].xml", _XLSX_CT.encode(), "store"),
            ("_rels/.rels", _XLSX_RELS.encode(), "store"),
            ("xl/workbook.xml", _WB_XML.encode(), "store"),
            ("xl/_rels/workbook.xml.rels", _WB_RELS.encode(), "store"),
            ("xl/worksheets/sheet1.xml", sheet.encode("utf-8"), "store"),
            ("xl/sharedStrings.xml", ss.encode("utf-8"), "store"),
        ]
    )


def parse_xlsx(blob: bytes) -> list[dict]:
    """Extract sheet1 cells: list of {row (1-based), col (0-based), kind,
    s_val, n_val} — strings in s_val (shared or inline), numbers in n_val.
    Strict: members must pass CRC/size checks; unknown cell types raise."""
    import xml.etree.ElementTree as ET

    parts: dict[str, bytes] = {}
    for m in walk_zip(blob):
        if not (m["crc_ok"] and m["size_ok"]):
            raise ValueError(f"xlsx: corrupt member {m['name']}")
        parts[m["name"]] = m["content"]
    if "xl/worksheets/sheet1.xml" not in parts:
        raise ValueError("xlsx: no sheet1")
    shared: list[str] = []
    if "xl/sharedStrings.xml" in parts:
        sst = ET.fromstring(parts["xl/sharedStrings.xml"])
        for si in sst.iter(f"{{{_SS_NS}}}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{{{_SS_NS}}}t")))
    out: list[dict] = []
    sheet = ET.fromstring(parts["xl/worksheets/sheet1.xml"])
    for row in sheet.iter(f"{{{_SS_NS}}}row"):
        ri = int(row.get("r"))
        for c in row.iter(f"{{{_SS_NS}}}c"):
            ref = c.get("r")
            letters = ref.rstrip("0123456789")
            if int(ref[len(letters):]) != ri:
                raise ValueError(f"xlsx: cell {ref} outside row {ri}")
            ci = letters_col(letters)
            t = c.get("t")
            if t == "s":
                idx = int(c.find(f"{{{_SS_NS}}}v").text)
                out.append(
                    {"row": ri, "col": ci, "kind": "s",
                     "s_val": shared[idx], "n_val": None}
                )
            elif t == "inlineStr":
                is_el = c.find(f"{{{_SS_NS}}}is")
                txt = "".join(t2.text or "" for t2 in is_el.iter(f"{{{_SS_NS}}}t"))
                out.append(
                    {"row": ri, "col": ci, "kind": "i", "s_val": txt, "n_val": None}
                )
            elif t is None:
                v = c.find(f"{{{_SS_NS}}}v")
                out.append(
                    {"row": ri, "col": ci, "kind": "n",
                     "s_val": None, "n_val": float(v.text)}
                )
            else:
                raise ValueError(f"xlsx: unsupported cell type {t!r}")
    return out


def xlsx_roundtrip(orders: DataFrame, workbooks: int = 10) -> DataFrame:
    """orders → ``workbooks`` one-sheet XLSX blobs (header row + one data
    row per order: key/custkey numeric, status shared-string, priority
    inline-string, totalprice numeric) → parse back to typed rows. The
    blob never leaves its executor task. Returns (o_orderkey, o_custkey,
    o_orderstatus, o_orderpriority, o_totalprice) reconstructed purely
    from cell references — a lost or misplaced cell breaks the rebuild."""

    def _rt(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o_orderkey")
        rows = [["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_orderpriority", "o_totalprice"]]
        header_kinds = ["i", "i", "i", "i", "i"]
        data_kinds = ["n", "n", "s", "i", "n"]
        blob_rows = [
            list(t)
            for t in zip(
                pdf["o_orderkey"].tolist(), pdf["o_custkey"].tolist(),
                pdf["o_orderstatus"].tolist(),
                pdf["o_orderpriority"].tolist(),
                pdf["o_totalprice"].tolist(),
            )
        ]
        blob = build_xlsx(
            [rows[0]] + blob_rows,
            [header_kinds] + [data_kinds] * len(blob_rows),
        )
        cells = parse_xlsx(blob)
        grid: dict[int, dict[int, dict]] = {}
        for c in cells:
            grid.setdefault(c["row"], {})[c["col"]] = c
        recs = []
        for ri in sorted(grid):
            if ri == 1:
                continue  # header
            g = grid[ri]
            recs.append(
                {
                    "o_orderkey": int(g[0]["n_val"]),
                    "o_custkey": int(g[1]["n_val"]),
                    "o_orderstatus": g[2]["s_val"],
                    "o_orderpriority": g[3]["s_val"],
                    "o_totalprice": g[4]["n_val"],
                }
            )
        return pd.DataFrame(recs)

    return (
        orders.select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
            "o_totalprice",
        )
        .withColumn("wb", (F.col("o_orderkey") % workbooks).cast("long"))
        .groupBy("wb")
        .applyInPandas(
            _rt,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_orderpriority string, o_totalprice double",
        )
    )


# ------------------------------------------------------------------- PPTX

_P_NS = "http://schemas.openxmlformats.org/presentationml/2006/main"
_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"

_PPTX_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
    'package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
    "{slides}</Types>"
)
_PPTX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="ppt/presentation.xml"/></Relationships>'
)


def build_pptx_bytes(slides: list[list[str]]) -> bytes:
    """Minimal PPTX: one slide part per entry, each a list of text
    paragraphs rendered as DrawingML runs inside one shape. Slide order is
    carried by the presentation part's sldIdLst (the spine analog)."""
    from hatchery_spark.functions.ziparc import build_zip, _xml_escape

    ct_slides = "".join(
        f'<Override PartName="/ppt/slides/slide{i + 1}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.presentationml.'
        'slide+xml"/>'
        for i in range(len(slides))
    )
    sld_ids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rId{i + 1}"/>' for i in range(len(slides))
    )
    pres = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:presentation xmlns:p="{_P_NS}" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships">'
        f"<p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>"
    )
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/slide" '
            f'Target="slides/slide{i + 1}.xml"/>'
            for i in range(len(slides))
        )
        + "</Relationships>"
    )
    members = [
        ("[Content_Types].xml", _PPTX_CT.format(slides=ct_slides).encode(), "store"),
        ("_rels/.rels", _PPTX_RELS.encode(), "store"),
        ("ppt/presentation.xml", pres.encode("utf-8"), "store"),
        ("ppt/_rels/presentation.xml.rels", pres_rels.encode("utf-8"), "store"),
    ]
    for i, paras in enumerate(slides):
        body = "".join(
            f'<a:p><a:r><a:t>{_xml_escape(p)}</a:t></a:r></a:p>' for p in paras
        )
        sld = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:sld xmlns:p="{_P_NS}" xmlns:a="{_A_NS}"><p:cSld><p:spTree>'
            f"<p:sp><p:txBody>{body}</p:txBody></p:sp>"
            "</p:spTree></p:cSld></p:sld>"
        )
        members.append((f"ppt/slides/slide{i + 1}.xml", sld.encode("utf-8"), "store"))
    return build_zip(members)


def pptx_extract(blob: bytes) -> tuple[int, str]:
    """(n_slides, text): slides in sldIdLst order via the presentation
    rels, paragraphs joined with newlines, slides with double newlines."""
    import xml.etree.ElementTree as ET

    from hatchery_spark.functions.ziparc import walk_zip

    parts = {}
    for m in walk_zip(blob):
        if not (m["crc_ok"] and m["size_ok"]):
            raise ValueError(f"pptx: corrupt member {m['name']}")
        parts[m["name"]] = m["content"]
    if "ppt/presentation.xml" not in parts:
        raise ValueError("pptx: no presentation part")
    r_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pres = ET.fromstring(parts["ppt/presentation.xml"])
    rels = ET.fromstring(parts["ppt/_rels/presentation.xml.rels"])
    pkg_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    targets = {
        r.get("Id"): r.get("Target") for r in rels.iter(f"{{{pkg_ns}}}Relationship")
    }
    slide_texts = []
    for sid in pres.iter(f"{{{_P_NS}}}sldId"):
        target = targets[sid.get(f"{{{r_ns}}}id")]
        sld = ET.fromstring(parts["ppt/" + target])
        paras = [
            "".join(t.text or "" for t in p.iter(f"{{{_A_NS}}}t"))
            for p in sld.iter(f"{{{_A_NS}}}p")
        ]
        slide_texts.append("\n".join(paras))
    return len(slide_texts), "\n\n".join(slide_texts)


def pptx_roundtrip(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PPTX build → extract: two slides (title slide with
    'deck-<id>', content slide with the text split into two paragraphs at
    the char midpoint) pin slide ordering and paragraph joining."""

    def _rt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ns, texts = [], []
            for did, t in zip(b[id_col], b[text_col]):
                t = str(t)
                half = len(t) // 2
                blob = build_pptx_bytes(
                    [[f"deck-{int(did)}"], [t[:half], t[half:]]]
                )
                n, txt = pptx_extract(blob)
                ns.append(n)
                texts.append(txt)
            yield pd.DataFrame(
                {id_col: b[id_col], "n_slides": ns, "text": texts}
            )

    return docs.select(id_col, text_col).mapInPandas(
        _rt, f"{id_col} long, n_slides int, text string"
    )
