"""ZIP container codec + DOCX extraction (functions/ziparc.py)."""
from __future__ import annotations

import io
import zipfile

import pytest


def test_stdlib_reads_our_zip():
    from hatchery_spark.functions.ziparc import build_zip

    members = [
        ("a.txt", b"hello world " * 50, "deflate"),
        ("dir/b.bin", bytes(range(256)), "store"),
        ("empty.txt", b"", "deflate"),
    ]
    blob = build_zip(members)
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.testzip() is None
    for name, content, _m in members:
        assert zf.read(name) == content


def test_we_read_stdlib_zip():
    from hatchery_spark.functions.ziparc import walk_zip

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("x.txt", "some text " * 100, compress_type=zipfile.ZIP_DEFLATED)
        z.writestr("y.txt", "stored", compress_type=zipfile.ZIP_STORED)
    got = {m["name"]: m for m in walk_zip(buf.getvalue())}
    assert got["x.txt"]["content"].decode() == "some text " * 100
    assert got["x.txt"]["crc_ok"] and got["x.txt"]["size_ok"]
    assert got["y.txt"]["method"] == "store" and got["y.txt"]["content"] == b"stored"


def test_crc_corruption_flagged_not_silent():
    from hatchery_spark.functions.ziparc import build_zip, walk_zip

    blob = build_zip([("b.bin", bytes(range(256)), "store")])
    bad = bytearray(blob)
    bad[blob.find(bytes(range(256)))] ^= 0xFF
    (m,) = walk_zip(bytes(bad))
    assert not m["crc_ok"] and m["size_ok"]


def test_structural_breakage_raises():
    from hatchery_spark.functions.ziparc import build_zip, walk_zip

    blob = build_zip([("a.txt", b"x", "store")])
    with pytest.raises(ValueError):
        walk_zip(blob[: len(blob) // 2])  # EOCD gone
    with pytest.raises(ValueError):
        walk_zip(b"not a zip at all")


def test_unsupported_method_error_channel():
    # method 12 (bzip2) -> content None, crc_ok False, no exception
    import struct
    import zlib

    from hatchery_spark.functions.ziparc import walk_zip

    payload = b"\x00" * 4
    name = b"z.bz2"
    crc = zlib.crc32(b"????") & 0xFFFFFFFF
    lh = struct.pack("<IHHHHHIIIHH", 0x04034B50, 20, 0, 12, 0, 0, crc,
                     len(payload), 4, len(name), 0)
    local = lh + name + payload
    cd = struct.pack("<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0, 12, 0, 0,
                     crc, len(payload), 4, len(name), 0, 0, 0, 0, 0, 0) + name
    eocd = struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, 1, 1, len(cd), len(local), 0)
    (m,) = walk_zip(local + cd + eocd)
    assert m["method"] == "m12" and m["content"] is None and not m["crc_ok"]


def test_docx_opens_with_stdlib_and_escapes():
    from hatchery_spark.functions.ziparc import build_docx_bytes, docx_extract

    body = 'a & b < c > d " e  é'
    blob = build_docx_bytes("t1", body)
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert set(zf.namelist()) == {
        "[Content_Types].xml", "_rels/.rels", "word/document.xml"
    }
    assert zf.testzip() is None
    n, t = docx_extract(blob)
    assert (n, t) == (2, "t1\n" + body)


def test_docx_missing_document_raises():
    from hatchery_spark.functions.ziparc import build_zip, docx_extract

    with pytest.raises(ValueError):
        docx_extract(build_zip([("a.txt", b"x", "store")]))


def test_zip_roundtrip_members_spark(spark):
    from hatchery_spark.functions.ziparc import zip_roundtrip_members

    docs = spark.createDataFrame(
        [(i, f"text of doc {i} " * (i % 5 + 1)) for i in range(40)],
        "doc_id long, text string",
    )
    rows = zip_roundtrip_members(docs, archives=4).collect()
    assert len(rows) == 40
    for r in rows:
        assert r["crc_ok"] and r["size_ok"]
        assert r["method"] == ("store" if r["doc_id"] % 2 == 0 else "deflate")
        assert r["text"] == f"text of doc {r['doc_id']} " * (r["doc_id"] % 5 + 1)
