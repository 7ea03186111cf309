"""Magic-byte MIME sniffing: every in-repo encoder's output must classify
to its own type through the pure-codegen expression, and the ZIP/MP4 stubs
must be structurally valid."""

import io
import zipfile

import numpy as np
from pyspark.sql import functions as F

from hatchery_spark.functions.mime import mp4_stub, sniff_mime, zip_stub


def _sniff_all(spark, blobs: dict[str, bytes]) -> dict[str, str]:
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in blobs.items()], "name string, content binary"
    )
    out = df.select("name", sniff_mime(F.col("content")).alias("mime")).collect()
    return {r.name: r.mime for r in out}


def test_sniff_every_encoder(spark):
    from hatchery_spark.functions.bmp import encode_bmp_rgb
    from hatchery_spark.functions.gif import encode_gif
    from hatchery_spark.functions.jpeg import encode_jpeg
    from hatchery_spark.functions.multimodal import encode_png, encode_wav
    from hatchery_spark.functions.tiff import encode_tiff
    from hatchery_spark.functions.warc import encode_warc_record, gzip_member

    gray = np.full((8, 8), 7, dtype=np.uint8)
    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    got = _sniff_all(
        spark,
        {
            "png": encode_png(4, 4, (1, 2, 3)),
            "jpeg": encode_jpeg(8, 8, 100),
            "gif": encode_gif([gray % 2], pal),
            "bmp": encode_bmp_rgb(rgb),
            "tiff_le": encode_tiff(gray),
            "tiff_be": encode_tiff(gray, big_endian=True),
            "wav": encode_wav(16, 8000, 50),
            "gzip": gzip_member(b"x"),
            "zip": zip_stub("a.txt", b"hello"),
            "pdf": b"%PDF-1.7\n%%EOF",
            "mp4": mp4_stub(),
            "warc": encode_warc_record(1, b"body"),
            "avi": b"RIFF\x10\x00\x00\x00AVI LIST",
            "text": b"just some text",
            "empty": b"",
            "riff_unknown": b"RIFF\x04\x00\x00\x00XXXX",
        },
    )
    assert got == {
        "png": "image/png",
        "jpeg": "image/jpeg",
        "gif": "image/gif",
        "bmp": "image/bmp",
        "tiff_le": "image/tiff",
        "tiff_be": "image/tiff",
        "wav": "audio/wav",
        "gzip": "application/gzip",
        "zip": "application/zip",
        "pdf": "application/pdf",
        "mp4": "video/mp4",
        "warc": "application/warc",
        "avi": "video/avi",
        "text": "application/octet-stream",
        "empty": "application/octet-stream",
        "riff_unknown": "application/octet-stream",
    }


def test_zip_stub_is_a_real_archive():
    blob = zip_stub("a.txt", b"hello zip")
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        assert z.read("a.txt") == b"hello zip"
        assert z.testzip() is None


def test_sniff_expression_stays_codegen(spark):
    """The sniff is one projected expression: no exchange, no python eval."""
    df = spark.createDataFrame([(bytearray(b"%PDF"),)], "content binary")
    plan = df.select(sniff_mime(F.col("content")).alias("m"))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan
