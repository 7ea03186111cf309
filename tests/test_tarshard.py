"""ustar tar shards: stdlib interop both directions, strictness paths."""

import io
import tarfile

import pytest

from hatchery_spark.functions.tarshard import read_tar, write_tar


def test_stdlib_reads_our_tar():
    buf = write_tar([("000000001.txt", b"hello"), ("000000001.json", b"{}")])
    with tarfile.open(fileobj=io.BytesIO(buf)) as tf:
        names = tf.getnames()
        assert names == ["000000001.txt", "000000001.json"]
        assert tf.extractfile(names[0]).read() == b"hello"
        info = tf.getmember(names[0])
        assert info.mtime == 1_700_000_000 and info.mode == 0o644


def test_we_read_stdlib_tar():
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        data = b"x" * 700                       # spans two data blocks
        ti = tarfile.TarInfo("a.txt")
        ti.size = len(data)
        tf.addfile(ti, io.BytesIO(data))
        ti2 = tarfile.TarInfo("a.json")
        ti2.size = 2
        tf.addfile(ti2, io.BytesIO(b"{}"))
    members = read_tar(bio.getvalue())
    assert members == [("a.txt", b"x" * 700), ("a.json", b"{}")]


def test_checksum_tamper_rejected():
    buf = bytearray(write_tar([("k.txt", b"data")]))
    buf[0] ^= 0x01                              # flip a name byte
    with pytest.raises(ValueError, match="checksum"):
        read_tar(bytes(buf))


def test_truncated_member_rejected():
    buf = write_tar([("k.txt", b"d" * 600)])
    with pytest.raises(ValueError, match="truncated"):
        read_tar(buf[: 512 + 512])              # header + first block only


def test_empty_file_and_block_padding():
    buf = write_tar([("e.txt", b""), ("f.txt", b"y" * 512)])
    assert len(buf) % 512 == 0
    assert read_tar(buf) == [("e.txt", b""), ("f.txt", b"y" * 512)]


def test_dataframe_roundtrip(spark):
    rows = [(i, f"doc {i}", "en", f"src{i % 3}", 5) for i in range(40)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from hatchery_spark.functions.tarshard import (
        read_webdataset,
        write_webdataset,
    )

    shards = write_webdataset(docs, n_shards=4)
    assert shards.count() == 4
    out = {r.doc_id: r for r in read_webdataset(shards).collect()}
    assert len(out) == 40
    assert out[7].key == "000000007" and out[7].text == "doc 7"
    assert out[7].shard_id == 3 and out[7].source == "src1"
