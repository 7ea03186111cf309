"""ORC tail reader: protobuf walk, chunk framing through our codecs."""

import glob

import pytest

from hatchery_spark.functions.orc_meta import (
    parse_protobuf,
    read_orc_tail,
)


def test_protobuf_primitives():
    # hand-built message: field1 varint 300, field2 bytes "hi",
    # field3 fixed64, field4 fixed32
    buf = (
        b"\x08\xac\x02"  # 1<<3|0, varint 300
        b"\x12\x02hi"  # 2<<3|2, len 2
        b"\x19\x01\x00\x00\x00\x00\x00\x00\x00"  # 3<<3|1
        b"\x25\x07\x00\x00\x00"  # 4<<3|5
    )
    m = parse_protobuf(buf)
    assert m[1] == [300] and m[2] == [b"hi"]
    assert m[3] == [1] and m[4] == [7]


def test_rejects_non_orc():
    with pytest.raises(ValueError):
        read_orc_tail(b"\x00" * 64 + b"\x05")


@pytest.mark.parametrize("codec", ["zstd", "snappy", "zlib", "lz4", "none"])
def test_spark_orc_tails_all_codecs(spark, tmp_path, codec):
    """Every codec path decodes a REAL Spark-written ORC footer —
    third-party (JVM encoder) bytes through our from-scratch decoders."""
    df = spark.createDataFrame(
        [(i, f"s{i % 7}") for i in range(400)], "id long, s string"
    )
    out = str(tmp_path / codec)
    df.coalesce(1).sortWithinPartitions("id").write.option(
        "compression", codec
    ).orc(out)
    (path,) = glob.glob(out + "/part-*.orc")
    tail = read_orc_tail(open(path, "rb").read())
    assert tail["num_rows"] == 400
    assert tail["types"][0]["field_names"] == ["id", "s"]
    ids = tail["statistics"][1]
    assert (ids["min"], ids["max"], ids["num_values"]) == (0, 399, 400)
    ss = tail["statistics"][2]
    assert (ss["min"], ss["max"]) == ("s0", "s6")
    assert sum(s["num_rows"] for s in tail["stripes"]) == 400
