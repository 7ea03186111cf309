"""Roaring: container selection, wire framing, roundtrips, membership."""

import struct

import pytest

from hatchery_spark.functions.roaring import (
    ARRAY_MAX,
    SERIAL_COOKIE,
    SERIAL_COOKIE_NO_RUN,
    container_stats,
    contains,
    deserialize,
    serialize,
)


def test_container_kind_selection():
    run = serialize(list(range(5000)))
    assert container_stats(run)["n_run"] == 1
    bmp = serialize([2 * i for i in range(5000)])  # card≥4096, runs too many
    assert container_stats(bmp)["n_bitmap"] == 1
    arr = serialize([17 * i for i in range(3000)])
    assert container_stats(arr)["n_array"] == 1


def test_cookie_and_offset_header_rules():
    no_run = serialize([17 * i for i in range(100)])
    assert struct.unpack_from("<I", no_run)[0] == SERIAL_COOKIE_NO_RUN
    with_run = serialize(list(range(300)))
    assert struct.unpack_from("<I", with_run)[0] & 0xFFFF == SERIAL_COOKIE
    # run cookie + n<4 → NO offset header: 4 cookie + 1 bitset + 4 desc
    # + 2 n_runs + 4 one run
    assert len(with_run) == 4 + 1 + 4 + 2 + 4
    # no-run cookie always has offsets: 4+4 header, 4 desc, 4 offset, body
    assert len(no_run) == 4 + 4 + 4 + 4 + 200


def test_multi_chunk_and_boundaries():
    vals = [0, 65535, 65536, 131071, 0xFFFFFFFF]
    buf = serialize(vals)
    assert deserialize(buf) == vals
    # chunks: 0 → {0,65535}, 1 → {0,65535}, 65535 → {65535}
    assert container_stats(buf)["n_containers"] == 3
    for v in vals:
        assert contains(buf, v)
    assert not contains(buf, 1) and not contains(buf, 65537)


def test_full_chunk_is_one_run():
    buf = serialize(list(range(65536)))
    st = container_stats(buf)
    assert st["n_run"] == 1 and st["n_bytes"] == 4 + 1 + 4 + 2 + 4


def test_array_max_boundary():
    # exactly 4096 sparse values: array no longer allowed → bitmap
    sparse = [3 * i for i in range(ARRAY_MAX)]
    assert container_stats(serialize(sparse))["n_bitmap"] == 1
    # 4095 sparse values → array
    assert container_stats(serialize(sparse[:-1]))["n_array"] == 1


def test_dedup_and_unsorted_input():
    assert deserialize(serialize([5, 1, 5, 3, 1])) == [1, 3, 5]


def test_rejects_out_of_range():
    with pytest.raises(ValueError):
        serialize([-1])
    with pytest.raises(ValueError):
        serialize([1 << 32])
    with pytest.raises(ValueError):
        deserialize(b"\x00\x00\x00\x00")
