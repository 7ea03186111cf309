"""Punycode codec vs Python's stdlib (independent RFC 3492 impl)."""

from __future__ import annotations

import random

import pytest

from hatchery_spark.functions.punycode import (
    idna_decode_label,
    idna_encode_label,
    punycode_decode,
    punycode_encode,
)

# RFC 3492 §7.2 sample label + common IDN pairs
KNOWN = [
    ("3B-ww4c5e180e575a65lsy2b", "3年B組金八先生"),
    ("bcher-kva", "bücher"),
    ("nxasmm1c", "βόλος"),
    ("80aafi6cg", "правда"),
    ("fiq228c", "中文"),
]


@pytest.mark.parametrize("ace, uni", KNOWN)
def test_known_vectors(ace, uni):
    assert punycode_decode(ace) == uni
    assert punycode_encode(uni) == ace


def _rand_strings(n=300, seed=7):
    rng = random.Random(seed)
    pools = [
        "abcdefghijklmnopqrstuvwxyz-0123456789",
        "äöüßéèñçøå",
        "αβγδεζηθικλ",
        "абвгдежзийк",
        "中文字符测试漢字",
        "🎉💩🚀☃",
    ]
    out = []
    for _ in range(n):
        ln = rng.randint(1, 24)
        picks = []
        for _ in range(ln):
            pool = pools[rng.randint(0, len(pools) - 1)]
            picks.append(pool[rng.randint(0, len(pool) - 1)])
        s = "".join(picks)
        if any(ord(c) >= 128 for c in s):
            out.append(s)
    return out


def test_matches_stdlib_both_directions():
    for s in _rand_strings():
        std = s.encode("punycode").decode("ascii")
        assert punycode_encode(s) == std, s
        assert punycode_decode(std) == s, s


def test_roundtrip_self():
    for s in _rand_strings(seed=11):
        assert punycode_decode(punycode_encode(s)) == s, s


def test_label_passthrough_and_prefix():
    assert idna_decode_label("plain-ascii") == "plain-ascii"
    assert idna_encode_label("plain-ascii") == "plain-ascii"
    assert idna_decode_label("xn--bcher-kva") == "bücher"
    assert idna_encode_label("bücher") == "xn--bcher-kva"
    # case-insensitive ACE prefix
    assert idna_decode_label("XN--bcher-kva") == "bücher"


def test_errors():
    with pytest.raises(ValueError):
        punycode_decode("!!")  # invalid digit
    with pytest.raises(ValueError):
        punycode_decode("bücher-")  # non-basic in literal part
    with pytest.raises(ValueError):
        punycode_decode("a-b")  # truncated integer ('b' alone ends mid-vli)
