"""AES: FIPS-197 / SP 800-38A known-answer vectors + CTR properties."""

import pytest

from hatchery_spark.functions.aescrypt import (
    _SBOX,
    aes_ctr,
    aes_encrypt_block,
    key_expand,
    row_counter_block,
)


def test_sbox_spec_values():
    # FIPS-197 Figure 7 corners
    assert _SBOX[0x00] == 0x63
    assert _SBOX[0x01] == 0x7C
    assert _SBOX[0x53] == 0xED
    assert _SBOX[0xFF] == 0x16
    assert sorted(_SBOX) == list(range(256))  # a permutation


def test_fips197_known_answers():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    # C.1 / C.2 / C.3
    assert (
        aes_encrypt_block(pt, bytes(range(16))).hex()
        == "69c4e0d86a7b0430d8cdb78070b4c55a"
    )
    assert (
        aes_encrypt_block(pt, bytes(range(24))).hex()
        == "dda97ca4864cdfe06eaf70a0ec0d7191"
    )
    assert (
        aes_encrypt_block(pt, bytes(range(32))).hex()
        == "8ea2b7ca516745bfeafc49904b496089"
    )
    # Appendix B worked example
    assert (
        aes_encrypt_block(
            bytes.fromhex("3243f6a8885a308d313198a2e0370734"),
            bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"),
        ).hex()
        == "3925841d02dc09fbdc118597196a0b32"
    )


def test_sp800_38a_ctr_vector():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    ctr0 = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    pt = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
        "30c81c46a35ce411e5fbc1191a0a52ef"
        "f69f2445df4f9b17ad2b417be66c3710"
    )
    ct = (
        "874d6191b620e3261bef6864990db6ce"
        "9806f66b7970fdff8617187bb9fffdff"
        "5ae4df3edbd5d35e5b4f09020db03eab"
        "1e031dda2fbe03d1792170a0f3009cee"
    )
    assert aes_ctr(pt, key, ctr0).hex() == ct


def test_ctr_involution_and_partial_block():
    key = bytes(range(16))
    c0 = row_counter_block(7)
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes((i * 37) % 256 for i in range(n))
        enc = aes_ctr(data, key, c0)
        assert len(enc) == n
        assert aes_ctr(enc, key, c0) == data
        if n >= 16:
            assert enc != data


def test_distinct_rows_distinct_keystreams():
    key = bytes(range(16))
    z = bytes(32)
    a = aes_ctr(z, key, row_counter_block(1))
    b = aes_ctr(z, key, row_counter_block(2))
    assert a != b  # per-row nonce separates keystreams


def test_bad_key_length_rejected():
    with pytest.raises(ValueError):
        key_expand(b"short")
