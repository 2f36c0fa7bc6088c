"""Keccak + transcript bit-exactness against the reference's embedded golden
vectors (src/provider/keccak.rs tests)."""

import hashlib

from nova_tpu.fields.spec import bn254_scalar, pallas_scalar, secp_scalar
from nova_tpu.provider.keccak import Keccak256Transcript, Shake256, keccak256


def test_keccak256_reference_vector():
    # src/provider/keccak.rs:280-288
    out = keccak256((0xFFFFFFFF).to_bytes(4, "little"))
    assert out.hex() == "29045a592007d0c246ef02c2223570da9522d0cf0f73282c79a1bc8f0bb2c238"


def test_keccak256_empty():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_shake256_vs_hashlib():
    for msg in [b"", b"abc", b"test_from_label", bytes(range(200))]:
        r = Shake256().update(msg).finalize_xof()
        assert r.read(100) == hashlib.shake_256(msg).digest(100)


def _run_transcript(field, exp1, exp2):
    # mirrors test_keccak_transcript (src/provider/keccak.rs:215-258)
    t = Keccak256Transcript(b"test", field)
    t.absorb_bytes(b"s1", field.to_repr(2))
    t.absorb_bytes(b"s2", field.to_repr(5))
    c1 = t.squeeze(b"c1")
    assert field.to_repr(c1).hex() == exp1
    t.absorb_bytes(b"s3", field.to_repr(128))
    c2 = t.squeeze(b"c2")
    assert field.to_repr(c2).hex() == exp2


def test_transcript_golden_pallas():
    _run_transcript(
        pallas_scalar,
        "60dba8657186ff1abbeb237854707faf6ea79361546f8aae65a8fbb722c9ca0c",
        "8bb5dcd9f95115fbc178a1e76d04955423610f5788c7ef2ed200611fecfdf60b",
    )


def test_transcript_golden_bn254():
    _run_transcript(
        bn254_scalar,
        "0f8d4f359394760435374d3d603ce0e970ea12f7a05e88eccd52d845f4ac542a",
        "6b32523d63dedd6fb51d5dfc127b9d133cad433ea0b38c4627abadd0e4404c10",
    )


def test_transcript_golden_secp():
    _run_transcript(
        secp_scalar,
        "6dbabc32c27f3512d7592ca08e50e2ded102959bd4bb01245f2ea8dcbae74ec4",
        "c4a806654016a01dd6a0c80e2a5484cba5af27ec4a0fd838ecca11eb1b4437bd",
    )


def test_squeeze_bits():
    t = Keccak256Transcript(b"x", pallas_scalar)
    v = t.squeeze_bits(b"c", 16, False)
    assert v < (1 << 16)
    t2 = Keccak256Transcript(b"x", pallas_scalar)
    v2 = t2.squeeze_bits(b"c", 16, True)
    assert (v2 >> 15) & 1 == 1


def _run_transcript_evm(field, exp1, exp2):
    """mirrors the evm-feature test (src/provider/keccak.rs:261-276):
    scalars absorb big-endian, round counter big-endian, output halves
    swapped + reversed."""
    t = Keccak256Transcript(b"test", field, evm=True)
    t.absorb_bytes(b"s1", field.to_repr(2)[::-1])
    t.absorb_bytes(b"s2", field.to_repr(5)[::-1])
    c1 = t.squeeze(b"c1")
    assert field.to_repr(c1).hex() == exp1
    t.absorb_bytes(b"s3", field.to_repr(128)[::-1])
    c2 = t.squeeze(b"c2")
    assert field.to_repr(c2).hex() == exp2


def test_transcript_golden_evm():
    _run_transcript_evm(
        pallas_scalar,
        "78cce45b5f6cdc2021d9bba6c69c8c78c80c9a6ed65604db82d12166b28d212c",
        "7de5b755566a6a0423117770a9f3427f64fc0133dd6fc38a5e1f0790d3c6b20a",
    )
    _run_transcript_evm(
        bn254_scalar,
        "59b12afc64ee9e2e1740bcd6d881ca1fab187a6261366b48aaeb5e23d949cf20",
        "b17d158ee602f2434af680597b09b9770022408c98276f0f46cbbf13bd86e020",
    )
    _run_transcript_evm(
        secp_scalar,
        "f7ce678fa4de4f3bdbf1deaa5fc68e567f65e23ea2639585b01dc5127887721b",
        "a7fc93173c05e007ef1b30631400ed112463958e80a3af4d2508e4ac0e9a7409",
    )
