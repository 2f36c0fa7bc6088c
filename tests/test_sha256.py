"""SHA-256 / UInt32 / MultiEq gadget tests (reference:
src/frontend/gadgets/{sha256,uint32,multieq}.rs tests)."""

import hashlib
import random

import pytest

from nova_tpu.frontend.boolean import AllocatedBit, Boolean
from nova_tpu.frontend.constraint_system import TestConstraintSystem
from nova_tpu.frontend.sha256 import sha256, sha256_compression_function
from nova_tpu.frontend.uint32 import MultiEq, UInt32
from nova_tpu.provider.engines import PallasEngine

rng = random.Random(0x5EED)
F = PallasEngine.scalar


def _alloc_bits_be(cs, data: bytes):
    bits = []
    for byte in data:
        for i in range(8):
            bits.append(
                Boolean.from_bit(AllocatedBit.alloc(cs, bool((byte >> (7 - i)) & 1)))
            )
    return bits


@pytest.mark.parametrize("msg_len", [0, 3, 55, 56, 64, 100])
def test_sha256_matches_hashlib(msg_len):
    msg = bytes(rng.getrandbits(8) for _ in range(msg_len))
    cs = TestConstraintSystem(F)
    bits = _alloc_bits_be(cs, msg)
    out = sha256(cs, bits)
    assert cs.is_satisfied()
    got = 0
    for b in out:
        got = (got << 1) | (1 if b.get_value() else 0)
    assert got == int.from_bytes(hashlib.sha256(msg).digest(), "big")


def test_uint32_rotr_shr_xor():
    cs = TestConstraintSystem(F)
    a_val = rng.getrandbits(32)
    b_val = rng.getrandbits(32)
    a = UInt32.alloc(cs, a_val)
    b = UInt32.alloc(cs, b_val)
    assert a.rotr(7).value == ((a_val >> 7) | (a_val << 25)) & 0xFFFFFFFF
    assert a.shr(3).value == a_val >> 3
    assert a.xor(cs, b).value == a_val ^ b_val
    assert cs.is_satisfied()


def test_uint32_addmany():
    cs = TestConstraintSystem(F)
    vals = [rng.getrandbits(32) for _ in range(5)]
    ops = [UInt32.alloc(cs, v) for v in vals]
    with MultiEq(cs) as meq:
        res = UInt32.addmany(meq, ops)
    assert res.value == sum(vals) & 0xFFFFFFFF
    assert cs.is_satisfied()


def test_uint32_maj_ch():
    cs = TestConstraintSystem(F)
    a_val, b_val, c_val = (rng.getrandbits(32) for _ in range(3))
    a, b, c = (UInt32.alloc(cs, v) for v in (a_val, b_val, c_val))
    maj = UInt32.sha256_maj(cs, a, b, c)
    ch = UInt32.sha256_ch(cs, a, b, c)
    assert maj.value == (a_val & b_val) ^ (a_val & c_val) ^ (b_val & c_val)
    assert ch.value == (a_val & b_val) ^ (~a_val & c_val) & 0xFFFFFFFF
    assert cs.is_satisfied()
