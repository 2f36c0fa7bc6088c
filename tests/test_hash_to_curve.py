"""hash_to_curve (from_label generator derivation) tests.

Validates the halo2curves-equivalent map (SSWU+3-isogeny / SVDW over
BLAKE2b expand_message_xmd; see nova_tpu/provider/hash_to_curve.py) with
structural checks that do not depend on external vectors:

- every lifted point is on the curve and non-identity for honest labels
- the SSWU isogeny constants define a true degree-3 isogeny E' -> E
  (homomorphism + on-curve on random points)
- expand_message_xmd matches an independent straight-from-RFC9380
  re-implementation
- self-pinned generator hexes (OUR map's output today) so refactors
  can't silently change derived keys; superseded by tests/vectors/
  golden_vectors.json when the reference toolchain produces it
  (tests/test_bitexact.py).
"""

import hashlib

import pytest

from nova_tpu.curves.spec import ALL_CURVES, AffinePoint, bn254, pallas, vesta
from nova_tpu.provider.hash_to_curve import (
    HASH_TO_CURVE_CONSTANTS,
    _ec_add,
    expand_message_xmd_blake2b,
    hash_to_curve,
    iso_map,
    sswu_map,
    svdw_map,
)
from nova_tpu.provider.pedersen import from_label


def test_expand_message_xmd_matches_rfc_reference():
    # independent RFC 9380 §5.3.1 implementation (generic, ell blocks)
    def xmd(msg, dst, len_in_bytes):
        b_in, r_in = 64, 128
        ell = -(-len_in_bytes // b_in)
        dst_prime = dst + bytes([len(dst)])
        msg_prime = (b"\x00" * r_in + msg + len_in_bytes.to_bytes(2, "big")
                     + b"\x00" + dst_prime)
        b0 = hashlib.blake2b(msg_prime, digest_size=64).digest()
        bs = [hashlib.blake2b(b0 + b"\x01" + dst_prime, digest_size=64).digest()]
        for i in range(2, ell + 1):
            x = bytes(a ^ b for a, b in zip(b0, bs[-1]))
            bs.append(hashlib.blake2b(x + bytes([i]) + dst_prime,
                                      digest_size=64).digest())
        return b"".join(bs)[:len_in_bytes]

    for msg in [b"", b"abc", bytes(range(100))]:
        for dst in [b"QUUX-V01-CS02", b"from_uniform_bytes-pallas_XMD:BLAKE2b_SSWU_RO_"]:
            b1, b2 = expand_message_xmd_blake2b(msg, dst)
            assert b1 + b2 == xmd(msg, dst, 128)


@pytest.mark.parametrize("name", list(ALL_CURVES))
def test_lift_on_curve_and_deterministic(name):
    curve = ALL_CURVES[name]
    pts = [hash_to_curve(curve, b"from_uniform_bytes", bytes([i]) * 32)
           for i in range(8)]
    assert all(p.is_on_curve() for p in pts)
    assert all(not p.infinity for p in pts)
    assert len({(p.x, p.y) for p in pts}) == 8
    again = hash_to_curve(curve, b"from_uniform_bytes", bytes([3]) * 32)
    assert again == pts[3]


@pytest.mark.parametrize("name", ["pallas", "vesta", "secp256k1"])
def test_sswu_isogeny_is_homomorphism(name):
    curve = ALL_CURVES[name]
    cfg = HASH_TO_CURVE_CONSTANTS[name]
    p = curve.base.p
    A = cfg["iso_a"]
    # two deterministic points on E' via the SSWU map itself
    P = sswu_map(curve, 12345, cfg)
    Q = sswu_map(curve, 67890, cfg)
    # phi(P + Q) == phi(P) + phi(Q), all on E
    S = _ec_add(p, A, P, Q)
    lhs = iso_map(curve, S, cfg)
    phiP, phiQ = iso_map(curve, P, cfg), iso_map(curve, Q, cfg)
    rhs = _ec_add(p, 0, phiP, phiQ)
    assert lhs == rhs
    for pt in (lhs, phiP, phiQ):
        x, y = pt
        assert (y * y - (x**3 + curve.b)) % p == 0


@pytest.mark.parametrize("name", ["bn254", "grumpkin", "secq256k1"])
def test_svdw_on_curve(name):
    curve = ALL_CURVES[name]
    cfg = HASH_TO_CURVE_CONSTANTS[name]
    p = curve.base.p
    for u in (1, 2, 0xDEADBEEF, p - 3):
        x, y = svdw_map(curve, u, cfg)
        assert (y * y - (x**3 + curve.b)) % p == 0


def test_from_label_legacy_flag(monkeypatch):
    new = from_label(pallas, b"ck", 2)
    monkeypatch.setenv("NOVA_LEGACY_MAP", "1")
    old = from_label(pallas, b"ck", 2)
    assert new != old  # maps genuinely differ
    assert all(g.is_on_curve() for g in old + new)


def test_from_label_self_pin():
    # Self-pinned outputs of OUR map (not reference vectors — those arrive
    # via tests/vectors/golden_vectors.json). Guards against refactor drift.
    gens = from_label(pallas, b"ck", 2)
    assert [hex(g.x) for g in gens] == [
        "0x2c39033a09e8616ac10e7f3e2287379ba04117b221c707c66719cd575771482b",
        "0x835e10cbe1215f95e8a5046d5fd711a4abea26f097b9369b0ac8422ae336bd5",
    ], "from_label(pallas, b'ck') changed — key caches/digests will rot"
