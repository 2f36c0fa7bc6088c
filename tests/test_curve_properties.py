"""Fixed-seed field/group/MSM property regression suite, mirroring
/root/reference/src/provider/curve_property_tests.rs (seed
0x5EED_C0DE_1234_5678, field + group algebraic identities + MSM vs naive)
across all six curves, plus targeted boundary-value coverage for the
device field kernels' `reduce_wide` claim near p ~ 2^256 (secp/secq),
which round 1 left untested (VERDICT weak-spot 8).
"""

import random

import pytest

from nova_tpu.curves.spec import (
    ALL_CURVES,
    AffinePoint,
    bn254,
    grumpkin,
    pallas,
    secp256k1,
    secq256k1,
    vesta,
)

SEED = 0x5EED_C0DE_1234_5678
FIELD_ITERS = 24
GROUP_ITERS = 8

CURVES = [pallas, vesta, bn254, grumpkin, secp256k1, secq256k1]
CURVE_IDS = ["pallas", "vesta", "bn254", "grumpkin", "secp256k1", "secq256k1"]


def _rng():
    return random.Random(SEED)


@pytest.mark.parametrize("curve", CURVES, ids=CURVE_IDS)
def test_field_properties(curve):
    rng = _rng()
    for f in (curve.base, curve.scalar):
        with pytest.raises(Exception):
            f.inv(0)
        for _ in range(FIELD_ITERS):
            a = rng.randrange(1, f.p)
            b = rng.randrange(f.p)
            assert f.mul(a, f.inv(a)) == 1
            assert f.mul(a, b) == f.mul(b, a)
            # difference of squares
            lhs = f.mul(f.add(a, b), f.sub(a, b))
            rhs = f.sub(f.mul(a, a), f.mul(b, b))
            assert lhs == rhs
            # wide reduction: 64 uniform bytes reduce like a big integer
            x = rng.getrandbits(512)
            assert x % f.p == f.add(x % f.p, 0)
            # sqrt round-trips on squares
            sq = f.mul(a, a)
            r = f.sqrt(sq)
            assert r is not None and f.mul(r, r) == sq


@pytest.mark.parametrize("curve", CURVES, ids=CURVE_IDS)
def test_group_law(curve):
    rng = _rng()
    g = AffinePoint.generator(curve)
    for _ in range(GROUP_ITERS):
        kp = rng.randrange(1, curve.scalar.p)
        kq = rng.randrange(1, curve.scalar.p)
        P = g.mul(kp)
        Q = g.mul(kq)
        # P + (-P) == identity
        negP = AffinePoint(curve, P.x, curve.base.p - P.y)
        assert P.add(negP).infinity
        # P + identity == P
        I = AffinePoint.identity(curve)
        R = P.add(I)
        assert (R.x, R.y) == (P.x, P.y)
        # double == P + P
        D1, D2 = P.double(), P.add(P)
        assert (D1.x, D1.y) == (D2.x, D2.y)
        # scalar-mul distributes: [k](P+Q) == [k]P + [k]Q
        k = rng.randrange(1, 1 << 64)
        L = P.add(Q).mul(k)
        R2 = P.mul(k).add(Q.mul(k))
        assert (L.x, L.y, L.infinity) == (R2.x, R2.y, R2.infinity)
        # order: [order]P == identity
        assert P.mul(curve.scalar.p).infinity


@pytest.mark.parametrize("curve", [pallas, bn254, secp256k1],
                         ids=["pallas", "bn254", "secp256k1"])
def test_msm_vs_naive(curve):
    from nova_tpu.curves.msm_host import msm as host_msm

    rng = _rng()
    g = AffinePoint.generator(curve)
    n = 24
    bases, acc = [], g
    for _ in range(n):
        bases.append(acc)
        acc = acc.add(g)
    scalars = [rng.randrange(curve.scalar.p) for _ in range(n)]
    ref = None
    for s, b in zip(scalars, bases):
        t = b.mul(s)
        ref = t if ref is None else ref.add(t)
    got = host_msm(scalars, bases)
    assert (got.x, got.y, got.infinity) == (ref.x, ref.y, ref.infinity)
    # identity bases and zero scalars are absorbed
    got2 = host_msm(scalars + [0, 5], bases + [bases[0], AffinePoint.identity(curve)])
    assert (got2.x, got2.y) == (ref.x, ref.y)


@pytest.mark.parametrize("curve", [secp256k1, secq256k1], ids=["secp", "secq"])
def test_reduce_wide_boundary_values(curve):
    """fields/jfield.py:123-137 claims X_lo < 2^256 < 4p for all supported
    fields; for secp/secq p ~ 2^256 so the conditional 2p-subtract is the
    tight case. Exercise the device mont-mul on boundary operands."""
    import numpy as np

    from nova_tpu.fields.jfield import JField

    f = curve.base
    jf = JField(f)
    mul = jf.jit("mont_mul")
    to_mont = jf.jit("to_mont")
    from_mont = jf.jit("from_mont")

    vals = [
        f.p - 1, f.p - 2, 1, 2,
        (1 << 256) % f.p,            # wrap of the limb radix
        ((1 << 256) - 1) % f.p,      # all-ones 256-bit pattern reduced
        (f.p - 1) >> 1,
    ]
    rng = _rng()
    vals += [rng.randrange(f.p) for _ in range(9)]
    a = np.asarray(jf.pack(vals))
    b = np.asarray(jf.pack(list(reversed(vals))))
    am, bm = to_mont(a), to_mont(b)
    got = jf.unpack(from_mont(mul(am, bm)))
    exp = [f.mul(x, y) for x, y in zip(vals, reversed(vals))]
    assert got == exp
