"""EC gadget vs native point ops (reference pattern: ecc.rs:1177-1308)."""

import random

import pytest

from nova_tpu.curves.spec import AffinePoint, grumpkin, pallas, vesta
from nova_tpu.frontend import AllocatedNum, TestConstraintSystem
from nova_tpu.frontend.boolean import AllocatedBit
from nova_tpu.gadgets.ecc import AllocatedPoint

# circuit field = curve.base (which equals the cycle partner's scalar field)
CURVES = [pallas, vesta, grumpkin]


def rand_point(curve, rng):
    return AffinePoint.generator(curve).mul(rng.randrange(1, curve.scalar.p))


def alloc_pt(cs, curve, p):
    return AllocatedPoint.alloc(cs, curve, (p.x, p.y, p.infinity))


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_gadget_add_double(curve):
    rng = random.Random(31)
    cs = TestConstraintSystem(curve.base)
    a = rand_point(curve, rng)
    b = rand_point(curve, rng)
    ga = alloc_pt(cs, curve, a)
    gb = alloc_pt(cs, curve, b)
    ga.check_on_curve(cs)

    gsum = ga.add(cs, gb)
    native = a.add(b)
    assert (gsum.x.get_value(), gsum.y.get_value()) == (native.x, native.y)
    assert gsum.is_infinity.get_value() == (1 if native.infinity else 0)

    gdbl = ga.double(cs)
    ndbl = a.double()
    assert (gdbl.x.get_value(), gdbl.y.get_value()) == (ndbl.x, ndbl.y)

    # edge cases: P + P (via add), P + (-P), P + O, O + O
    gsame = ga.add(cs, ga)
    assert (gsame.x.get_value(), gsame.y.get_value()) == (ndbl.x, ndbl.y)

    gneg = ga.negate(cs)
    gzero = ga.add(cs, gneg)
    assert gzero.is_infinity.get_value() == 1

    o = AllocatedPoint.default(cs, curve)
    g_po = ga.add(cs, o)
    assert (g_po.x.get_value(), g_po.y.get_value()) == (a.x, a.y)
    g_oo = o.add(cs, o)
    assert g_oo.is_infinity.get_value() == 1

    assert cs.is_satisfied(), cs.which_is_unsatisfied()


@pytest.mark.parametrize("curve", [pallas, grumpkin], ids=lambda c: c.name)
def test_gadget_scalar_mul(curve):
    rng = random.Random(37)
    cs = TestConstraintSystem(curve.base)
    a = rand_point(curve, rng)
    s = rng.randrange(curve.scalar.p)
    ga = alloc_pt(cs, curve, a)
    nbits = curve.scalar.num_bits
    bits = [AllocatedBit.alloc(cs, bool((s >> i) & 1)) for i in range(nbits)]
    gmul = ga.scalar_mul(cs, bits)
    native = a.mul(s)
    assert (gmul.x.get_value(), gmul.y.get_value()) == (native.x, native.y)
    assert gmul.is_infinity.get_value() == (1 if native.infinity else 0)
    assert cs.is_satisfied(), cs.which_is_unsatisfied()


def test_gadget_scalar_mul_identity_base():
    curve = pallas
    cs = TestConstraintSystem(curve.base)
    o = AllocatedPoint.alloc(cs, curve, (0, 0, True))
    bits = [AllocatedBit.alloc(cs, bool(i % 2)) for i in range(curve.scalar.num_bits)]
    gmul = o.scalar_mul(cs, bits)
    assert gmul.is_infinity.get_value() == 1
    assert cs.is_satisfied(), cs.which_is_unsatisfied()
