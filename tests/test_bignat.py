"""BigNat non-native arithmetic gadget (reference pattern:
src/gadgets/nonnative/bignat.rs proptests)."""

import random

import pytest

from nova_tpu.constants import BN_LIMB_WIDTH, BN_N_LIMBS
from nova_tpu.fields.spec import pallas_base, pallas_scalar
from nova_tpu.frontend import TestConstraintSystem
from nova_tpu.frontend.num import Num
from nova_tpu.frontend.constraint_system import LinearCombination
from nova_tpu.gadgets.bignat import BigNat, limbs_to_nat, nat_to_limbs


def test_limb_roundtrip():
    rng = random.Random(4)
    for _ in range(10):
        v = rng.randrange(1 << 256)
        limbs = nat_to_limbs(v, BN_LIMB_WIDTH, BN_N_LIMBS)
        assert limbs_to_nat(limbs, BN_LIMB_WIDTH) == v


def test_mult_mod():
    """a*b mod m over the OTHER field's modulus, inside a pallas_base circuit."""
    rng = random.Random(5)
    f = pallas_base
    m = pallas_scalar.p  # non-native modulus
    for _ in range(3):
        a_v = rng.randrange(m)
        b_v = rng.randrange(m)
        cs = TestConstraintSystem(f)
        a = BigNat.alloc_from_nat(cs, a_v, BN_LIMB_WIDTH, BN_N_LIMBS)
        b = BigNat.alloc_from_nat(cs, b_v, BN_LIMB_WIDTH, BN_N_LIMBS)
        mod = BigNat.alloc_constant(cs, m, BN_LIMB_WIDTH, BN_N_LIMBS)
        q, r = a.mult_mod(cs, b, mod)
        assert r.value == a_v * b_v % m
        assert q.value == a_v * b_v // m
        assert cs.is_satisfied(), cs.which_is_unsatisfied()


def test_red_mod_and_sub_mod():
    rng = random.Random(6)
    f = pallas_base
    m = pallas_scalar.p
    cs = TestConstraintSystem(f)
    a_v = rng.randrange(m)
    b_v = rng.randrange(m)
    a = BigNat.alloc_from_nat(cs, a_v, BN_LIMB_WIDTH, BN_N_LIMBS)
    b = BigNat.alloc_from_nat(cs, b_v, BN_LIMB_WIDTH, BN_N_LIMBS)
    mod = BigNat.alloc_constant(cs, m, BN_LIMB_WIDTH, BN_N_LIMBS)
    s = a.add(b)
    red = s.red_mod(cs, mod)
    assert red.value == (a_v + b_v) % m
    d = a.sub_mod(cs, b, mod)
    assert d.value == (a_v - b_v) % m
    assert cs.is_satisfied(), cs.which_is_unsatisfied()


def test_fold_bn():
    """The IO-fold primitive used by the augmented circuit: x + r*y mod m."""
    rng = random.Random(7)
    f = pallas_base
    m = pallas_scalar.p
    cs = TestConstraintSystem(f)
    x_v = rng.randrange(m)
    y_v = rng.randrange(m)
    r_v = rng.randrange(1 << 128)
    x = BigNat.alloc_from_nat(cs, x_v, BN_LIMB_WIDTH, BN_N_LIMBS)
    y = BigNat.alloc_from_nat(cs, y_v, BN_LIMB_WIDTH, BN_N_LIMBS)
    r = BigNat.alloc_from_nat(cs, r_v, BN_LIMB_WIDTH, BN_N_LIMBS)
    mod = BigNat.alloc_constant(cs, m, BN_LIMB_WIDTH, BN_N_LIMBS)
    folded = x.fold_bn(cs, y, r, mod)
    assert folded.value == (x_v + r_v * y_v) % m
    assert cs.is_satisfied(), cs.which_is_unsatisfied()


def test_from_num_binding():
    f = pallas_base
    cs = TestConstraintSystem(f)
    v = 0x1234567890ABCDEF1234567890ABCDEF
    n = Num(v, LinearCombination.zero())
    # build a Num that is just a constant LC (value v, lc = v*one)
    n = Num(v, LinearCombination.zero().add_term(v, ("I", 0)))
    bn = BigNat.from_num(cs, n, BN_LIMB_WIDTH, BN_N_LIMBS)
    assert bn.value == v
    assert cs.is_satisfied(), cs.which_is_unsatisfied()


def test_mult_mod_tamper_unsat():
    """A corrupted remainder witness must make the system unsatisfiable."""
    f = pallas_base
    m = pallas_scalar.p
    cs = TestConstraintSystem(f)
    a = BigNat.alloc_from_nat(cs, 12345, BN_LIMB_WIDTH, BN_N_LIMBS)
    b = BigNat.alloc_from_nat(cs, 67890, BN_LIMB_WIDTH, BN_N_LIMBS)
    mod = BigNat.alloc_constant(cs, m, BN_LIMB_WIDTH, BN_N_LIMBS)
    q, r = a.mult_mod(cs, b, mod)
    assert cs.is_satisfied()
    # find the aux index of r's first limb and corrupt it
    idx = r.limbs[0]
    aux_idx = next(iter(idx.aux))
    cs.aux_assignment[aux_idx] = (cs.aux_assignment[aux_idx] + 1) % f.p
    assert not cs.is_satisfied()
