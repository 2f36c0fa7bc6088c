"""Curve group law + host MSM oracle tests (reference test pattern:
src/provider/msm.rs:722-784 oracle-vs-naive)."""

import random

import pytest

from nova_tpu.curves.msm_host import msm, msm_naive
from nova_tpu.curves.spec import (
    ALL_CURVES,
    AffinePoint,
    bn254,
    grumpkin,
    pallas,
    secp256k1,
    vesta,
)

CURVES = list(ALL_CURVES.values())


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_group_law(curve):
    g = AffinePoint.generator(curve)
    assert g.is_on_curve()
    # 2g + g == 3g ; g - g == identity
    g2 = g.double()
    g3a = g2.add(g)
    g3b = g.mul(3)
    assert g3a == g3b
    assert g.sub(g).is_identity()
    assert g.add(AffinePoint.identity(curve)) == g
    # order: scalar.p * g == identity
    assert g.mul(curve.scalar.p).is_identity()
    # random associativity
    rng = random.Random(11)
    a, b = rng.randrange(curve.scalar.p), rng.randrange(curve.scalar.p)
    assert g.mul(a).add(g.mul(b)) == g.mul((a + b) % curve.scalar.p)


@pytest.mark.parametrize("curve", [pallas, bn254, secp256k1], ids=lambda c: c.name)
def test_msm_host_vs_naive(curve):
    rng = random.Random(21)
    g = AffinePoint.generator(curve)
    n = 12
    bases = [g.mul(rng.randrange(1, 1000)) for _ in range(n)]
    bases[3] = AffinePoint.identity(curve)  # identity base regression
    scalars = [rng.randrange(curve.scalar.p) for _ in range(n)]
    scalars[5] = 0
    assert msm(scalars, bases) == msm_naive(scalars, bases)


def test_cycle_structure():
    assert pallas.base.p == vesta.scalar.p
    assert pallas.scalar.p == vesta.base.p
    assert bn254.base.p == grumpkin.scalar.p
    assert bn254.scalar.p == grumpkin.base.p
