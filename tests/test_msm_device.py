"""Device MSM vs host oracle (reference pattern: msm.rs:722-749)."""

import random

import pytest

from nova_tpu.curves.msm_host import msm as host_msm
from nova_tpu.curves.spec import AffinePoint, bn254, pallas
from nova_tpu.ops.msm import msm_device


@pytest.mark.parametrize("curve", [pallas, bn254], ids=lambda c: c.name)
@pytest.mark.parametrize("n", [5, 33, 64])
def test_msm_device_vs_host(curve, n):
    rng = random.Random(100 + n)
    g = AffinePoint.generator(curve)
    bases = [g.mul(rng.randrange(1, curve.scalar.p)) for _ in range(n)]
    scalars = [rng.randrange(curve.scalar.p) for _ in range(n)]
    if n > 4:
        bases[2] = AffinePoint.identity(curve)
        scalars[3] = 0
    got = msm_device(scalars, bases, window=8)
    exp = host_msm(scalars, bases)
    assert got == exp


def test_msm_device_small_scalars():
    curve = pallas
    rng = random.Random(7)
    g = AffinePoint.generator(curve)
    n = 16
    bases = [g.mul(rng.randrange(1, 10**6)) for _ in range(n)]
    scalars = [rng.randrange(1 << 10) for _ in range(n)]
    got = msm_device(scalars, bases, window=8)
    assert got == host_msm(scalars, bases)


@pytest.mark.slow
def test_msm_device_wide_window():
    """window > 10 exercises the sequential (lax.map) bucket-table branch;
    11 keeps the 2^c tables small enough for the CPU test backend (c=16 is
    a TPU-only configuration)."""
    curve = pallas
    rng = random.Random(8)
    g = AffinePoint.generator(curve)
    n = 8
    bases = [g.mul(rng.randrange(1, 10**6)) for _ in range(n)]
    scalars = [rng.randrange(curve.scalar.p) for _ in range(n)]
    got = msm_device(scalars, bases, window=11)
    assert got == host_msm(scalars, bases)
