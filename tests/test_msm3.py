"""MSM v3 (column-serial segmented accumulation) vs the host oracle."""

import numpy as np
import pytest

from nova_tpu.curves.spec import pallas as CURVE, AffinePoint
from nova_tpu.curves.msm_host import msm as host_msm
from nova_tpu.ops import msm3
from nova_tpu.ops.msm2 import DeviceBases2


def _bases(n):
    g = AffinePoint.generator(CURVE)
    out = []
    acc = g
    for _ in range(n):
        out.append(acc)
        acc = acc.add(g)
    return out


@pytest.mark.parametrize(
    "n",
    [100, pytest.param(512, marks=pytest.mark.slow),
     pytest.param(1500, marks=pytest.mark.slow)],
)
def test_msm3_matches_host(n):
    rng = np.random.default_rng(7)
    order = CURVE.scalar.p
    bases = _bases(n)
    scalars = [
        (int(rng.integers(0, 1 << 62)) * int(rng.integers(1, 1 << 62))
         * int(rng.integers(1, 1 << 62))) % order
        for _ in range(n)
    ]
    db = DeviceBases2(CURVE, bases)
    got = msm3.msm_device3(scalars, device_bases=db, window=9)
    want = host_msm(scalars, bases)
    assert got == want


@pytest.mark.parametrize(
    "bits",
    [1, pytest.param(10, marks=pytest.mark.slow), 16,
     pytest.param(32, marks=pytest.mark.slow)],
)
def test_msm3_small_scalars_max_bits(bits):
    """max_bits window pruning (reference msm_small routing,
    msm.rs:469-530) must be bit-identical to the full decomposition."""
    n = 300
    bases = _bases(n)
    rng = np.random.default_rng(40 + bits)
    scalars = [int(rng.integers(0, 1 << bits)) for _ in range(n)]
    db = DeviceBases2(CURVE, bases)
    got = msm3.msm_device3(
        scalars, device_bases=db, window=9, max_bits=bits
    )
    want = host_msm(scalars, bases)
    assert got == want


def test_msm3_edge_scalars():
    n = 600
    bases = _bases(n)
    order = CURVE.scalar.p
    scalars = [0, 1, order - 1, 2, order - 2] * (n // 5)
    db = DeviceBases2(CURVE, bases)
    got = msm3.msm_device3(scalars, device_bases=db, window=9)
    want = host_msm(scalars, bases)
    assert got == want


def test_msm3_repeated_bases_degenerate_retry():
    # equal bases with equal digits trigger the degenerate-add retry
    n = 520
    b = _bases(8)
    bases = (b * ((n // 8) + 1))[:n]
    rng = np.random.default_rng(3)
    order = CURVE.scalar.p
    scalars = [int(rng.integers(0, 1 << 16)) % order for _ in range(n)]
    db = DeviceBases2(CURVE, bases)
    got = msm3.msm_device3(scalars, device_bases=db, window=9)
    want = host_msm(scalars, bases)
    assert got == want
