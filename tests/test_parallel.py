"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(conftest.py sets XLA_FLAGS; SURVEY.md §4 item 9: distributed testing is
new ground for the TPU build)."""

import random

import pytest

from nova_tpu.curves.spec import AffinePoint, pallas
from nova_tpu.parallel import make_mesh, msm_sharded, run_sharded_fold_step

rng = random.Random(0xD15C)


def test_msm_sharded_matches_host():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(4)
    n = 64
    g = AffinePoint.generator(pallas)
    bases, acc = [], g
    for _ in range(n):
        bases.append(acc)
        acc = acc.double()
    scalars = [rng.randrange(pallas.scalar.p) for _ in range(n)]

    got = msm_sharded(scalars, bases, mesh)

    from nova_tpu.curves.msm_host import msm as host_msm

    want = host_msm(scalars, bases)
    assert got == want


def test_sharded_fold_step_runs():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(len(jax.devices()))
    out = run_sharded_fold_step(mesh, pallas.base, 64)
    assert out is not None
