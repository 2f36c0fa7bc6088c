"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(conftest.py sets XLA_FLAGS; SURVEY.md §4 item 9: distributed testing is
new ground for the TPU build)."""

import os
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
    """Runs in a fresh subprocess: XLA:CPU segfaults compiling this
    shard_map program when the host process is already large (reproduced
    twice mid-suite; passes standalone), so isolate it."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "flags = os.environ.get('XLA_FLAGS', '')\n"
        "if 'host_platform_device_count' not in flags:\n"
        "    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from nova_tpu.parallel import make_mesh, run_sharded_fold_step\n"
        "from nova_tpu.curves.spec import pallas\n"
        "out = run_sharded_fold_step(make_mesh(len(jax.devices())), pallas.base, 64)\n"
        "assert out is not None\n"
        "print('FOLD_STEP_OK')\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "FOLD_STEP_OK" in res.stdout
