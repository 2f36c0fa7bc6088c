"""AOT executable cache (ops/aot.py) unit coverage on the CPU backend.

The TPU-only default means the suite normally exercises the fall-through
path; NOVA_TPU_AOT=force turns the real cache on for one small program
(serialize -> disk -> deserialize -> call) in a subprocess pair so the
cross-process reuse that motivates the cache is what is actually tested.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp

from nova_tpu.ops.aot import aot_call


@jax.jit
def _f(x):
    return x * 2 + 1


def test_fallthrough_matches_jit(monkeypatch):
    monkeypatch.setenv("NOVA_TPU_AOT", "0")
    x = jnp.arange(8)
    assert (aot_call(_f, (x,), label="t") == _f(x)).all()


def test_force_mode_roundtrip(tmp_path, monkeypatch):
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "os.environ['NOVA_TPU_AOT'] = 'force'\n"
        "os.environ['NOVA_TPU_AOT_DIR'] = %r\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "from nova_tpu.ops.aot import aot_call\n"
        "f = jax.jit(lambda x: x * 3 + 2)\n"
        "x = jnp.arange(16)\n"
        "r = aot_call(f, (x,), label='rt')\n"
        "assert (r == x * 3 + 2).all(), r\n"
        "print('AOT_OK')\n"
    ) % (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        str(tmp_path),
    )
    for i in range(2):  # second run loads the first run's disk entry
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=600,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert "AOT_OK" in res.stdout
    names = os.listdir(tmp_path)
    assert any(n.startswith("rt-") for n in names), names
