"""Opt-in real-hardware smoke (NOVA_TEST_ON_TPU=1): the device MSM
engines run on the live chip and must match the host-native MSM
bit-for-bit. Everything else in the suite exercises the XLA fallbacks on
the pinned-CPU backend (conftest.py); this is the one place the Pallas
kernels (msm2 bucket-reduce, msm3 column-serial accumulation) meet real
hardware outside bench.py.

Runs perf/smoke_tpu.py in a subprocess with the conftest's CPU pin
stripped so the ambient axon TPU plugin resolves. Expect minutes of
first-compile time; cached runs are fast (~/.cache/nova_tpu_xla-*)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("NOVA_TEST_ON_TPU"),
    reason="on-hardware smoke is opt-in: set NOVA_TEST_ON_TPU=1",
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_device_msm_engines_match_host():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    r = subprocess.run(
        [sys.executable, "-u", os.path.join(_REPO, "perf", "smoke_tpu.py"), "512"],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    for eng in ("msm1", "msm2", "msm3"):
        assert f"OK {eng}" in r.stdout, r.stdout
