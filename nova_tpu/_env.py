"""Backend-selection hardening.

The ambient axon TPU plugin wraps jax's backend resolution; when the TPU
relay behind it is unreachable, `jax.devices()` can hang indefinitely
(observed >10 min on examples/minroot.py). Entry points (examples,
benches, __graft_entry__) call :func:`apply_platform_env` before any jax
work: it honours an explicit JAX_PLATFORMS=cpu request, and otherwise
probes the accelerator in a subprocess with a timeout so a wedged tunnel
degrades to a printed CPU-fallback notice instead of a hang.

jax.config.update("jax_platforms", "cpu") is needed in addition to the
env var because the plugin's backend resolution does not always respect
the env var alone (see tests/conftest.py)."""

from __future__ import annotations

import os

_probe_result: bool | None = None


def accelerator_available(timeout_s: float | None = None) -> bool:
    """Probe the accelerator in a subprocess so a wedged tunnel can't hang
    the caller. Result is cached for the process lifetime."""
    global _probe_result
    if _probe_result is not None:
        return _probe_result
    if timeout_s is None:
        timeout_s = float(os.environ.get("NOVA_DEVICE_PROBE_TIMEOUT", "120"))
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); print(d[0].platform)"],
            capture_output=True, timeout=timeout_s, text=True,
        )
        _probe_result = r.returncode == 0 and "cpu" not in r.stdout
    except Exception:
        _probe_result = False
    return _probe_result


def _pin_cpu() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def apply_platform_env(probe: bool = True) -> None:
    """Entry-point backend selection.

    - JAX_PLATFORMS=cpu set → pin the CPU backend (env var alone does not
      beat the axon plugin).
    - JAX_PLATFORMS set to anything else → respect it, no probe.
    - unset and ``probe`` → subprocess-probe the accelerator; fall back to
      CPU with a printed notice if it does not respond.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat == "cpu":
        _pin_cpu()
        return
    if plat or not probe:
        return
    if not accelerator_available():
        print(
            "nova_tpu: accelerator did not respond to a probe; "
            "falling back to JAX_PLATFORMS=cpu "
            "(set JAX_PLATFORMS explicitly to override)",
            flush=True,
        )
        _pin_cpu()
