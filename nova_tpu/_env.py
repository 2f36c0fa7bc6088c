"""Backend-selection hardening.

The ambient axon TPU plugin wraps jax's backend resolution; when
JAX_PLATFORMS=cpu is requested, the env var alone does not always stop the
plugin from probing the (possibly unreachable) TPU relay during backend
init — jax.config.update does (see tests/conftest.py). Call this before
any jax import in entry points (examples, benches) so CPU runs never hang
on remote hardware."""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
