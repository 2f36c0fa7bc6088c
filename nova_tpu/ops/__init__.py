"""Shared dispatch predicate for the device kernels."""

from __future__ import annotations


def device_ok() -> bool:
    """True when a real accelerator backend is active. The CPU XLA backend
    exists for the virtual-mesh tests; its compile times and throughput on
    the big integer kernels are far worse than the native C++ host path,
    so size-threshold dispatch only engages off-CPU.

    NOVA_TPU_FORCE_DEVICE=1 forces True — used by tests to drive the
    device-resident (FVec) prover paths through the CPU backend."""
    import os

    if os.environ.get("NOVA_TPU_FORCE_DEVICE"):
        return True
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False

"""Hot TPU kernels: vectorized field/point math, MSM, SpMV, folds.

This package is the device-side compute path (JAX/XLA/Pallas), replacing the
reference's halo2curves assembly + rayon inner loops (SURVEY.md §2.9).
"""
