"""Prime-field arithmetic.

Two coordinated engines over the same :class:`FieldSpec`:

- host engine (:mod:`nova_tpu.fields.spec`): exact arbitrary-precision ops on
  Python ints — used for transcripts, circuit synthesis, and setup, which are
  sequential even in the Rust reference (rayon gives them no parallelism
  either; see SURVEY.md §3.5).
- device engine (:mod:`nova_tpu.fields.jfield`): vectorized Montgomery
  arithmetic on ``(N, 16) uint32`` arrays of 16-bit limbs, compiled by XLA
  for the TPU VPU — used for all O(N) vector math (MSM, SpMV, folds,
  sumcheck binds).

The 16-bit limb width is chosen for the TPU integer datapath: partial
products of 16-bit limbs fit exactly in uint32 lanes, and column sums of
split lo/hi halves stay < 2^21, so schoolbook/Montgomery accumulation never
overflows 32-bit lanes (the TPU has no 64-bit integer multiplier).

Replaces the reference's dependency on halo2curves' x86_64 assembly field
arithmetic (reference Cargo.toml:35-41, SURVEY.md §2.9 item 1).
"""

from nova_tpu.fields.spec import (
    FieldSpec,
    pallas_base,
    pallas_scalar,
    vesta_base,
    vesta_scalar,
    bn254_base,
    bn254_scalar,
    grumpkin_base,
    grumpkin_scalar,
    secp_base,
    secp_scalar,
    secq_base,
    secq_scalar,
)

__all__ = [
    "FieldSpec",
    "pallas_base",
    "pallas_scalar",
    "vesta_base",
    "vesta_scalar",
    "bn254_base",
    "bn254_scalar",
    "grumpkin_base",
    "grumpkin_scalar",
    "secp_base",
    "secp_scalar",
    "secq_base",
    "secq_scalar",
]
