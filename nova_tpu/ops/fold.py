"""Fused fold (axpy) kernels: W <- W1 + r·W2, E <- E1 + r·T.

Replaces the reference's rayon par_iter folds (src/r1cs/mod.rs:989-1052)
with one fused elementwise device pass."""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from nova_tpu.fields.jfield import JField
from nova_tpu.fields.spec import FieldSpec


@functools.partial(jax.jit, static_argnums=(0,))
def _axpy_kernel(jf_key: int, a, b, r_bcast):
    """a + r*b (all Montgomery form)."""
    jf = JField._instances[jf_key]
    return jf.add(a, jf.mont_mul(r_bcast, b))


def fold_witness_device(
    field: FieldSpec,
    W1: Sequence[int],
    W2: Sequence[int],
    E1: Sequence[int],
    T: Sequence[int],
    r: int,
) -> Tuple[List[int], List[int]]:
    jf = JField(field)
    w1 = jf.to_mont(jnp.asarray(jf.pack(list(W1))))
    w2 = jf.to_mont(jnp.asarray(jf.pack(list(W2))))
    e1 = jf.to_mont(jnp.asarray(jf.pack(list(E1))))
    t = jf.to_mont(jnp.asarray(jf.pack(list(T))))
    r_w = jf.const_mont(r, w1)
    r_e = jf.const_mont(r, e1)
    W = jf.unpack(jf.from_mont(_axpy_kernel(jf.spec.p, w1, w2, r_w)))
    E = jf.unpack(jf.from_mont(_axpy_kernel(jf.spec.p, e1, t, r_e)))
    return W, E
