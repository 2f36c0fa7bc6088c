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


# ---------------------------------------------------------------------------
# fully device-resident cross-term: ONE program computes
# T = Az∘Bz − u·Cz − E  on the folded Z (Mova §5.2 single-SpMV trick,
# src/r1cs/mod.rs:533-619) from Montgomery device inputs, returning a
# device-resident T (FVec) with no host marshalling.
# ---------------------------------------------------------------------------


def _spmv_m(jf: JField, rows: int, csr, zm):
    """SpMV on Montgomery limbs inside an enclosing jit: gather rows of
    zm by column index, Montgomery-multiply by the CSR data, segment-sum
    per row, canonicalize."""
    from nova_tpu.fields.spec import NUM_LIMBS

    data, indices, row_ids = csr
    gathered = zm[indices]
    prods = jf.mont_mul(gathered, data)
    cols = [
        jax.ops.segment_sum(prods[:, i], row_ids, num_segments=rows)
        for i in range(NUM_LIMBS)
    ]
    return jf.reduce_wide(cols)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _commit_T_prog(pkey: int, rows: int, csrs, w1m, w2m, tailm, um, em):
    """csrs: ((data, indices, row_ids) for A, B, C). tailm: (1+num_io, 16)
    Montgomery limbs of [u1+u2, X1+X2]. um: (1, 16) Montgomery u1+u2.
    em: (rows, 16) E1 (plain fold) or E1+E2 (relaxed fold)."""
    jf = JField._instances[pkey]
    zm = jnp.concatenate([jf.add(w1m, w2m), tailm])
    az = _spmv_m(jf, rows, csrs[0], zm)
    bz = _spmv_m(jf, rows, csrs[1], zm)
    cz = _spmv_m(jf, rows, csrs[2], zm)
    umb = jnp.broadcast_to(um, cz.shape)  # mont_mul does not broadcast
    t = jf.sub(jf.sub(jf.mont_mul(az, bz), jf.mont_mul(umb, cz)), em)
    return t


def commit_T_device(shape, U1, W1, U2, W2, relaxed: bool):
    """Device-resident cross-term for plain (U2.u == 1, E2 == 0) or
    relaxed folding. Returns T as an FVec; the caller commits to it via
    the Montgomery-scalar MSM path."""
    from nova_tpu.ops.fvec import FVec
    from nova_tpu.ops.spmv import _get_device_csr

    jf = JField(shape.field)
    p = shape.field.p
    W1v = FVec.coerce(jf, W1.W)
    W2v = FVec.coerce(jf, W2.W)
    E1v = FVec.coerce(jf, W1.E)
    if relaxed:
        em = E1v.add(FVec.coerce(jf, W2.E)).m
        u = (U1.u + U2.u) % p
    else:
        em = E1v.m
        u = (U1.u + 1) % p
    X = [(a + b) % p for a, b in zip(U1.X, U2.X)]
    tail = [u] + X
    tailm = jf.jit("to_mont")(jnp.asarray(jf.pack(tail)))
    um = jf.const_mont(u, tailm)[:1]
    csrs = []
    for which in ("A", "B", "C"):
        csr = _get_device_csr(shape, which)
        assert not csr.empty, "commit_T_device requires non-empty matrices"
        csrs.append((csr.data, csr.indices, csr.row_ids))
    tm = _commit_T_prog(
        jf.spec.p, shape.num_cons, tuple(csrs), W1v.m, W2v.m, tailm, um, em
    )
    return FVec(jf, tm)
