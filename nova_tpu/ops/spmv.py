"""CSR sparse-matrix × dense-vector products on device.

Replaces the reference's rayon SpMV (src/r1cs/sparse.rs:200-229). The
coefficient-class specialization the reference does (±1/small/general,
PrecomputedSparseMatrix, sparse.rs:39-107) is unnecessary on TPU for
correctness; the gather + mont_mul + segment-sum pipeline is uniformly
vectorized. (A ±1-class split is a later bandwidth optimization: ±1 entries
can skip the 512-mul Montgomery product.)

Row sums use jnp segment_sum on raw uint32 limbs (safe for rows with up to
2^15 entries) followed by a single wide reduction.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nova_tpu.fields.jfield import JField, _split
from nova_tpu.fields.spec import NUM_LIMBS


class DeviceCSR:
    """A CSR matrix marshalled to device (Montgomery data)."""

    def __init__(self, jf: JField, matrix):
        self.jf = jf
        nnz = matrix.nnz
        rows = matrix.rows
        self.rows = rows
        if nnz == 0:
            self.empty = True
            return
        self.empty = False
        data = jf.to_mont(jnp.asarray(jf.pack(matrix.data)))
        self.data = data
        self.indices = jnp.asarray(np.array(matrix.indices, dtype=np.int32))
        row_ids = np.zeros(nnz, dtype=np.int32)
        for r in range(rows):
            row_ids[matrix.indptr[r] : matrix.indptr[r + 1]] = r
        self.row_ids = jnp.asarray(row_ids)
        max_row = int(np.max(np.diff(np.array(matrix.indptr)))) if rows else 0
        assert max_row < (1 << 15), "row too dense for uint32 limb accumulation"


@functools.partial(jax.jit, static_argnums=(0, 1))
def _spmv_kernel(jf_key: int, rows: int, data, indices, row_ids, zm):
    jf = JField._instances[jf_key]
    gathered = zm[indices]  # (nnz, 16)
    prods = jf.mont_mul(gathered, data)
    cols = [
        jax.ops.segment_sum(prods[:, i], row_ids, num_segments=rows)
        for i in range(NUM_LIMBS)
    ]
    return jf.reduce_wide(cols)


def _get_device_csr(shape, which: str) -> DeviceCSR:
    cache = getattr(shape, "_device_csr", None)
    if cache is None:
        cache = {}
        object.__setattr__(shape, "_device_csr", cache)
    if which not in cache:
        jf = JField(shape.field)
        cache[which] = DeviceCSR(jf, getattr(shape, which))
    return cache[which]


def multiply_vec_device(shape, z: Sequence[int]):
    """Az, Bz, Cz for a (padded) shape, computed on device."""
    jf = JField(shape.field)
    zm = jf.to_mont(jnp.asarray(jf.pack(list(z))))
    outs = []
    for which in ("A", "B", "C"):
        csr = _get_device_csr(shape, which)
        if csr.empty:
            outs.append([0] * shape.num_cons)
            continue
        res = _spmv_kernel(jf.spec.p, csr.rows, csr.data, csr.indices, csr.row_ids, zm)
        vals = jf.unpack(jf.from_mont(res))
        vals += [0] * (shape.num_cons - len(vals))
        outs.append(vals)
    return tuple(outs)
