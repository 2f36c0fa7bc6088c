"""Phase timings for MSM v3 at a given size (default 2^16).

Each phase is jitted separately and timed with chained iterations where
possible; per-call wall times include one program launch each, so the
deltas vs the monolithic program reveal glue costs."""

import os

import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nova_tpu.curves.spec import pallas as CURVE, AffinePoint
from nova_tpu.fields.jfield import JField
from nova_tpu.ops import msm3
from nova_tpu.ops.msm2 import DeviceBases2, _field_key, _scalar_limbs, signed_digits_device
from nova_tpu.fields.spec import NUM_LIMBS

lg = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = 1 << lg
c = 16
rng = np.random.default_rng(1)
order = CURVE.scalar.p

g = AffinePoint.generator(CURVE)
bases = []
acc = g
for i in range(n):
    bases.append(acc)
    acc = acc.add(g)
scalars = [int(rng.integers(0, 1 << 62)) * int(rng.integers(1, 1 << 62)) % order
           for _ in range(n)]

db = DeviceBases2(CURVE, bases)
jf = db.jf
fx, fy, fyneg, finf = msm3._fixed3(db, c, n)
limbs = jnp.asarray(_scalar_limbs(scalars, n))

W = (255 + c - 1) // c + 1
n_s = W * n
R, C = msm3._grid_shape(n_s)
pad = R * C - n_s
print(f"n=2^{lg} n_s={n_s} R={R} C={C} pad={pad}", flush=True)


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.2f} ms", flush=True)
    return out


@jax.jit
def phase_digits(limbs):
    d = signed_digits_device(limbs, c, W).reshape(n_s)
    absd = jnp.where(finf, 0, jnp.abs(d)).astype(jnp.int32)
    return d, absd


@jax.jit
def phase_sort(absd):
    idx = jnp.arange(n_s, dtype=jnp.int32)
    return jax.lax.sort_key_val(absd, idx)


@jax.jit
def phase_gather_pack(d, sorted_d, order):
    if pad:
        sorted_d = jnp.concatenate([jnp.zeros((pad,), jnp.int32), sorted_d])
        order = jnp.concatenate([jnp.zeros((pad,), jnp.int32), order])
        pm = jnp.arange(R * C, dtype=jnp.int32) < pad
        sorted_d = jnp.where(pm, 0, sorted_d)
    dsg = jnp.where(d < 0, 1, 0).astype(jnp.int32)[order]
    d_cm = sorted_d.reshape(C, R).T
    Gx = order.reshape(C, R).T
    px_cm = fx[Gx]
    ycat = jnp.concatenate([fy, fyneg], axis=0)
    py_cm = ycat[Gx + dsg.reshape(C, R).T * n_s]
    c_blk = min(msm3.C_BLK, C)
    pts = msm3._pack_pts([px_cm, py_cm], R, C, c_blk)
    digs = msm3._pack_digs(d_cm, R, C, c_blk)
    return pts, digs, d_cm, sorted_d


c_blk = min(msm3.C_BLK, C)
call = msm3._accum_call(_field_key(jf), R, c_blk, C // c_blk, True, "fast")
kernel_jit = jax.jit(lambda pts, digs: call(pts, digs))


@jax.jit
def phase_totals(sorted_d, flush, colend, d_cm):
    nb = 1 << (c - 1)
    return msm3._bucket_totals(
        jf, sorted_d, flush, colend, d_cm, R, C, c_blk, nb, True, "fast"
    )


@jax.jit
def phase_reduce(totals):
    from nova_tpu.ops.msm2 import _bucket_reduce
    s = _bucket_reduce(jf, totals)
    return {k: jf.from_mont(v.T)[0] for k, v in s.items()}


d, absd = timeit("digits", phase_digits, limbs)
sorted_d0, order = timeit("sort", phase_sort, absd)
pts, digs, d_cm, sorted_d = timeit(
    "gather+pack", phase_gather_pack, d, sorted_d0, order
)
flush, colend, flag = timeit("accum kernel", kernel_jit, pts, digs)
totals = timeit("bucket totals", phase_totals, sorted_d, flush, colend, d_cm)
out = timeit("weighted reduce", phase_reduce, totals)
print("done", flush=True)
