"""Reliable MSM v3 phase timings: K-chained applications inside one jit,
synced by device_get of a small checksum; per-phase cost = (t_K - t_1)/(K-1).
block_until_ready does NOT synchronize on the tunneled backend."""

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
from nova_tpu.fields.spec import NUM_LIMBS
from nova_tpu.ops import msm3
from nova_tpu.ops.msm2 import DeviceBases2, _field_key, _bucket_reduce

lg = int(sys.argv[1]) if len(sys.argv) > 1 else 16
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
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
xyt, finf = msm3._fixed3(db, c, n)
ulimbs = jnp.asarray(msm3._scalar_ulimbs(scalars, n, c))

W = msm3._num_windows(c)
n_s = W * n
R, C = msm3._grid_shape(n_s)
pad = R * C - n_s
c_blk = min(msm3.C_BLK, C)
nb = 1 << (c - 1)
print(f"n=2^{lg} n_s={n_s} R={R} C={C} c_blk={c_blk} K={K}", flush=True)


def slope(name, mk, *args):
    f1 = jax.jit(mk(1))
    fK = jax.jit(mk(K))
    jax.device_get(f1(*args))
    jax.device_get(fK(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_get(f1(*args))
    t1 = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_get(fK(*args))
    tK = (time.perf_counter() - t0) / 3
    per = (tK - t1) / (K - 1)
    print(f"{name:22s} per-app {per*1e3:8.2f} ms   (1x {t1*1e3:7.2f})", flush=True)


# --- digits ---------------------------------------------------------------
def mk_digits(k):
    def f():
        acc = jnp.int32(0)
        for i in range(k):
            d = msm3.offset_digits_device(ulimbs + jnp.uint32(i), c)
            acc = acc + d[0, 0] + d[-1, -1]
        return acc
    return f


# --- sort -----------------------------------------------------------------
d0 = msm3.offset_digits_device(ulimbs, c).reshape(n_s)
absd0 = jnp.abs(d0).astype(jnp.int32)
idx = jnp.arange(n_s, dtype=jnp.int32)


def mk_sort(k):
    def f():
        acc = jnp.int32(0)
        for i in range(k):
            s, o = jax.lax.sort_key_val(absd0 ^ i, idx)
            acc = acc + s[0] + o[-1]
        return acc
    return f


# --- gather ---------------------------------------------------------------
sorted_d, order_arr = jax.lax.sort_key_val(absd0, idx)
order_dev = jnp.asarray(order_arr)


def mk_gather(k):
    def f(xyt, order_dev):
        acc = jnp.uint32(0)
        for i in range(k):
            gi = (order_dev + i) % (2 * n_s)
            r = xyt[gi]
            acc = acc + r[0, 0] + r[-1, -1]
        return acc
    return f


# --- pack (gathered rows -> kernel layout) --------------------------------
xy_flat = xyt[order_dev]


def mk_pack(k):
    def f(xy_flat):
        acc = jnp.uint32(0)
        for i in range(k):
            xcm = (xy_flat + jnp.uint32(i))
            if pad:
                xcm = jnp.concatenate(
                    [jnp.zeros((pad, 2 * NUM_LIMBS), jnp.uint32), xcm]
                )
            xcm = xcm.reshape(C, R, 2 * NUM_LIMBS).transpose(1, 0, 2)
            pts = msm3._pack_xy(xcm, R, C, c_blk)
            acc = acc + pts[0, 0, 0, 0, 0, 0, 0] + pts[-1, -1, -1, -1, -1, -1, -1]
        return acc
    return f


# --- accum kernel ---------------------------------------------------------
spad = jnp.concatenate([jnp.zeros((pad,), jnp.int32), sorted_d]) if pad else sorted_d
d_cm = spad.reshape(C, R).T
xy_cm0 = jnp.concatenate(
    [jnp.zeros((pad, 2 * NUM_LIMBS), jnp.uint32), xy_flat]
).reshape(C, R, 2 * NUM_LIMBS).transpose(1, 0, 2) if pad else xy_flat.reshape(C, R, 2 * NUM_LIMBS).transpose(1, 0, 2)
pts0 = jax.jit(lambda x: msm3._pack_xy(x, R, C, c_blk))(xy_cm0)
digs0 = jax.jit(lambda d: msm3._pack_digs(d, R, C, c_blk))(d_cm)
call = msm3._accum_call(_field_key(jf), R, c_blk, C // c_blk, True, "fast")


def mk_kernel(k):
    def f(pts0, digs0):
        acc = jnp.uint32(0)
        for i in range(k):
            fl, ce, fg = call(pts0 + jnp.uint32(i), digs0)
            acc = acc + fl[0, 0, 0, 0, 0, 0, 0] + ce[-1, -1, -1, -1, -1] + fg[0, 0, 0]
        return acc
    return f


# --- bucket totals --------------------------------------------------------
flush0, colend0, _ = jax.jit(lambda p, d: call(p, d))(pts0, digs0)


def mk_totals(k):
    def f(spad_a, flush0, colend0, d_cm_a):
        acc = jnp.uint32(0)
        for i in range(k):
            t = msm3._bucket_totals(
                jf, spad_a, flush0 + jnp.uint32(i), colend0,
                d_cm_a, R, C, c_blk, nb, True, "fast",
            )
            acc = acc + t["x"][0, 0] + t["zz"][-1, -1]
        return acc
    return f


# --- weighted reduce ------------------------------------------------------
totals0 = jax.jit(
    lambda fl, ce: msm3._bucket_totals(
        jf, spad, fl, ce, d_cm, R, C, c_blk, nb, True, "fast"
    )
)(flush0, colend0)


def mk_reduce(k):
    def f(totals0):
        acc = jnp.uint32(0)
        for i in range(k):
            s = _bucket_reduce(jf, {kk: v + jnp.uint32(i) for kk, v in totals0.items()})
            acc = acc + s["x"][0, 0]
        return acc
    return f


slope("digits", mk_digits)
slope("sort", mk_sort)
slope("gather", mk_gather, xyt, order_dev)
slope("pack", mk_pack, xy_flat)
slope("accum kernel", mk_kernel, pts0, digs0)
slope("bucket totals", mk_totals, spad, flush0, colend0, d_cm)
slope("weighted reduce", mk_reduce, totals0)
print("done", flush=True)
