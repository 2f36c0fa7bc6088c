"""Microbenchmarks for the field-arithmetic design space on TPU v5e.

Measures (steady-state, warm compile, K iterations chained inside one jit
dispatch so tunnel latency amortizes):
  1. raw elementwise u32 multiply throughput (VPU speed of light probe)
  2. raw u32 multiply + mask + shift (the per-product schoolbook pattern)
  3. current Pallas mont_mul (16x16-bit limbs)
  4. variants (see below)

Run: python perf/ubench_field.py [N_LOG2]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def _sync(out):
    # on the tunneled backend block_until_ready returns early; a host
    # transfer of one element forces real synchronization
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def timeit(name, fn, *args, work_per_elem=1, elems=N, iters=ITERS):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    rate = elems / dt
    print(f"{name:48s} {dt*1e3:8.3f} ms/iter  {rate/1e6:10.2f} M elem/s  "
          f"{rate*work_per_elem/1e9:8.1f} G op/s")
    return dt


# ---------------------------------------------------------------------------
# 1/2: raw VPU probes (pure XLA, should fuse into one kernel)
# ---------------------------------------------------------------------------

@jax.jit
def raw_mul_chain(a, b):
    # 64 dependent multiplies per element per iter
    def body(_, x):
        for _ in range(64):
            x = x * b
        return x
    return jax.lax.fori_loop(0, ITERS, body, a)


@jax.jit
def raw_mulmask_chain(a, b):
    def body(_, x):
        for _ in range(64):
            t = x * b
            x = (t & jnp.uint32(0xFFFF)) + (t >> 16)
        return x
    return jax.lax.fori_loop(0, ITERS, body, a)


@jax.jit
def raw_f32_chain(a, b):
    def body(_, x):
        for _ in range(64):
            x = x * b + a
        return x
    return jax.lax.fori_loop(0, ITERS, body, a)


# ---------------------------------------------------------------------------
# 3: current-style mont_mul pallas kernel, (16, N) u32 limbs of 16 bits
# ---------------------------------------------------------------------------

# pasta pallas field
P = 0x40000000000000000000000000000000224698fc094cf91b992d30ed00000001


def to_limbs16(v, n=16):
    return [(v >> (16 * i)) & 0xFFFF for i in range(n)]

P_LIMBS = to_limbs16(P)
N0INV = (-pow(P, -1, 1 << 16)) % (1 << 16)


def mont16_kernel(a_ref, b_ref, o_ref):
    NL = 16
    MASKc = jnp.uint32(0xFFFF)
    p_consts = [jnp.uint32(x) for x in P_LIMBS]
    n0 = jnp.uint32(N0INV)

    def mont(A, B):
        zero = jnp.zeros_like(A[0])
        cols = [zero] * (2 * NL + 1)
        for i in range(NL):
            for j in range(NL):
                t = A[i] * B[j]
                cols[i + j] = cols[i + j] + (t & MASKc)
                cols[i + j + 1] = cols[i + j + 1] + (t >> 16)
        carry = zero
        for i in range(NL):
            t = cols[i] + carry
            m = (t * n0) & MASKc
            pm0 = m * p_consts[0]
            tmp = t + (pm0 & MASKc)
            carry = (tmp >> 16) + (pm0 >> 16)
            for j in range(1, NL):
                pj = m * p_consts[j]
                cols[i + j] = cols[i + j] + (pj & MASKc)
                cols[i + j + 1] = cols[i + j + 1] + (pj >> 16)
        limbs = []
        c = carry
        for k in range(NL, 2 * NL):
            v = cols[k] + c
            limbs.append(v & MASKc)
            c = v >> 16
        return limbs

    A = [a_ref[i, :] for i in range(NL)]
    B = [b_ref[i, :] for i in range(NL)]

    def body(_, A):
        return mont(A, B)

    A = jax.lax.fori_loop(0, ITERS, body, A)
    for i in range(NL):
        o_ref[i, :] = A[i]


@jax.jit
def mont16_chain(a, b):
    blk = 2048 if a.shape[1] % 2048 == 0 else 256
    return pl.pallas_call(
        mont16_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=(a.shape[1] // blk,),
        in_specs=[pl.BlockSpec((16, blk), lambda i: (0, i))] * 2,
        out_specs=pl.BlockSpec((16, blk), lambda i: (0, i)),
    )(a, b)


# ---------------------------------------------------------------------------
# 4a: deferred-carry variant: accumulate lo/hi sums separately without
#     masking each product (lo parts summed after one mask; the trick is to
#     batch mask+shift once per (i) row instead of per (i,j) product by
#     keeping row sums; still exact because 16 products of 32b overflow --
#     so instead split b ONCE into lo/hi 8-bit? probe a 8-bit limb variant)
# ---------------------------------------------------------------------------

# 32 limbs of 8 bits: products 16 bits; sum of 32 products < 2^21. Masks per
# product avoided entirely: accumulate full 16-bit products into columns
# directly (column k = sum_{i+j=k} a_i*b_j <= 32 * 2^16 = 2^21), then one
# carry pass. Montgomery reduction in radix 2^8: 32 sequential steps, but
# each only 32 cheap ops. More total mults (1024 vs 256+mask ops).


def mont8_kernel(a_ref, b_ref, o_ref):
    NL = 32
    MASKc = jnp.uint32(0xFF)
    p_limbs8 = [(P >> (8 * i)) & 0xFF for i in range(NL)]
    p_consts = [jnp.uint32(x) for x in p_limbs8]
    n0 = jnp.uint32((-pow(P, -1, 1 << 8)) % (1 << 8))

    def mont(A, B):
        zero = jnp.zeros_like(A[0])
        cols = [zero] * (2 * NL)
        for i in range(NL):
            for j in range(NL):
                cols[i + j] = cols[i + j] + A[i] * B[j]
        carry = zero
        for i in range(NL):
            t = cols[i] + carry
            m = (t * n0) & MASKc
            tmp = t + m * p_consts[0]
            carry = tmp >> 8
            for j in range(1, NL):
                cols[i + j] = cols[i + j] + m * p_consts[j]
        limbs = []
        c = carry
        for k in range(NL, 2 * NL):
            v = cols[k] + c
            limbs.append(v & MASKc)
            c = v >> 8
        return limbs

    A = [a_ref[i, :] for i in range(NL)]
    B = [b_ref[i, :] for i in range(NL)]

    def body(_, A):
        return mont(A, B)

    A = jax.lax.fori_loop(0, ITERS, body, A)
    for i in range(NL):
        o_ref[i, :] = A[i]


@jax.jit
def mont8_chain(a, b):
    blk = 1024 if a.shape[1] % 1024 == 0 else 256
    return pl.pallas_call(
        mont8_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=(a.shape[1] // blk,),
        in_specs=[pl.BlockSpec((32, blk), lambda i: (0, i))] * 2,
        out_specs=pl.BlockSpec((32, blk), lambda i: (0, i)),
    )(a, b)


def main():
    print(f"backend={jax.default_backend()} N=2^{N.bit_length()-1} "
          f"iters={ITERS} (x64 inner for raw probes)")
    key = jax.random.PRNGKey(0)
    a32 = jax.random.randint(key, (16, N), 0, 1 << 16, dtype=jnp.int32).astype(jnp.uint32)
    b32 = jax.random.randint(key, (16, N), 1, 1 << 16, dtype=jnp.int32).astype(jnp.uint32)
    flat_a = a32.reshape(-1)[: N]
    flat_b = b32.reshape(-1)[: N] | jnp.uint32(1)

    timeit("raw u32 mul x64 (XLA)", raw_mul_chain, flat_a, flat_b,
           work_per_elem=64 * ITERS)
    timeit("raw u32 mul+mask+shift+add x64 (XLA)", raw_mulmask_chain,
           flat_a, flat_b, work_per_elem=64 * ITERS)
    af = flat_a.astype(jnp.float32)
    bf = flat_b.astype(jnp.float32) / 65536.0
    timeit("raw f32 fma x64 (XLA)", raw_f32_chain, af, bf,
           work_per_elem=64 * ITERS)

    timeit("mont_mul 16x16b pallas", mont16_chain, a32, b32,
           work_per_elem=ITERS, elems=N)

    a8 = jax.random.randint(key, (32, N), 0, 256, dtype=jnp.int32).astype(jnp.uint32)
    b8 = jax.random.randint(key, (32, N), 0, 256, dtype=jnp.int32).astype(jnp.uint32)
    timeit("mont_mul 32x8b pallas", mont8_chain, a8, b8,
           work_per_elem=ITERS, elems=N)


if __name__ == "__main__":
    main()
