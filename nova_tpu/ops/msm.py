"""TPU multi-scalar multiplication: sorted-bucket Pippenger.

Replaces the reference's msm/msm_small (src/provider/msm.rs:225-677) with a
SIMD formulation (SURVEY.md §7 step 3). The Rust code scatters points into
buckets with serial loops; TPUs need uniform vector steps, so bucket
accumulation becomes:

  1. per window: digits d_i; sort points by digit (XLA sort)
  2. within-segment ranks r_i = i - first_index(d_i) (searchsorted)
  3. R rounds of masked pairwise combines at strides 1,2,4,...(Brent-Kung on
     ranks): lane i absorbs lane i+2^k when both share a digit and
     r_i ≡ 0 mod 2^{k+1}. R = ceil(log2(max bucket load)) — computed on the
     host from a bincount, so work is ~R·N point-adds, not N·log N.
  4. segment heads scatter into a dense bucket table (unique indices)
  5. window sum = sum_b b·B_b via a Hillis-Steele suffix scan + reduction
     over the (small) bucket table, both as fori_loops.
  6. Horner combine across windows (c doublings per step).

Every jax.lax.fori_loop body contains exactly one masked point-add, so the
compiled graph stays small regardless of N (the earlier associative_scan
formulation inlined the operator ~40x and took minutes to compile).

Sharding: points/scalars partition on N across a mesh; each device builds
full local bucket tables which all-reduce with point-adds (log-tree over
devices); see nova_tpu/parallel/mesh.py."""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nova_tpu.curves.jpoints import (
    xyzz_add,
    xyzz_double,
    xyzz_from_affine,
    xyzz_select,
    xyzz_to_affine_host,
    xyzz_zero,
)
from nova_tpu.curves.spec import AffinePoint, CurveSpec
from nova_tpu.fields.jfield import JField
from nova_tpu.fields.spec import NUM_LIMBS


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


class DeviceBases:
    """Affine bases marshalled to device: x, y (N,16) Montgomery, inf (N,)."""

    def __init__(self, curve: CurveSpec, points: Sequence[AffinePoint]):
        self.curve = curve
        jf = JField(curve.base)
        self.jf = jf
        xs = jf.pack([p.x for p in points])
        ys = jf.pack([p.y for p in points])
        to_mont = jf.jit("to_mont")
        self.x = to_mont(jnp.asarray(xs))
        self.y = to_mont(jnp.asarray(ys))
        self.inf = jnp.asarray(np.array([p.infinity for p in points], dtype=bool))
        self.n = len(points)

    _cache: dict = {}

    @classmethod
    def for_key(cls, curve: CurveSpec, points, cache_key=None) -> "DeviceBases":
        if cache_key is not None and cache_key in cls._cache:
            db = cls._cache[cache_key]
            if db.n >= len(points):
                return db
        db = cls(curve, points)
        if cache_key is not None:
            cls._cache[cache_key] = db
        return db


def scalars_to_limbs16(scalars: Sequence[int]) -> np.ndarray:
    buf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    return np.frombuffer(buf, dtype="<u2").reshape(len(scalars), 16).astype(np.uint32)


def digits_for_windows(limbs16: np.ndarray, c: int, num_windows: int) -> np.ndarray:
    """(W, N) uint32 window digits from (N, 16) 16-bit limbs (numpy)."""
    n = limbs16.shape[0]
    out = np.zeros((num_windows, n), dtype=np.uint32)
    mask = (1 << c) - 1
    for w in range(num_windows):
        bit_lo = w * c
        li, ofs = bit_lo // 16, bit_lo % 16
        d = limbs16[:, li] >> ofs
        have = 16 - ofs
        if have < c and li + 1 < 16:
            d = d | (limbs16[:, li + 1] << have)
        out[w] = d & mask
    return out


def _window_bucket_table_body(jf, c: int, rounds: int, d, bx, by, binf):
    """One Pippenger window up to the dense bucket table (B, 16): sort by
    digit, Brent-Kung segmented combine, scatter segment heads."""
    n = d.shape[0]
    num_buckets = 1 << c

    order = jnp.argsort(d)
    ds = d[order]
    px = bx[order]
    py = by[order]
    pinf = binf[order] | (ds == 0)

    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.searchsorted(ds, ds, side="left").astype(jnp.int32)
    rank = idx - first

    pts = xyzz_from_affine(jf, px, py, pinf)

    def round_body(k, pts):
        shift = jnp.int32(1) << k
        partner = jnp.minimum(idx + shift, jnp.int32(n - 1))
        q = {key: v[partner] for key, v in pts.items()}
        same = (ds[partner] == ds) & ((idx + shift) < n)
        active = same & ((rank & ((shift << 1) - 1)) == 0)
        combined = xyzz_add(jf, pts, q)
        return xyzz_select(jf, active, combined, pts)

    pts = jax.lax.fori_loop(0, rounds, round_body, pts)

    heads = rank == 0
    ids = jnp.where(heads, ds, jnp.uint32(0)).astype(jnp.int32)
    buckets = xyzz_zero(jf, jnp.zeros((num_buckets, NUM_LIMBS), jnp.uint32))
    zero_pt = xyzz_zero(jf, jnp.zeros((n, NUM_LIMBS), jnp.uint32))
    vals = xyzz_select(jf, heads, pts, zero_pt)
    buckets = {k: buckets[k].at[ids].set(vals[k]) for k in buckets}
    one_zero = xyzz_zero(jf, jnp.zeros((1, NUM_LIMBS), jnp.uint32))
    buckets = {k: buckets[k].at[0:1].set(one_zero[k]) for k in buckets}
    return buckets


def _bucket_table_to_sum(jf, c: int, buckets):
    """Weighted bucket reduction sum_b b*B[b] via suffix scan + tree."""
    num_buckets = 1 << c

    # suffix sums S[b] = sum_{b' >= b} B[b'] (Hillis-Steele, log2(B) rounds)
    bidx = jnp.arange(num_buckets, dtype=jnp.int32)

    def suffix_body(k, S):
        shift = jnp.int32(1) << k
        partner = jnp.minimum(bidx + shift, jnp.int32(num_buckets - 1))
        q = {key: v[partner] for key, v in S.items()}
        valid = (bidx + shift) < num_buckets
        combined = xyzz_add(jf, S, q)
        return xyzz_select(jf, valid, combined, S)

    S = jax.lax.fori_loop(0, c, suffix_body, buckets)

    # window sum = sum_{k=1..B-1} S[k]; mask out k=0 then tree-reduce
    S1 = xyzz_select(
        jf,
        bidx >= 1,
        S,
        xyzz_zero(jf, jnp.zeros((num_buckets, NUM_LIMBS), jnp.uint32)),
    )

    def reduce_body(k, T):
        shift = jnp.int32(1) << k
        partner = jnp.minimum(bidx + shift, jnp.int32(num_buckets - 1))
        q = {key: v[partner] for key, v in T.items()}
        valid = (bidx + shift) < num_buckets
        combined = xyzz_add(jf, T, q)
        return xyzz_select(jf, valid, combined, T)

    T = jax.lax.fori_loop(0, c, reduce_body, S1)
    return {k: v[0] for k, v in T.items()}


def _window_bucket_sum_body(jf, c: int, rounds: int, d, bx, by, binf):
    """One full Pippenger window: bucket table + weighted reduction
    (used by the sharded MSM path; the single-chip kernel splits the two
    phases so bucket tables can accumulate across point chunks)."""
    buckets = _window_bucket_table_body(jf, c, rounds, d, bx, by, binf)
    return _bucket_table_to_sum(jf, c, buckets)


# Peak-HBM budget in window-point units. With the fused Pallas point
# kernels a window-point in flight costs ~0.5KB (4 XYZZ coords + a few
# temps), so 2^21 window-points ≈ 4GB. The portable XLA path (CPU tests)
# costs ~13KB/point but only runs at tiny sizes.
_WINDOW_POINT_BUDGET = 1 << 21


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _msm_kernel(field_p: int, c: int, rounds: int, d_all, bx, by, binf):
    """The FUSED MSM: one device dispatch per call.

    Points are processed in chunks (lax.scan) so peak HBM stays bounded.
    Each chunk contributes a dense bucket TABLE per window; tables
    accumulate across chunks with one batched point-add per chunk (W*B
    adds), and the weighted bucket reduction + Horner combine run once at
    the end. This keeps the expensive suffix/tree phase out of the chunk
    loop, which is what makes windows wider than 8 bits profitable.

    d_all: (W, N) uint32 digits. Returns (x, y, zz, zzz) each (16,) uint32
    in standard (non-Montgomery) form.
    """
    jf = JField._instances[field_p]
    W, n = d_all.shape
    num_buckets = 1 << c

    chunk = max(1, _WINDOW_POINT_BUDGET // max(1, W))
    chunk = min(chunk, n)
    # round down to a power of two FIRST: repeated floor-halving of a
    # non-power-of-two (e.g. 2^21//20) never divides a pow2 n and
    # degenerated to chunk=1 (a 100k+-step lax.scan)
    chunk = 1 << (chunk.bit_length() - 1)
    while n % chunk:
        chunk //= 2
    k = n // chunk

    d_k = d_all.reshape(W, k, chunk).transpose(1, 0, 2)  # (K, W, C)
    bx_k = bx.reshape(k, chunk, NUM_LIMBS)
    by_k = by.reshape(k, chunk, NUM_LIMBS)
    binf_k = binf.reshape(k, chunk)

    def per_chunk(carry, inp):
        d_c, bx_c, by_c, binf_c = inp

        def one_window(d):
            return _window_bucket_table_body(jf, c, rounds, d, bx_c, by_c, binf_c)

        if c <= 10:
            tables = jax.vmap(one_window)(d_c)  # dict of (W, B, 16)
        else:
            tables = jax.lax.map(one_window, d_c)
        return xyzz_add(jf, carry, tables), None

    acc0 = xyzz_zero(jf, jnp.zeros((W, num_buckets, NUM_LIMBS), jnp.uint32))
    tables, _ = jax.lax.scan(per_chunk, acc0, (d_k, bx_k, by_k, binf_k))

    # weighted bucket reduction per window
    def reduce_one(table):
        return _bucket_table_to_sum(jf, c, table)

    if c <= 10:
        window_pts = jax.vmap(reduce_one)(tables)  # dict of (W, 16)
    else:
        window_pts = jax.lax.map(reduce_one, tables)

    # Horner from the top window down: acc = 2^c * acc + W_w
    rev = {k2: v[::-1] for k2, v in window_pts.items()}
    acc0 = xyzz_zero(jf, jnp.zeros((NUM_LIMBS,), jnp.uint32))

    def horner(acc, ws):
        def dbl(_, a):
            return xyzz_double(jf, a)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        return xyzz_add(jf, acc, ws), None

    final, _ = jax.lax.scan(horner, acc0, rev)
    out = {k2: jf.from_mont(v.reshape(1, NUM_LIMBS))[0] for k2, v in final.items()}
    return out["x"], out["y"], out["zz"], out["zzz"]


def msm_device(
    scalars: Sequence[int],
    bases: Sequence[AffinePoint] = None,
    device_bases: Optional[DeviceBases] = None,
    window: Optional[int] = None,
) -> AffinePoint:
    """MSM with host int scalars; compute on device. `device_bases` reuses a
    marshalled commitment key."""
    n = len(scalars)
    if n == 0:
        raise ValueError("empty msm")
    if device_bases is None:
        device_bases = DeviceBases(bases[0].curve, bases)
    curve = device_bases.curve
    jf = JField(curve.base)

    n_pad = max(2, _next_pow2(n))
    limbs = np.zeros((n_pad, 16), dtype=np.uint32)
    limbs[:n] = scalars_to_limbs16(scalars)

    bx, by, binf = device_bases.x, device_bases.y, device_bases.inf
    if device_bases.n < n_pad:
        pad = n_pad - device_bases.n
        bx = jnp.concatenate([bx, jnp.zeros((pad, NUM_LIMBS), jnp.uint32)])
        by = jnp.concatenate([by, jnp.zeros((pad, NUM_LIMBS), jnp.uint32)])
        binf = jnp.concatenate([binf, jnp.ones((pad,), bool)])
    elif device_bases.n > n_pad:
        bx, by, binf = bx[:n_pad], by[:n_pad], binf[:n_pad]

    if window is None:
        # With bucket tables accumulated across point chunks the bucket
        # tree runs once, so wide windows win: measured at 2^16 points
        # c=8 1.82s / c=12 1.29s / c=13 0.90s (73k pts/s). Small inputs
        # keep c=8 (the 2^13-bucket tree would dominate); very large
        # inputs stay at c=8 for now — a c=13 run at 2^20 faulted the
        # TPU worker (suspect HBM pressure in the chunked scan), pending
        # diagnosis.
        window = 13 if (1 << 14) <= n_pad <= (1 << 18) else 8
    # msm_small fast path (reference msm.rs:469-530 bit-width routing):
    # only process windows covered by the widest scalar. Quantized to
    # powers of two so the jit signature takes few values.
    num_bits = max((int(s).bit_length() for s in scalars), default=1)
    num_bits = max(1, min(num_bits, curve.scalar.num_bits))
    num_windows = (num_bits + window - 1) // window
    full_windows = (curve.scalar.num_bits + window - 1) // window
    q = 1
    while q < num_windows:
        q *= 2
    num_windows = min(q, full_windows)

    digits = digits_for_windows(limbs, window, num_windows)
    # rounds must cover the largest bucket load WITHIN a point chunk (the
    # sorted combine runs per chunk; tables merge across chunks). Quantize
    # to an even count so the jit signature takes few distinct values.
    chunk = max(1, _WINDOW_POINT_BUDGET // max(1, num_windows))
    chunk = min(chunk, n_pad)
    chunk = 1 << (chunk.bit_length() - 1)
    while n_pad % chunk:
        chunk //= 2
    max_load = 1
    for w in range(num_windows):
        for off in range(0, n_pad, chunk):
            counts = np.bincount(digits[w, off : off + chunk])
            if counts.size > 1:
                max_load = max(max_load, int(counts[1:].max(initial=1)))
    rounds = max(2, int(np.ceil(np.log2(max_load))) if max_load > 1 else 2)
    rounds = min(((rounds + 1) // 2) * 2, max(1, chunk.bit_length() - 1))

    d_dev = jnp.asarray(digits)
    x, y, zz, zzz = _msm_kernel(jf.spec.p, window, rounds, d_dev, bx, by, binf)
    # one synchronous host transfer; exact affine conversion on host ints
    xv = _limbs16_to_int(np.asarray(jax.device_get(x)))
    yv = _limbs16_to_int(np.asarray(jax.device_get(y)))
    zzv = _limbs16_to_int(np.asarray(jax.device_get(zz)))
    zzzv = _limbs16_to_int(np.asarray(jax.device_get(zzz)))
    f = curve.base
    if zzv == 0:
        return AffinePoint.identity(curve)
    return AffinePoint(curve, f.mul(xv, f.inv(zzv)), f.mul(yv, f.inv(zzzv)))


def _limbs16_to_int(row: np.ndarray) -> int:
    return int.from_bytes(row.astype(np.uint16).astype("<u2").tobytes(), "little")
