"""TPU MSM v3: column-serial segmented accumulation.

Replaces the v2 Brent-Kung stage cascade (ops/msm2.py) for the fixed-base
path after accounting showed the cascade computes ~4.3 masked point adds
per (point, digit) pair (inactive lanes still pay the full formula every
round) plus an argsort compaction per stage. This design performs exactly
ONE useful mixed add per pair and needs no scatter anywhere:

  1. signed c-bit digits over the joint fixed-base window space
     (window-shifted bases fold the 2^(c*w) weight into the base, so all
     windows share one bucket space; see msm2._precompute_shifted).
  2. ONE sort of the W*n (|digit|, index) pairs; points gathered into a
     COLUMN-MAJOR (R, C) grid: sorted element j*R + i lands at row i,
     column j. Each column is a contiguous slice of the sorted order.
  3. accumulate kernel: grid over column blocks; each step processes one
     row across the block's lanes — acc <- acc + P (10-mul XYZZ+affine
     mixed add) when the digit matches the previous row, else the old
     acc is FLUSHED to that row's slot and acc restarts at P. Every lane
     does useful work every step; flush positions are data-dependent but
     writes are dense (row-shaped), so no scatter.
  4. bucket recovery by GATHER: bucket b's run ends at sorted position
     C_b - 1 where C_b = searchsorted(sorted_digits, b, 'right'); its
     within-column partial was flushed at row (C_b-1)%R + 1 of column
     (C_b-1)//R (or is the column-end carry when the run touches the
     column end). Runs spanning columns contribute one carry per column
     boundary; the C column-end carries (digits non-decreasing by
     construction) recurse through the same kernel (level 2, XYZZ
     inputs), whose 128 carries finish with a masked suffix-add pass.
  5. weighted bucket reduction + host finish reused from msm2.

Fast adds flag degenerate lanes (P = +-acc) exactly like msm2; the MSM
reruns through complete-formula kernels when flagged (never for honest
distinct-base inputs). Reference algorithm: src/provider/msm.rs:225-419.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nova_tpu.fields.jfield import JField
from nova_tpu.fields.spec import NUM_LIMBS

from nova_tpu.ops.msm2 import (
    _PALLAS_OK,
    _field_key,
    _limb_ops,
    _negate_y,
    _next_pow2,
    _bucket_reduce,
    _precompute_shifted,
    _scalar_limbs,
    _sized,
    _use_pallas,
    _xyzz_add_limbs,
    _xyzz_add_limbs_fast,
    _xyzz_row_to_affine,
    signed_digits_device,
    DeviceBases2,
)

if _PALLAS_OK:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

SLAB = 8  # rows per DMA slab
C_BLK = 1024  # lanes per kernel block


def _num_windows(c: int, max_bits: int = None) -> int:
    """Window count covering `max_bits`-bit scalars (default: full
    255-bit field scalars). Small-scalar MSMs (the reference's msm_small
    routing, src/provider/msm.rs:469-530) pass the caller's bit bound so
    a 1/10/16-bit commit pays 1-2 windows instead of 17."""
    if max_bits is None:
        return (255 + c - 1) // c + 1
    # signed-digit offset needs u = s + offset < 2^(c*W); offset is just
    # over 2^(c*W-1), so c*W >= max_bits + 2 guarantees headroom
    return max(1, -(-(max_bits + 2) // c))


def _windows_for(c: int, scalar_p: int, max_bits: int = None) -> int:
    """Effective window count: the caller's max_bits when given, else
    the symmetric-range bound |s'| <= (p-1)/2 (the scalar negates the
    point via digit signs, offset_digits_device)."""
    if max_bits is not None:
        return _num_windows(c, max_bits)
    return _num_windows(c, scalar_p.bit_length() - 1)


def _sym_reduce_host(scalars, p: int):
    """Host symmetric-range reduction: (|s'| list, negs bool array)."""
    half = p >> 1
    out = []
    negs = np.zeros(len(scalars), dtype=bool)
    for i, sc in enumerate(scalars):
        sc = int(sc) % p
        if sc > half:
            out.append(p - sc)
            negs[i] = True
        else:
            out.append(sc)
    return out, negs


def _offset_int(c: int, W: int = None) -> int:
    """sum_w 2^(c-1) * 2^(c*w): adding this to a scalar makes its
    unsigned base-2^c digits u_w satisfy d_w = u_w - 2^(c-1) in
    [-2^(c-1), 2^(c-1)-1] with sum d_w 2^(cw) = s — signed digits with
    no carry chain (the device-side lax.scan carry propagation measured
    tens of ms through the remote backend)."""
    if W is None:
        W = _num_windows(c)
    return sum(1 << (c - 1 + c * w) for w in range(W))


def _scalar_ulimbs(scalars, n_pad: int, c: int, W: int = None) -> np.ndarray:
    """(n_pad, L) uint32 16-bit limbs of s + _offset_int(c, W)."""
    if W is None:
        W = _num_windows(c)
    off = _offset_int(c, W)
    nbytes = (c * W + 15) // 16 * 2
    L = nbytes // 2
    buf = b"".join((int(s) + off).to_bytes(nbytes, "little") for s in scalars)
    # pad rows encode scalar 0 (u = offset) so they stay digit-0/inert
    off_row = np.frombuffer(
        off.to_bytes(nbytes, "little"), dtype="<u2"
    ).astype(np.uint32)
    limbs = np.broadcast_to(off_row, (n_pad, L)).copy()
    limbs[: len(scalars)] = (
        np.frombuffer(buf, dtype="<u2")
        .reshape(len(scalars), L)
        .astype(np.uint32)
    )
    return limbs


def offset_digits_device(ulimbs, c: int, W: int = None, negs=None):
    """(N, L) 16-bit limbs of s+offset -> (W, N) int32 signed digits
    (pure bit slicing; no scan). `negs` (N,) bool flips the sign of
    every digit of the flagged scalars: the symmetric-range reduction
    (s' = p - s when s > (p-1)/2, point negated via the digit sign)
    drops the top window so 255-bit scalars fit c*W = 256 exactly —
    W = 16 at c = 16 makes n_s a power of two at power-of-two n."""
    n, L = ulimbs.shape
    if W is None:
        W = _num_windows(c)
    mask = jnp.uint32((1 << c) - 1)
    half = jnp.int32(1 << (c - 1))
    outs = []
    for w in range(W):
        bit_lo = w * c
        li, ofs = bit_lo // 16, bit_lo % 16
        if li >= L:
            d = jnp.zeros((n,), jnp.uint32)
        else:
            d = ulimbs[:, li] >> ofs
            have = 16 - ofs
            j = li + 1
            while have < c and j < L:
                d = d | (ulimbs[:, j] << have)
                have += 16
                j += 1
        outs.append((d & mask).astype(jnp.int32) - half)
    ds = jnp.stack(outs)
    if negs is not None:
        ds = jnp.where(negs[None, :], -ds, ds)
    return ds


# ---------------------------------------------------------------------------
# add formulas on limb lists
# ---------------------------------------------------------------------------


def _madd_fast(o, ACC, X2, Y2, live):
    """XYZZ += affine mixed add (madd-2008-s, 10 muls), without the
    doubling path. `live` masks lanes whose affine operand is real (False
    = identity). Returns (result coords, bad) where bad flags degenerate
    P = +-Q lanes (x-coords collide, both operands live)."""
    X1, Y1, ZZ1, ZZZ1 = ACC
    U2 = o.mul(X2, ZZ1)
    S2 = o.mul(Y2, ZZZ1)
    Pd = o.sub(U2, X1)
    Rd = o.sub(S2, Y1)
    PP = o.mul(Pd, Pd)
    PPP = o.mul(Pd, PP)
    Q = o.mul(X1, PP)
    RR = o.mul(Rd, Rd)
    X3 = o.sub(o.sub(RR, PPP), o.dbl(Q))
    Y3 = o.sub(o.mul(Rd, o.sub(Q, X3)), o.mul(Y1, PPP))
    ZZ3 = o.mul(ZZ1, PP)
    ZZZ3 = o.mul(ZZZ1, PPP)

    p_zero = o.is_zero(ZZ1)
    q_zero = ~live
    one = o.one(X1[0])

    def pick(res, pc, qc):
        out = o.sel(p_zero, qc, res)
        return o.sel(q_zero & ~p_zero, pc, out)

    ox = pick(X3, X1, X2)
    oy = pick(Y3, Y1, Y2)
    ozz = pick(ZZ3, ZZ1, one)
    ozzz = pick(ZZZ3, ZZZ1, one)
    bad = o.is_zero(Pd) & ~p_zero & ~q_zero
    return (ox, oy, ozz, ozzz), bad


# ---------------------------------------------------------------------------
# the accumulate kernel
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _accum_call(field_key, R: int, c_blk: int, n_blocks: int,
                affine_in: bool, mode: str):
    """pallas_call: serial segmented accumulation down R rows per column,
    c_blk columns per grid block.

    Inputs (HBM):
      pts  (n_blocks, n_slabs, SLAB, nc, NL, c128, 128) u32; nc = 2
           (affine x/y; identity encoded by digit 0) or 4 (XYZZ)
      digs (n_blocks, n_slabs, SLAB, c128, 128) i32 (|digit|; 0 = inert)
    Outputs:
      flush  (n_blocks, n_slabs, SLAB, 4, NL, c128, 128) u32 — row i
             holds the completed-run accumulator when row i's digit
             differs from row i-1's (identity otherwise)
      colend (n_blocks, 4, NL, c128, 128) u32 — final accumulator
      flag   (n_blocks, 1, 128) u32 — degenerate-add indicator (fast mode)
    """
    field_p, p_limbs, n0inv, r_limbs = field_key
    o = _limb_ops(p_limbs, n0inv, r_limbs)
    NL = NUM_LIMBS
    c128 = c_blk // 128
    n_slabs = R // SLAB
    nc = 2 if affine_in else 4

    def kernel(pts_hbm, digs_hbm, flush_hbm, colend_hbm, flag_hbm,
               inb, dgb, outb, accb, prevb, badb, sem):
        b = pl.program_id(0)
        accb[...] = jnp.zeros((4, NL, c128, 128), jnp.uint32)
        prevb[...] = jnp.full((1, c128, 128), -1, jnp.int32)
        badb[...] = jnp.zeros((c128, 128), jnp.uint32)

        def slab_body(s, _):
            fs = b * n_slabs + s
            cp1 = pltpu.make_async_copy(pts_hbm.at[fs], inb, sem.at[0])
            cp2 = pltpu.make_async_copy(digs_hbm.at[fs], dgb, sem.at[1])
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()

            # one fori_loop instantiation of the ~30k-op madd body instead
            # of SLAB unrolled copies: the unrolled kernel lowered to
            # ~50 MB StableHLO at 2^16/c=16, which the tunnel's compile
            # worker cannot survive (PERFORMANCE.md round-3). All loop
            # state lives in refs (accb/prevb/badb); i only indexes the
            # leading (tile-aligned) dim of the VMEM scratch.
            def row_body(i, _):
                d = dgb[i]
                live = d != 0
                boundary = d != prevb[0]
                ACC = tuple(
                    [accb[c, l] for l in range(NL)] for c in range(4)
                )
                X2 = [inb[i, 0, l] for l in range(NL)]
                Y2 = [inb[i, 1, l] for l in range(NL)]
                if affine_in:
                    one = o.one(X2[0])
                    zero = o.zero(X2[0])
                    Zq = o.sel(live, one, zero)
                    Qp = (X2, Y2, Zq, list(Zq))
                else:
                    Qp = (
                        X2,
                        Y2,
                        [inb[i, 2, l] for l in range(NL)],
                        [inb[i, 3, l] for l in range(NL)],
                    )
                if mode == "fast":
                    if affine_in:
                        S_res, bad = _madd_fast(o, ACC, X2, Y2, live)
                    else:
                        S_res, bad = _xyzz_add_limbs_fast(o, ACC, Qp)
                    badb[...] = badb[...] | jnp.where(
                        bad & ~boundary, jnp.uint32(1), jnp.uint32(0)
                    )
                else:
                    S_res = _xyzz_add_limbs(o, ACC, Qp)
                for c in range(4):
                    for l in range(NL):
                        outb[i, c, l] = jnp.where(
                            boundary, ACC[c][l], jnp.uint32(0)
                        )
                        accb[c, l] = jnp.where(
                            boundary, Qp[c][l], S_res[c][l]
                        )
                prevb[...] = d[None]
                return 0

            jax.lax.fori_loop(0, SLAB, row_body, 0)
            cpo = pltpu.make_async_copy(outb, flush_hbm.at[fs], sem.at[2])
            cpo.start()
            cpo.wait()
            return 0

        jax.lax.fori_loop(0, n_slabs, slab_body, 0)
        cpc = pltpu.make_async_copy(accb, colend_hbm.at[b], sem.at[0])
        cpc.start()
        # unsigned reductions do not lower; go through int32
        flagv = jnp.max(badb[...].astype(jnp.int32), axis=0, keepdims=True)
        badb[...] = jnp.broadcast_to(flagv.astype(jnp.uint32), (c128, 128))
        cpc.wait()
        cpf = pltpu.make_async_copy(badb.at[:1], flag_hbm.at[b], sem.at[1])
        cpf.start()
        cpf.wait()

    def call(pts, digs):
        # flatten (n_blocks, n_slabs) so DMA refs index one level deep
        pts = pts.reshape((n_blocks * n_slabs,) + pts.shape[2:])
        digs = digs.reshape((n_blocks * n_slabs,) + digs.shape[2:])
        out_shapes = (
            jax.ShapeDtypeStruct(
                (n_blocks * n_slabs, SLAB, 4, NL, c128, 128), jnp.uint32
            ),
            jax.ShapeDtypeStruct((n_blocks, 4, NL, c128, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_blocks, 1, 128), jnp.uint32),
        )
        flush, colend, flag = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
            scratch_shapes=[
                pltpu.VMEM((SLAB, nc, NL, c128, 128), jnp.uint32),
                pltpu.VMEM((SLAB, c128, 128), jnp.int32),
                pltpu.VMEM((SLAB, 4, NL, c128, 128), jnp.uint32),
                pltpu.VMEM((4, NL, c128, 128), jnp.uint32),
                pltpu.VMEM((1, c128, 128), jnp.int32),
                pltpu.VMEM((c128, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        )(pts, digs)
        flush = flush.reshape(
            (n_blocks, n_slabs, SLAB, 4, NL, c128, 128)
        )
        return flush, colend, flag

    return call


def _accum_xla(jf: JField, d_cm, px_cm, py_cm, mode: str,
               zz_cm=None, zzz_cm=None):
    """Pure-XLA fallback (CPU tests): same semantics via a lax.scan over
    rows. d_cm: (R, C) i32; coords: (R, C, NL) u32 rows. Returns
    (flush (R, C, NL) per coord, colend (C, NL) per coord, flag)."""
    from nova_tpu.curves.jpoints import xyzz_add

    R, C = d_cm.shape
    one = jnp.broadcast_to(jnp.asarray(jf.r_limbs, jnp.uint32), (C, NUM_LIMBS))
    zero = jnp.zeros((C, NUM_LIMBS), jnp.uint32)

    def body(carry, inp):
        prevd, acc = carry
        if zz_cm is None:
            d, x, y = inp
            live = (d != 0)[:, None]
            q = {
                "x": x,
                "y": y,
                "zz": jnp.where(live, one, 0),
                "zzz": jnp.where(live, one, 0),
            }
        else:
            d, x, y, zz, zzz = inp
            q = {"x": x, "y": y, "zz": zz, "zzz": zzz}
        boundary = (d != prevd)[:, None]
        s = xyzz_add(jf, acc, q)
        flush = {k: jnp.where(boundary, acc[k], 0) for k in acc}
        newacc = {
            k: jnp.where(boundary, q[k], s[k]) for k in acc
        }
        return (d, newacc), flush

    acc0 = {"x": zero, "y": zero, "zz": zero, "zzz": zero}
    prev0 = jnp.full((C,), -1, jnp.int32)
    xs = (d_cm, px_cm, py_cm)
    if zz_cm is not None:
        xs = (d_cm, px_cm, py_cm, zz_cm, zzz_cm)
    (_, colend), flush = jax.lax.scan(body, (prev0, acc0), xs)
    return flush, colend, jnp.uint32(0)


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


def _grid_shape(n_s: int):
    """(R, C) with R*C >= n_s, C a C_BLK multiple (or 128 for tiny
    inputs), R a SLAB-multiple POWER OF TWO. R*C being a power of two
    is load-bearing: the sort programs run at length R*C, and XLA:TPU
    sort compiles of non-power-of-two lengths take tens of minutes
    through the tunnel (round-5 finding; perf/probe_sort_matrix.py).
    Aims R in the hundreds so column-end carries stay ~C-sized and
    kernel steps stay wide."""
    if n_s <= (1 << 14):
        C = max(128, _next_pow2(n_s // 64 or 1))
    else:
        C = min(1 << 15, max(C_BLK, _next_pow2(n_s // 1024)))
    R = max(SLAB, _next_pow2(-(-n_s // C)))
    return R, C


def _to_cm(arr, R, C, order):
    """Gather rows of arr ((N, ...) array) into column-major (R, C, ...):
    out[i, j] = arr[order[j*R + i]]."""
    G = order.reshape(C, R).T
    return arr[G]


def _pack_pts(coords, R, C, c_blk):
    """[(R, C, NL) u32, ...] -> (n_blocks, n_slabs, SLAB, nc, NL, c128, 128)."""
    nc = len(coords)
    n_blocks = C // c_blk
    c128 = c_blk // 128
    n_slabs = R // SLAB
    st = jnp.stack(coords)  # (nc, R, C, NL)
    st = st.reshape(nc, n_slabs, SLAB, n_blocks, c128, 128, NUM_LIMBS)
    return st.transpose(3, 1, 2, 0, 6, 4, 5)


def _pack_xy(xy_cm, R, C, c_blk):
    """(R, C, 2*NL) u32 rows [x||y] -> (n_blocks, n_slabs, SLAB, 2, NL,
    c128, 128)."""
    n_blocks = C // c_blk
    c128 = c_blk // 128
    n_slabs = R // SLAB
    st = xy_cm.reshape(n_slabs, SLAB, n_blocks, c128, 128, 2, NUM_LIMBS)
    return st.transpose(2, 0, 1, 5, 6, 3, 4)


def _pack_digs(d_cm, R, C, c_blk):
    n_blocks = C // c_blk
    c128 = c_blk // 128
    n_slabs = R // SLAB
    d = d_cm.reshape(n_slabs, SLAB, n_blocks, c128, 128)
    return d.transpose(2, 0, 1, 3, 4)


def _gather_flush(flush, rows, cols, R, C, c_blk):
    """flush (n_blocks, n_slabs, SLAB, 4, NL, c128, 128); fetch the
    (4, NL) point at (row, col) per query -> dict of (nq, NL)."""
    c128 = c_blk // 128
    blk = cols // c_blk
    jl = cols % c_blk
    slab = rows // SLAB
    srow = rows % SLAB
    sub = jl // 128
    lane = jl % 128
    pt = flush[blk, slab, srow, :, :, sub, lane]  # (nq, 4, NL)
    return {
        k: pt[:, i, :] for i, k in enumerate(("x", "y", "zz", "zzz"))
    }


def _suffix_segmented(jf: JField, digs, vals: dict):
    """Masked Hillis-Steele suffix sums over (m, NL) XYZZ rows grouped by
    equal digits: afterwards the FIRST row of each run holds the run
    total. m must be a power of two (pad with digit -1)."""
    from nova_tpu.curves.jpoints import xyzz_add

    m = digs.shape[0]
    rounds = int(np.ceil(np.log2(max(2, m))))
    iota = jnp.arange(m, dtype=jnp.int32)

    def body(r, vals):
        s = jnp.left_shift(jnp.int32(1), r)
        keep = iota < (m - s)
        dsh = jnp.where(keep, jnp.roll(digs, -s), -2)
        same = (keep & (dsh == digs))[:, None]
        vsh = {
            k: jnp.where(same, jnp.roll(v, -s, axis=0), 0)
            for k, v in vals.items()
        }
        added = xyzz_add(jf, vals, vsh)
        return {k: jnp.where(same, added[k], vals[k]) for k in vals}

    return jax.lax.fori_loop(0, rounds, body, vals)


def _weighted_reduce_xla(jf: JField, table: dict):
    """sum_i (i+1)*T_i = suffix(suffix(T))[0] — two Hillis-Steele suffix
    passes with the round loop under fori_loop so the XLA graph stays
    small (the msm2 CPU fallback unrolls a whole add tree, which takes
    minutes to compile). Returns (NL, 1) coord rows like _bucket_reduce."""
    from nova_tpu.curves.jpoints import xyzz_add

    nb = table["x"].shape[0]
    rounds = int(np.log2(nb))
    iota = jnp.arange(nb, dtype=jnp.int32)

    def body(r, vals):
        s = jnp.left_shift(jnp.int32(1), r)
        keep = (iota < (nb - s))[:, None]
        sh = {
            k: jnp.where(keep, jnp.roll(v, -s, axis=0), 0)
            for k, v in vals.items()
        }
        return xyzz_add(jf, vals, sh)  # zz=0 partners are identities

    S = jax.lax.fori_loop(0, rounds, body, table)
    U = jax.lax.fori_loop(0, rounds, body, S)
    return {k: v[:1].T for k, v in U.items()}


def _bucket_totals(jf: JField, sorted_d, flush, colend, d_cm,
                   R, C, c_blk, nb: int, use_pallas: bool, mode: str):
    """Recover per-bucket totals from level-1 flush/colend, fixing up
    runs that span column boundaries via a level-2 pass over the C
    column-end carries. Returns dict of (nb, NL) XYZZ rows."""
    from nova_tpu.curves.jpoints import xyzz_add

    bs = jnp.arange(1, nb + 1, dtype=sorted_d.dtype)
    right = jnp.searchsorted(sorted_d, bs, side="right").astype(jnp.int32)
    left = jnp.searchsorted(sorted_d, bs, side="left").astype(jnp.int32)
    exists = right > left
    t = right - 1  # global tail position of bucket b
    e = t % R
    jcol = t // R
    # tail partial flushed at row e+1 of column jcol — unless the run
    # touches the column end (e == R-1), in which case it is the
    # column-end carry and is accounted by level 2 below.
    take1 = exists & (e < R - 1)
    rows = jnp.where(take1, e + 1, 0)
    cols = jnp.where(take1, jcol, 0)
    if use_pallas:
        tail1 = _gather_flush(flush, rows, cols, R, C, c_blk)
    else:
        tail1 = {k: flush[k][rows, cols] for k in flush}
    tail1 = {
        k: jnp.where(take1[:, None], v, 0) for k, v in tail1.items()
    }

    # level 2: column-end carries, digits = last row of each column
    dend = d_cm[R - 1]  # (C,) non-decreasing
    if use_pallas:
        cend = {
            k: colend[:, i].transpose(0, 2, 3, 1).reshape(C, NUM_LIMBS)
            for i, k in enumerate(("x", "y", "zz", "zzz"))
        }
        # colend (n_blocks, 4, NL, c128, 128): column j of block b sits
        # at [b, :, :, (j%c_blk)//128, j%128] — transpose to (n_blocks,
        # c128, 128, NL) then flatten restores column order
    else:
        cend = colend

    if C <= 256:
        # single suffix pass finishes it
        m = _next_pow2(C)
        dpad = jnp.concatenate(
            [dend, jnp.full((m - C,), -1, dend.dtype)]
        )
        vpad = {
            k: jnp.concatenate(
                [v, jnp.zeros((m - C, NUM_LIMBS), jnp.uint32)]
            )
            for k, v in cend.items()
        }
        sums = _suffix_segmented(jf, dpad, vpad)
        # head position of digit b within dend
        lh = jnp.searchsorted(dend, bs, side="left").astype(jnp.int32)
        has = (
            jnp.searchsorted(dend, bs, side="right").astype(jnp.int32) > lh
        )
        l2 = {k: sums[k][jnp.where(has, lh, 0)] for k in sums}
        l2 = {k: jnp.where(has[:, None], v, 0) for k, v in l2.items()}
        return xyzz_add(jf, tail1, l2)

    # recurse through the level-2 kernel over (R2, C2 = 128)
    C2 = 128
    R2 = C // C2
    R2p = -(-R2 // SLAB) * SLAB
    pad = R2p * C2 - C
    # column-major (R2p, C2): entry (i, j) = index j*R2p + i of the
    # padded sequence; pad goes at the END (digit -1 sorts nowhere,
    # use 0x7fffffff so it never merges with a real run... runs only
    # merge on equality, so any unused value works; keep 0 = inert)
    dpad = jnp.concatenate([dend, jnp.zeros((pad,), dend.dtype)])
    vpad = {
        k: jnp.concatenate([v, jnp.zeros((pad, NUM_LIMBS), jnp.uint32)])
        for k, v in cend.items()
    }
    # NOTE: zero-pad at the end breaks the non-decreasing order (zeros
    # belong first) — but order only matters for searchsorted lookups on
    # dend (unpadded, still sorted) and run contiguity. A trailing run
    # of digit 0 merges nothing (0 = inert, flushed but never gathered).
    idx2 = jnp.arange(R2p * C2, dtype=jnp.int32)
    d2_cm = dpad[idx2.reshape(C2, R2p).T]
    v2_cm = {k: _to_cm(v, R2p, C2, idx2) for k, v in vpad.items()}
    if use_pallas:
        # level-2 work is tiny (C adds) and its degenerate flag is not
        # plumbed to the retry path — always use complete formulas here
        call = _accum_call(_field_key(jf), R2p, C2, 1, False, "complete")
        pts2 = _pack_pts(
            [v2_cm["x"], v2_cm["y"], v2_cm["zz"], v2_cm["zzz"]],
            R2p, C2, C2,
        )
        digs2 = _pack_digs(d2_cm, R2p, C2, C2)
        flush2, colend2, _ = call(pts2, digs2)
    else:
        flush2, colend2, _ = _accum_xla(
            jf, d2_cm, v2_cm["x"], v2_cm["y"], "complete",
            v2_cm["zz"], v2_cm["zzz"],
        )

    # level-2 tails: position of b within the padded sequence
    right2 = jnp.searchsorted(dpad[: C], bs, side="right").astype(jnp.int32)
    left2 = jnp.searchsorted(dpad[: C], bs, side="left").astype(jnp.int32)
    exists2 = right2 > left2
    t2 = right2 - 1
    e2 = t2 % R2p
    j2 = t2 // R2p
    take2 = exists2 & (e2 < R2p - 1)
    rows2 = jnp.where(take2, e2 + 1, 0)
    cols2 = jnp.where(take2, j2, 0)
    if use_pallas:
        tail2 = _gather_flush(flush2, rows2, cols2, R2p, C2, C2)
    else:
        tail2 = {k: flush2[k][rows2, cols2] for k in flush2}
    tail2 = {k: jnp.where(take2[:, None], v, 0) for k, v in tail2.items()}

    # level 3: the C2 = 128 level-2 column-end carries via suffix pass
    dend2 = d2_cm[R2p - 1]  # (C2,)
    if use_pallas:
        cend2 = {
            k: colend2[0, i].transpose(1, 2, 0).reshape(C2, NUM_LIMBS)
            for i, k in enumerate(("x", "y", "zz", "zzz"))
        }
    else:
        cend2 = colend2
    sums3 = _suffix_segmented(jf, dend2, cend2)
    # dend2 is NOT globally sorted (level-2 zero-pad sits at the end),
    # so locate run heads by masked arg-match instead of searchsorted
    iota = jnp.arange(C2, dtype=jnp.int32)
    matches = dend2[None, :] == bs[:, None]  # (nb, C2)
    headpos = jnp.min(
        jnp.where(matches, iota[None, :], C2), axis=1
    )
    has3 = headpos < C2
    l3 = {k: sums3[k][jnp.where(has3, headpos, 0)] for k in sums3}
    l3 = {k: jnp.where(has3[:, None], v, 0) for k, v in l3.items()}

    acc = xyzz_add(jf, tail1, tail2)
    return xyzz_add(jf, acc, l3)


# --------------------------------------------------------------------------
# split-phase pipeline (the single-program form below, _msm3_core, hangs
# XLA's compiler at bench sizes: every piece compiles in seconds-to-minutes
# alone — accum kernel 10 s, 33-operand sort 8.6 s, bucket recovery 108 s
# at 2^16/c=16 — but the fused graph sat >46 min in the tunnel's compile
# worker without returning. Three separately-jitted programs with
# device-resident intermediates sidestep whatever superlinear pass that
# is, compile-cache independently, and let the degenerate-retry path
# reuse the sort phase. Used by msm_device3/msm_device3_mont on the
# Pallas path; _msm3_core stays for shard_map and the XLA fallback.
# --------------------------------------------------------------------------


def _prep_tail(d, yT, ynegT, finf):
    """digits -> (absd (n_s,) i32, ysel (NL, n_s) u32): |digit| with
    infinity forced inert, and the y/-y limb selection for negative
    digits. Elementwise only — kept OUT of the sort programs (fusing
    the digit-extraction graph into sort operands is what hung the
    tunnel's compile worker; see _sortpack_tail)."""
    absd = jnp.where(finf, 0, jnp.abs(d)).astype(jnp.int32)
    dneg = d < 0
    ysel = jnp.stack(
        [jnp.where(dneg, ynegT[l], yT[l]) for l in range(NUM_LIMBS)]
    )
    return absd, ysel


def _perm_tail(absd):
    """One (|digit|, idx) sort fixes the permutation; one (sidx, idx)
    sort inverts it into per-element destination ranks (both 2-operand,
    cheap comparators)."""
    n_s = absd.shape[0]
    iota = jax.lax.iota(jnp.int32, n_s)
    sorted_d, sidx = jax.lax.sort(
        (absd, iota), num_keys=1, is_stable=False
    )
    _, rank = jax.lax.sort((sidx, iota), num_keys=1, is_stable=False)
    return sorted_d, rank


def _move_tail(rank, xT, ysel, pad):
    """Move the 32 point-limb columns into sorted order with 2-operand
    sorts keyed on the unique destination rank (sort-as-data-mover:
    ~13 GB/s effective on the v5e vs ~2.2 GB/s for an XLA row gather —
    perf/probe_gather.py). Unique keys make the unstable order
    deterministic and identical across the 32 sorts."""
    outs = []
    for l in range(NUM_LIMBS):
        outs.append(
            jax.lax.sort((rank, xT[l]), num_keys=1, is_stable=False)[1]
        )
    for l in range(NUM_LIMBS):
        outs.append(
            jax.lax.sort((rank, ysel[l]), num_keys=1, is_stable=False)[1]
        )
    st = jnp.stack(outs)  # (2*NL, n_s)
    if pad:
        st = jnp.concatenate(
            [jnp.zeros((2 * NUM_LIMBS, pad), jnp.uint32), st], axis=1
        )
    return st


def _sortpack_tail(jf: JField, d, xT, yT, ynegT, finf):
    """Trace-level: digits+points -> (sorted_d (R*C,), st (2*NL, R*C)).

    Round-5 rewrite (fifth design — what finally both compiles AND
    streams; perf/probe_sort_matrix.py + perf/probe_gather.py hold the
    measurements). History on the axon tunnel at bench sizes: (1) one
    33-operand variadic sort (key + 32 point-limb payloads) hangs the
    compile worker (>18 min at 2^14/c=16); (2) 2-operand sort + row
    gather compiles in 30 s but the gather executes at ~2.2 GB/s
    (~50 ms at 2^16/c=13; the round-2 "<0.05 ms gather" probe had timed
    only the async dispatch); (3) 9-operand sorts, stable or not, hang
    when FUSED with the digit-extraction graph — yet every standalone
    sort up to 8 payloads compiles in ~1 min, and a program of 32
    independent 2-operand sorts compiles AND runs at 13 GB/s effective.
    Conclusion: keep producers out of sort programs and use the sort
    itself as the data mover with unique integer keys. The phased
    device path dispatches _prep/_perm/_move as separate programs; this
    fused form keeps identical semantics for the XLA fallback and
    shard_map paths."""
    n_s = d.shape[0]
    R, C = _grid_shape(n_s)
    pad = R * C - n_s
    absd, ysel = _prep_tail(d, yT, ynegT, finf)
    sorted_d, rank = _perm_tail(absd)
    st = _move_tail(rank, xT, ysel, pad)
    if pad:
        sorted_d = jnp.concatenate([jnp.zeros((pad,), jnp.int32), sorted_d])
    return sorted_d, st


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _p3_sortpack(field_p: int, c: int, W: int, ulimbs, xT, yT, ynegT, finf):
    jf = JField._instances[field_p]
    n = ulimbs.shape[0]
    d = offset_digits_device(ulimbs, c, W).reshape(W * n)
    return _sortpack_tail(jf, d, xT, yT, ynegT, finf)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _p3_sortpack_m(scalar_p: int, base_p: int, c: int, W: int, marr,
                   xT, yT, ynegT, finf):
    """Montgomery-scalar variant (scalars never touch the host)."""
    sf = JField._instances[scalar_p]
    jf = JField._instances[base_p]
    n = marr.shape[0]
    s16 = sf.from_mont(marr)
    u = add_offset_device(s16, c, W)
    d = offset_digits_device(u, c, W).reshape(W * n)
    return _sortpack_tail(jf, d, xT, yT, ynegT, finf)


@functools.lru_cache(maxsize=None)
def _p3_accum(field_key, R: int, C: int, mode: str):
    """jitted: (sorted_d, st) -> (flush, colend, flag-scalar)."""
    c_blk = min(C_BLK, C)
    n_blocks = C // c_blk
    c128 = c_blk // 128
    n_slabs = R // SLAB
    call = _accum_call(field_key, R, c_blk, n_blocks, True, mode)

    @jax.jit
    def run(sorted_d, st):
        pts = st.reshape(
            2, NUM_LIMBS, n_blocks, c128, 128, n_slabs, SLAB
        ).transpose(2, 5, 6, 0, 1, 3, 4)
        digs = sorted_d.reshape(
            n_blocks, c128, 128, n_slabs, SLAB
        ).transpose(0, 3, 4, 1, 2)
        flush, colend, flag = call(pts, digs)
        return flush, colend, jnp.max(flag)

    return run


@functools.lru_cache(maxsize=None)
def _p3_finish(field_p: int, c: int, R: int, C: int, mode: str):
    """jitted: (sorted_d, flush, colend) -> standard-form XYZZ rows."""
    jf = JField._instances[field_p]
    nb = 1 << (c - 1)
    c_blk = min(C_BLK, C)

    @jax.jit
    def run(sorted_d, flush, colend):
        d_cm = sorted_d.reshape(C, R).T
        totals = _bucket_totals(
            jf, sorted_d, flush, colend, d_cm, R, C, c_blk, nb, True, mode
        )
        s = _bucket_reduce(jf, totals)
        return {k: jf.from_mont(v.T)[0] for k, v in s.items()}

    return run


def _msm3_phased_dispatch(jf: JField, sorted_d, st, c: int, n_s: int):
    """Dispatch accumulate+finish WITHOUT blocking; returns a pending
    handle for _msm3_phased_collect. Splitting dispatch from collection
    lets callers pipeline independent MSMs (batch_commit, bench): the
    next MSM's programs queue behind this one's, hiding the tunnel's
    ~25 ms per-result round trip behind device execution."""
    from nova_tpu.ops.aot import aot_call

    R, C = _grid_shape(n_s)
    assert R * C == sorted_d.shape[0], (R, C, sorted_d.shape)
    fkey = _field_key(jf)
    flush, colend, flag = aot_call(
        _p3_accum(fkey, R, C, "fast"),
        (sorted_d, st),
        static_key=(fkey[0], R, C, "fast"),
        label="p3_accum",
    )
    out = aot_call(
        _p3_finish(jf.spec.p, c, R, C, "fast"),
        (sorted_d, flush, colend),
        static_key=(jf.spec.p, c, R, C, "fast"),
        label="p3_finish",
    )
    return (jf, sorted_d, st, c, R, C, fkey, out, flag)


def _msm3_phased_collect(pending):
    """Block on a _msm3_phased_dispatch handle; runs the complete-formula
    retry when a degenerate fast-add was flagged (the sort phase is
    reused across the retry)."""
    jf, sorted_d, st, c, R, C, fkey, out, flag = pending
    out, flag = jax.device_get((out, flag))
    if int(flag):
        flush, colend, _ = _p3_accum(fkey, R, C, "complete")(sorted_d, st)
        out = jax.device_get(
            _p3_finish(jf.spec.p, c, R, C, "complete")(
                sorted_d, flush, colend
            )
        )
    return out


def _msm3_phased(jf: JField, sorted_d, st, c: int, n_s: int):
    return _msm3_phased_collect(
        _msm3_phased_dispatch(jf, sorted_d, st, c, n_s)
    )


def _msm3_core(jf: JField, d, xT, yT, ynegT, finf, c: int, mode: str):
    """Shared program body. d: (n_s,) int32 signed digits over the joint
    window space; xT/yT/ynegT: (NL, n_s) Montgomery limb rows (transposed
    so each limb is a sort operand); finf: (n_s,). Returns ((16, 1) XYZZ
    sum in standard form, flag).

    Sort/gather strategy shared with _sortpack_tail (round-5 rewrite:
    2-operand sort + leading-axis row gather; the 33-operand variadic
    sort hung the tunnel's compile worker at bench sizes)."""
    n_s = d.shape[0]
    nb = 1 << (c - 1)
    R, C = _grid_shape(n_s)

    sorted_d, st = _sortpack_tail(jf, d, xT, yT, ynegT, finf)

    d_cm = sorted_d.reshape(C, R).T  # (R, C) grid rows

    use_pal = _use_pallas()
    if use_pal:
        c_blk = min(C_BLK, C)
        n_blocks = C // c_blk
        c128 = c_blk // 128
        n_slabs = R // SLAB
        call = _accum_call(
            _field_key(jf), R, c_blk, n_blocks, True, mode
        )
        pts = st.reshape(
            2, NUM_LIMBS, n_blocks, c128, 128, n_slabs, SLAB
        ).transpose(2, 5, 6, 0, 1, 3, 4)
        digs = sorted_d.reshape(
            n_blocks, c128, 128, n_slabs, SLAB
        ).transpose(0, 3, 4, 1, 2)
        flush, colend, flag = call(pts, digs)
        flagv = jnp.max(flag)
    else:
        c_blk = C
        stc = st.reshape(2, NUM_LIMBS, C, R)
        px_cm = stc[0].transpose(2, 1, 0)
        py_cm = stc[1].transpose(2, 1, 0)
        flush, colend, flagv = _accum_xla(
            jf, d_cm, px_cm, py_cm, "complete"
        )

    # the d=0 prefix means sorted_d (with pad) is still sorted ascending
    totals = _bucket_totals(
        jf, sorted_d, flush, colend, d_cm, R, C, c_blk, nb,
        use_pal, mode,
    )
    if use_pal:
        s = _bucket_reduce(jf, totals)
    else:
        s = _weighted_reduce_xla(jf, totals)
    return s, flagv


def _off_limbs16(c: int, W: int = None) -> np.ndarray:
    if W is None:
        W = _num_windows(c)
    off = _offset_int(c, W)
    nbytes = (c * W + 15) // 16 * 2
    return np.frombuffer(
        off.to_bytes(nbytes, "little"), dtype="<u2"
    ).astype(np.uint32)


def add_offset_device(s16, c: int, W: int = None):
    """(n, 16) standard-form 16-bit limbs -> (n, L) limbs of
    s + _offset_int(c, W), carries resolved by Kogge-Stone
    generate/propagate rounds over the limb axis (log2(L) elementwise
    steps, no scan). With a small W (small-scalar MSM) the offset spans
    fewer limbs than the scalar; limbs are padded to a common width so
    digit extraction below window W stays exact."""
    n = s16.shape[0]
    offl = _off_limbs16(c, W)
    L = max(offl.shape[0], s16.shape[1])
    a = s16
    if L > s16.shape[1]:
        a = jnp.concatenate(
            [a, jnp.zeros((n, L - s16.shape[1]), jnp.uint32)], axis=1
        )
    if L > offl.shape[0]:
        offl = np.concatenate(
            [offl, np.zeros(L - offl.shape[0], np.uint32)]
        )
    s = a + jnp.asarray(offl)[None, :]
    G = (s >> 16) != 0
    P = (s & jnp.uint32(0xFFFF)) == jnp.uint32(0xFFFF)
    d = 1
    while d < L:
        Gs = jnp.pad(G, ((0, 0), (d, 0)))[:, :L]
        Ps = jnp.pad(P, ((0, 0), (d, 0)))[:, :L]
        G = G | (P & Gs)
        P = P & Ps
        d <<= 1
    cin = jnp.pad(G, ((0, 0), (1, 0)))[:, :L]
    return (s + cin.astype(jnp.uint32)) & jnp.uint32(0xFFFF)


# --- split-program pipeline ------------------------------------------------
# One sort-free producer program, then 2 + 16 dispatches of a SINGLE
# reusable (key, payload) sort executable, then one assemble program.
# Two round-5 findings drive this shape (perf/probe_sort_matrix.py,
# perf/probe_gather.py, /tmp micro-probes):
#   1. XLA:TPU compiles of multi-sort or producer-fused-sort programs
#      take 5-40+ minutes through the tunnel; a single 2-operand sort
#      compiles in ~10 s and is reused for every permutation apply.
#   2. Row gathers run at ~2.2 GB/s but sort payload movement streams
#      at ~8-16 GB/s — the sort IS the data mover (unique integer keys
#      make the unstable order deterministic).
# Payload limbs are 16-bit values; pairs pack into one u32 so the chain
# moves 16 payload columns instead of 32.


@jax.jit
def _sort_pair(k, v):
    """THE data-movement primitive: one (u32 key, u32 payload) sort."""
    return jax.lax.sort((k, v), num_keys=1, is_stable=False)


_IOTA_CACHE: dict = {}


def _iota_u32(n: int):
    if n not in _IOTA_CACHE:
        _IOTA_CACHE[n] = jnp.arange(n, dtype=jnp.uint32)
    return _IOTA_CACHE[n]


@jax.jit
def _pack_cols(xT, yT, ynegT):
    """(NL, n_s) 16-bit-limb rows -> (NL//2, n_s) u32-packed rows."""

    def pk(a):
        return a[0::2] | (a[1::2] << 16)

    return pk(xT), pk(yT), pk(ynegT)


def _fixed3_packed(db: DeviceBases2, c: int, n_pad: int, W: int = None):
    """u16-packed window-shifted base rows, cached per (key, size).

    The unpacked intermediates (db.fixed's (fx, fy) + _fixed3's
    transposed rows) are PURGED once the packed form exists: at 2^18 a
    window set is ~0.77 GB unpacked, and keeping both plus per-chunk
    copies OOMed the 16 GB chip at 2^20 (the split path only ever reads
    the packed form; a later msm2-path call just recomputes)."""
    key = ("v3p", c, n_pad, W)
    if key not in db._fixed:
        xT, yT, ynegT, finf = _fixed3(db, c, n_pad, W)
        xP, yP, ynegP = _pack_cols(xT, yT, ynegT)
        db._fixed[key] = (
            jnp.asarray(xP), jnp.asarray(yP), jnp.asarray(ynegP), finf
        )
        for purge in (
            (c, n_pad),
            ("v3", c, n_pad),
            ("v3s", c, n_pad, W),
        ):
            db._fixed.pop(purge, None)
    return db._fixed[key]


def _prep_packed_tail(d, pad, xP, yP, ynegP, finf):
    """digits -> (absd u32 (P,), 17-tuple of padded packed columns)."""
    absd = jnp.where(finf, 0, jnp.abs(d)).astype(jnp.uint32)
    dneg = d < 0
    HL = NUM_LIMBS // 2
    cols = [xP[k] for k in range(HL)] + [
        jnp.where(dneg, ynegP[k], yP[k]) for k in range(HL)
    ]
    if pad:
        zi = jnp.zeros((pad,), jnp.uint32)
        absd = jnp.concatenate([zi, absd])
        cols = [jnp.concatenate([zi, ccc]) for ccc in cols]
    return tuple([absd] + cols)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _p3_prepk(c: int, W: int, pad: int, ulimbs, negs, xP, yP, ynegP, finf):
    n = ulimbs.shape[0]
    d = offset_digits_device(ulimbs, c, W, negs).reshape(W * n)
    return _prep_packed_tail(d, pad, xP, yP, ynegP, finf)


def _sym_reduce_device(sf, s16):
    """Device symmetric-range reduction on (n, 16) 16-bit-limb standard
    scalars: returns (|s'| limbs, negs) with s' = p - s when
    s > (p-1)/2."""
    p = sf.spec.p
    L = s16.shape[1]
    half = (p - 1) >> 1
    hl = [(half >> (16 * l)) & 0xFFFF for l in range(L)]
    pl = [(p >> (16 * l)) & 0xFFFF for l in range(L)]
    gt = jnp.zeros(s16.shape[0], dtype=bool)
    eq = jnp.ones(s16.shape[0], dtype=bool)
    for l in range(L - 1, -1, -1):
        sl = s16[:, l]
        gt = gt | (eq & (sl > np.uint32(hl[l])))
        eq = eq & (sl == np.uint32(hl[l]))
    # p - s via 16-bit-limb add of p + (~s & 0xffff) + 1, Kogge-Stone
    inv = (~s16) & jnp.uint32(0xFFFF)
    prow = jnp.asarray(np.array(pl, np.uint32))[None, :]
    t = prow + inv
    t = t.at[:, 0].add(1) if hasattr(t, "at") else t
    G = (t >> 16) != 0
    P_ = (t & jnp.uint32(0xFFFF)) == jnp.uint32(0xFFFF)
    dd = 1
    while dd < L:
        Gs = jnp.pad(G, ((0, 0), (dd, 0)))[:, :L]
        Ps = jnp.pad(P_, ((0, 0), (dd, 0)))[:, :L]
        G = G | (P_ & Gs)
        P_ = P_ & Ps
        dd <<= 1
    cin = jnp.pad(G, ((0, 0), (1, 0)))[:, :L]
    psub = (t + cin.astype(jnp.uint32)) & jnp.uint32(0xFFFF)
    sabs = jnp.where(gt[:, None], psub, s16)
    return sabs, gt


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _p3_prepk_m(scalar_p: int, c: int, W: int, pad: int, marr,
                xP, yP, ynegP, finf):
    sf = JField._instances[scalar_p]
    n = marr.shape[0]
    s16 = sf.from_mont(marr)
    sabs, negs = _sym_reduce_device(sf, s16)
    u = add_offset_device(sabs, c, W)
    d = offset_digits_device(u, c, W, negs).reshape(W * n)
    return _prep_packed_tail(d, pad, xP, yP, ynegP, finf)


@jax.jit
def _p3_assemble(sd, *moved):
    """(sorted absd u32, 16 sorted packed cols) -> (sorted_d i32,
    st (2*NL, P) unpacked u32) in the layout the accum kernel packs."""
    mask = jnp.uint32(0xFFFF)
    rows = []
    for l in range(NUM_LIMBS):
        rows.append((moved[l // 2] >> (16 * (l & 1))) & mask)
    for l in range(NUM_LIMBS):
        rows.append((moved[8 + l // 2] >> (16 * (l & 1))) & mask)
    return sd.astype(jnp.int32), jnp.stack(rows)


def _sortpack_split(c: int, W: int, n_pad: int, scal, negs,
                    xP, yP, ynegP, finf, mont_p: int = None):
    """Device sortpack: prep program + (2 + 16) _sort_pair dispatches +
    assemble program, all AOT-cached. scal: (n_pad, L) host ulimbs of
    |s'|+offset (mont_p None; negs = (n_pad,) bool) or (n_pad, 16)
    Montgomery device array (mont_p set; negs ignored)."""
    from nova_tpu.ops.aot import aot_call

    n_s = W * n_pad
    R, C = _grid_shape(n_s)
    P = R * C
    pad = P - n_s
    if mont_p is None:
        outs = aot_call(
            _p3_prepk,
            (c, W, pad, jnp.asarray(scal), jnp.asarray(negs),
             xP, yP, ynegP, finf),
            static_key=(c, W, pad),
            label="p3_prepk",
        )
    else:
        outs = aot_call(
            _p3_prepk_m,
            (mont_p, c, W, pad, scal, xP, yP, ynegP, finf),
            static_key=(mont_p, c, W, pad),
            label="p3_prepk_m",
        )
    absd, cols = outs[0], outs[1:]
    iota = _iota_u32(P)

    def sp(k, v):
        return aot_call(
            _sort_pair, (k, v), static_key=(P,), label="sort_pair"
        )

    sd, sidx = sp(absd, iota)
    _, rank = sp(sidx, iota)
    moved = [sp(rank, ccc)[1] for ccc in cols]
    sorted_d, st = aot_call(
        _p3_assemble, tuple([sd] + moved), static_key=(P,),
        label="p3_assemble",
    )
    return sorted_d, st


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _msm3_program_m(scalar_p: int, base_p: int, c: int, W: int, mode: str,
                    marr, xT, yT, ynegT, finf):
    """MSM with device-resident Montgomery scalars: the scalar vector
    never touches the host (kills the pack/unpack tax on commit paths).
    Scalars reduce in the curve's SCALAR field; point limbs in the BASE
    field."""
    sf = JField._instances[scalar_p]
    jf = JField._instances[base_p]
    n = marr.shape[0]
    s16 = sf.from_mont(marr)
    sabs, negs = _sym_reduce_device(sf, s16)
    u = add_offset_device(sabs, c, W)
    d = offset_digits_device(u, c, W, negs).reshape(W * n)
    s, flag = _msm3_core(jf, d, xT, yT, ynegT, finf, c, mode)
    return {k: jf.from_mont(v.T)[0] for k, v in s.items()}, flag


_CHUNK_MAX = 1 << 18  # per-dispatch point cap: the (2*NL, W*n) sorted
# table at 2^20 lands an 8 GB padded HLO temp (4x tile expansion on the
# 32-minor layout) and OOMs the 16 GB chip; chunks of 2^18 keep every
# temp under ~2 GB and cost only chunk-count extra point adds


def _db_slice(db: DeviceBases2, a: int, b: int) -> DeviceBases2:
    """Zero-copy sub-range view of a marshalled base set (own _fixed
    precompute cache, shared device arrays)."""
    cache = getattr(db, "_slices", None)
    if cache is None:
        cache = db._slices = {}
    key = (a, b)
    if key not in cache:
        v = DeviceBases2.__new__(DeviceBases2)
        v.curve = db.curve
        v.jf = db.jf
        v.x = db.x[a:b]
        v.y = db.y[a:b]
        v.inf = db.inf[a:b]
        v.n = b - a
        v._fixed = {}
        cache[key] = v
    return cache[key]


def msm_device3_mont(marr, device_bases: DeviceBases2, window: int = 16,
                     max_bits: int = None):
    """Fixed-base MSM over a (n, 16) uint32 Montgomery-form device array
    of scalars in the curve's scalar field (e.g. an FVec's .m).

    `max_bits` is the caller's bound on scalar bit width (the reference's
    msm_small contract, src/provider/msm.rs:469-530): only enough windows
    to cover it are decomposed/accumulated, so a 16-bit commit pays 2
    windows instead of 17. Scalars above the bound give WRONG results —
    the bound is the caller's promise, exactly as in the reference."""
    n = int(marr.shape[0])
    curve = device_bases.curve
    if n > _CHUNK_MAX:
        from nova_tpu.curves.spec import AffinePoint

        acc = AffinePoint.identity(curve)
        for a in range(0, n, _CHUNK_MAX):
            b = min(a + _CHUNK_MAX, n)
            acc = acc.add(
                msm_device3_mont(
                    marr[a:b], _db_slice(device_bases, a, b),
                    window=window, max_bits=max_bits,
                )
            )
        return acc
    if not _use_pallas():
        # CPU fallback: wide windows explode the 2^(c-1)-bucket lookup
        # tables the XLA path compiles; tests only need correctness
        window = min(window, 9)
    W = _windows_for(window, curve.scalar.p, max_bits)
    n_pad = max(512, _next_pow2(n))
    if n_pad != n:
        marr = jnp.concatenate(
            [marr, jnp.zeros((n_pad - n, NUM_LIMBS), jnp.uint32)]
        )
    sf = JField(curve.scalar)
    bf = JField(curve.base)
    if _use_pallas():
        xP, yP, ynegP, finf = _fixed3_packed(
            device_bases, window, n_pad, W
        )
        sorted_d, st = _sortpack_split(
            window, W, n_pad, marr, None, xP, yP, ynegP, finf,
            mont_p=sf.spec.p,
        )
        out = _msm3_phased(bf, sorted_d, st, window, W * n_pad)
        return _xyzz_row_to_affine(curve, out)
    xT, yT, ynegT, finf = _fixed3(device_bases, window, n_pad, W)
    out, flag = jax.device_get(
        _msm3_program_m(
            sf.spec.p, bf.spec.p, window, W, "fast",
            marr, xT, yT, ynegT, finf,
        )
    )
    if int(flag):
        out, _ = jax.device_get(
            _msm3_program_m(
                sf.spec.p, bf.spec.p, window, W, "complete",
                marr, xT, yT, ynegT, finf,
            )
        )
    return _xyzz_row_to_affine(curve, out)


def msm_device3_mont_batch(marrs, device_bases: DeviceBases2,
                           window: int = 16, max_bits: int = None):
    """Pipelined batch of fixed-base MSMs over one key (the
    CommitmentEngine.batch_commit pattern: Spark oracle commits issue
    many independent vectors at once). Every MSM's programs are
    dispatched before the first result is collected, so the tunnel's
    ~25 ms per-result round trip overlaps device execution — measured
    ~1.5x the sequential-call throughput at 2^16. Falls back to
    sequential calls off the Pallas path or above the chunk cap."""
    n_list = [int(m.shape[0]) for m in marrs]
    if not _use_pallas() or any(n > _CHUNK_MAX for n in n_list):
        return [
            msm_device3_mont(m, device_bases, window=window,
                             max_bits=max_bits)
            for m in marrs
        ]
    curve = device_bases.curve
    sf = JField(curve.scalar)
    bf = JField(curve.base)
    W = _windows_for(window, curve.scalar.p, max_bits)
    pend = []
    for marr in marrs:
        n = int(marr.shape[0])
        n_pad = max(512, _next_pow2(n))
        if n_pad != n:
            marr = jnp.concatenate(
                [marr, jnp.zeros((n_pad - n, NUM_LIMBS), jnp.uint32)]
            )
        xP, yP, ynegP, finf = _fixed3_packed(
            device_bases, window, n_pad, W
        )
        sorted_d, st = _sortpack_split(
            window, W, n_pad, marr, None, xP, yP, ynegP, finf,
            mont_p=sf.spec.p,
        )
        pend.append(
            _msm3_phased_dispatch(bf, sorted_d, st, window, W * n_pad)
        )
    return [
        _xyzz_row_to_affine(curve, _msm3_phased_collect(p)) for p in pend
    ]


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _msm3_program(field_p: int, c: int, W: int, ulimbs, negs,
                  xT, yT, ynegT, finf):
    jf = JField._instances[field_p]
    n = ulimbs.shape[0]
    d = offset_digits_device(ulimbs, c, W, negs).reshape(W * n)
    s, flag = _msm3_core(jf, d, xT, yT, ynegT, finf, c, "fast")
    return {k: jf.from_mont(v.T)[0] for k, v in s.items()}, flag


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _msm3_program_complete(field_p: int, c: int, W: int,
                           ulimbs, negs, xT, yT, ynegT, finf):
    jf = JField._instances[field_p]
    n = ulimbs.shape[0]
    d = offset_digits_device(ulimbs, c, W, negs).reshape(W * n)
    s, _ = _msm3_core(jf, d, xT, yT, ynegT, finf, c, "complete")
    return {k: jf.from_mont(v.T)[0] for k, v in s.items()}


# ---------------------------------------------------------------------------
# host-facing API
# ---------------------------------------------------------------------------


def _fixed3_host(db: DeviceBases2, c: int, n_pad: int):
    """Host-side shifted-base construction for non-TPU backends (the XLA
    compile of the device precompute is prohibitive on CPU; test sizes
    are small)."""
    from nova_tpu.curves.spec import AffinePoint

    jf = db.jf
    curve = db.curve
    xs = jf.unpack(jf.from_mont(db.x))
    ys = jf.unpack(jf.from_mont(db.y))
    infs = np.asarray(db.inf)
    pts = []
    for i in range(db.n):
        if infs[i]:
            pts.append(AffinePoint.identity(curve))
        else:
            pts.append(AffinePoint(curve, xs[i], ys[i]))
    ident = AffinePoint.identity(curve)
    pts = (pts + [ident] * n_pad)[:n_pad]
    W = (255 + c - 1) // c + 1
    from nova_tpu import native as _native

    rows_x, rows_y, rows_inf = [], [], []
    cur = pts
    for w in range(W):
        rows_x.extend(p.x if not p.infinity else 0 for p in cur)
        rows_y.extend(p.y if not p.infinity else 0 for p in cur)
        rows_inf.extend(p.infinity for p in cur)
        if w + 1 < W:
            if _native.available():
                cur = _native.ec_scale(cur, 1 << c)
            else:
                cur = [p.mul(1 << c) for p in cur]
    to_mont = jf.jit("to_mont")
    fx = jnp.asarray(to_mont(jnp.asarray(jf.pack(rows_x))))
    fy = jnp.asarray(to_mont(jnp.asarray(jf.pack(rows_y))))
    finf = jnp.asarray(np.array(rows_inf, dtype=bool))
    return fx, fy, finf


def _fixed3(db: DeviceBases2, c: int, n_pad: int, W: int = None):
    """(xT, yT, ynegT, finf): (NL, W*n_pad) transposed limb rows of the
    window-shifted bases (each limb is a variadic-sort operand); cached
    on the DeviceBases2 (once per key/size). A reduced W (small-scalar
    MSM) is served as a view of the full precompute's first W window
    blocks — windows are laid out contiguously, block w at columns
    [w*n_pad, (w+1)*n_pad)."""
    W_full = _num_windows(c)
    if W is not None and W < W_full:
        xT, yT, ynegT, finf = _fixed3(db, c, n_pad)
        k = W * n_pad
        skey = ("v3s", c, n_pad, W)
        if skey not in db._fixed:
            db._fixed[skey] = (
                xT[:, :k], yT[:, :k], ynegT[:, :k], finf[:k]
            )
        return db._fixed[skey]
    key = ("v3", c, n_pad)
    if key not in db._fixed:
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            on_tpu = False
        if on_tpu:
            # the device precompute compiles fine on the axon tunnel even
            # when the fused pallas MSM program is disabled
            fx, fy, finf = db.fixed(c, n_pad)
        else:
            fx, fy, finf = _fixed3_host(db, c, n_pad)

        @jax.jit
        def build(fx, fy):
            fyneg = _negate_y(db.jf, fy)
            return fx.T, fy.T, fyneg.T

        xT, yT, ynegT = build(fx, fy)
        db._fixed[key] = (
            jnp.asarray(xT), jnp.asarray(yT), jnp.asarray(ynegT), finf
        )
    return db._fixed[key]


def msm_device3(
    scalars: Sequence[int],
    bases=None,
    device_bases: Optional[DeviceBases2] = None,
    window: int = 16,
    max_bits: int = None,
):
    """Fixed-base MSM through the column-serial engine. Bases are
    marshalled/precomputed once per (key, size) via DeviceBases2.
    `max_bits` bounds the scalar bit width (msm_small contract,
    src/provider/msm.rs:469-530): fewer windows are decomposed, so
    small-scalar commits skip most of the pair space."""
    n = len(scalars)
    if n == 0:
        raise ValueError("empty msm")
    if device_bases is None:
        device_bases = DeviceBases2(bases[0].curve, bases)
    curve = device_bases.curve
    jf = JField(curve.base)
    if n > _CHUNK_MAX:
        from nova_tpu.curves.spec import AffinePoint

        acc = AffinePoint.identity(curve)
        for a in range(0, n, _CHUNK_MAX):
            b = min(a + _CHUNK_MAX, n)
            acc = acc.add(
                msm_device3(
                    scalars[a:b],
                    device_bases=_db_slice(device_bases, a, b),
                    window=window, max_bits=max_bits,
                )
            )
        return acc
    if not _use_pallas():
        window = min(window, 9)
    W = _windows_for(window, curve.scalar.p, max_bits)

    n_pad = max(512, _next_pow2(n))
    if max_bits is None:
        # symmetric-range: |s'| <= (p-1)/2, point negated via digit sign
        sabs, negs_n = _sym_reduce_host(scalars, curve.scalar.p)
    else:
        sabs, negs_n = list(scalars), np.zeros(len(scalars), dtype=bool)
    negs = np.zeros(n_pad, dtype=bool)
    negs[: len(scalars)] = negs_n
    ulimbs = _scalar_ulimbs(sabs, n_pad, window, W)
    if _use_pallas():
        xP, yP, ynegP, finf = _fixed3_packed(device_bases, window, n_pad, W)
        sorted_d, st = _sortpack_split(
            window, W, n_pad, ulimbs, negs, xP, yP, ynegP, finf
        )
        out = _msm3_phased(jf, sorted_d, st, window, W * n_pad)
        return _xyzz_row_to_affine(curve, out)
    xT, yT, ynegT, finf = _fixed3(device_bases, window, n_pad, W)
    dn = jnp.asarray(negs)
    out, flag = jax.device_get(
        _msm3_program(
            jf.spec.p, window, W, jnp.asarray(ulimbs), dn, xT, yT, ynegT, finf
        )
    )
    if int(flag):
        out = jax.device_get(
            _msm3_program_complete(
                jf.spec.p, window, W, jnp.asarray(ulimbs), dn,
                xT, yT, ynegT, finf,
            )
        )
    return _xyzz_row_to_affine(curve, out)
