"""TPU multi-scalar multiplication v2: fused-kernel signed-digit Pippenger.

Replaces the round-1 design (ops/msm.py) after profiling showed its cost was
dominated by per-round HBM streaming, relayouts and program-launch latency:
the Montgomery multiplier runs at ~2.2G muls/s when operands stay in VMEM
(perf/ubench_field.py) but per-round XLA orchestration ran the same math at
~0.2G. Reference algorithm: src/provider/msm.rs:225-419 (signed-digit
Pippenger with bucket tables); the TPU re-expression is sort + segmented
tree combine (SURVEY.md §7.3).

Pipeline (ONE jit program per MSM; windows via lax.map):

  1. signed c-bit digit decomposition on device, digits in
     [-2^(c-1), 2^(c-1)]; negative digits negate Y (halves the bucket
     table, mirroring msm.rs signed decomposition).
  2. per window: sort by |digit| (XLA sort), gather points, segment ranks
     via cummax.
  3. combine STAGES: each stage is one Pallas kernel running R <= 4
     Brent-Kung rounds (rank-r lane of a segment absorbs lane r + 2^k)
     with the chunk resident in VMEM. Chunk boundaries read a 256-lane
     overlap pad — expressed as a second BlockSpec input at offset
     (i+1)*chunk — so segments merge globally with no cross-chunk fixup:
     the dependency cone of <= 8 rounds is 2^8-1 <= PAD lanes.
  4. between stages, survivors (rank % 2^R == 0) compact via
     cumsum+scatter, shrinking lane count geometrically toward the bucket
     count; total adds approach the Pippenger floor of ~N per window.
  5. bucket scatter: segment heads -> dense table of 2^(c-1) XYZZ points
     (bucket b at slot b-1; digit-0/infinity lanes drop).
  6. weighted bucket reduction sum_i (i+1)*T_i in ONE Pallas kernel via
     contiguous halving: S(T) = S(lo + hi) + |hi| * sum(hi); the sum(hi)
     terms Horner-accumulate (A <- 2A + sum(hi_l)) and the final fold of
     lo+hi supplies sum(T). ~2B adds, no strided access.
  7. window sums transfer to host once; Horner across windows on host ints
     (W*c doublings of a single point are latency- not throughput-bound).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nova_tpu.fields.jfield import JField
from nova_tpu.fields.spec import NUM_LIMBS

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

LB = 16
MASK32 = np.uint32(0xFFFF)
PAD = 256  # overlap pad lanes; covers the dependency cone of <= 8 rounds
GRAIN = 512  # chunk granularity (lanes per kernel block; VMEM-bounded)
MAX_STAGE_ROUNDS = 4  # unrolled adds per stage kernel (compile-size bound)


def _use_pallas() -> bool:
    if not _PALLAS_OK:
        return False
    import os

    if os.environ.get("NOVA_MSM_NO_PALLAS"):
        # escape hatch: the fully-fused pallas MSM program at wide windows
        # is large enough (~50 MB StableHLO at 2^16/c=16) that the axon
        # tunnel's compile worker has died on it; the XLA path (~6 MB)
        # compiles reliably
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _field_key(jf: JField):
    return (
        jf.spec.p,
        tuple(int(x) for x in jf.p_limbs),
        int(jf.n0inv),
        tuple(int(x) for x in jf.r_limbs),
    )


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# limb helpers shared by the fused kernels (lists of (width,) uint32 rows)
# ---------------------------------------------------------------------------


def _limb_ops(p_limbs, n0inv, r_limbs):
    p_consts = [np.uint32(x) for x in p_limbs]
    one_consts = [np.uint32(x) for x in r_limbs]
    n0 = np.uint32(n0inv)
    NL = NUM_LIMBS

    def cond_sub(limbs, overflow=None):
        borrow = jnp.zeros_like(limbs[0])
        diff = []
        for i in range(NL):
            d = limbs[i] - p_consts[i] - borrow
            diff.append(d & MASK32)
            borrow = (d >> 31) & np.uint32(1)
        need = borrow == 0
        if overflow is not None:
            need = need | (overflow > 0)
        return [jnp.where(need, d, l) for d, l in zip(diff, limbs)]

    def kmul(A, B):
        zero = jnp.zeros_like(A[0])
        cols = [zero] * (2 * NL + 1)
        for i in range(NL):
            for j in range(NL):
                t = A[i] * B[j]
                cols[i + j] = cols[i + j] + (t & MASK32)
                cols[i + j + 1] = cols[i + j + 1] + (t >> LB)
        carry = zero
        for i in range(NL):
            t = cols[i] + carry
            m = (t * n0) & MASK32
            pm0 = m * p_consts[0]
            tmp = t + (pm0 & MASK32)
            carry = (tmp >> LB) + (pm0 >> LB)
            for j in range(1, NL):
                pj = m * p_consts[j]
                cols[i + j] = cols[i + j] + (pj & MASK32)
                cols[i + j + 1] = cols[i + j + 1] + (pj >> LB)
        limbs = []
        c = carry
        for k in range(NL, 2 * NL):
            v = cols[k] + c
            limbs.append(v & MASK32)
            c = v >> LB
        return cond_sub(limbs, c)

    def kadd(A, B):
        limbs = []
        carry = jnp.zeros_like(A[0])
        for i in range(NL):
            v = A[i] + B[i] + carry
            limbs.append(v & MASK32)
            carry = v >> LB
        return cond_sub(limbs, carry)

    def ksub(A, B):
        borrow = jnp.zeros_like(A[0])
        diff = []
        for i in range(NL):
            d = A[i] - B[i] - borrow
            diff.append(d & MASK32)
            borrow = (d >> 31) & np.uint32(1)
        carry = jnp.zeros_like(borrow)
        out = []
        for i in range(NL):
            v = diff[i] + jnp.where(borrow > 0, p_consts[i], np.uint32(0)) + carry
            out.append(v & MASK32)
            carry = v >> LB
        return out

    def kdbl(A):
        return kadd(A, A)

    def kis_zero(A):
        acc = A[0]
        for i in range(1, NL):
            acc = acc | A[i]
        return acc == 0

    def ksel(cond, A, B):
        return [jnp.where(cond, a, b) for a, b in zip(A, B)]

    def kzero(like):
        z = jnp.zeros_like(like)
        return [z] * NL

    def kone(like):
        z = jnp.zeros_like(like)
        return [z + c for c in one_consts]

    class Ops:
        pass

    o = Ops()
    o.mul, o.add, o.sub, o.dbl = kmul, kadd, ksub, kdbl
    o.is_zero, o.sel, o.zero, o.one = kis_zero, ksel, kzero, kone
    return o


def _xyzz_add_limbs(o, P, Q):
    """Complete XYZZ+XYZZ on limb-list coords (mirrors jpoints.xyzz_add,
    reference msm.rs:91-123). P, Q: tuples (X, Y, ZZ, ZZZ) of limb lists."""
    X1, Y1, ZZ1, ZZZ1 = P
    X2, Y2, ZZ2, ZZZ2 = Q
    u_dbl = o.dbl(Y1)
    u1 = o.mul(X1, ZZ2)
    u2 = o.mul(X2, ZZ1)
    s1 = o.mul(Y1, ZZZ2)
    s2 = o.mul(Y2, ZZZ1)
    v_dbl = o.mul(u_dbl, u_dbl)
    xsq = o.mul(X1, X1)
    pd = o.sub(u2, u1)
    r = o.sub(s2, s1)
    m_dbl = o.add(o.dbl(xsq), xsq)

    pp = o.mul(pd, pd)
    rr = o.mul(r, r)
    zzp = o.mul(ZZ1, ZZ2)
    zzzp = o.mul(ZZZ1, ZZZ2)
    w_dbl = o.mul(u_dbl, v_dbl)
    s_dbl = o.mul(X1, v_dbl)
    mm_dbl = o.mul(m_dbl, m_dbl)
    x3_dbl = o.sub(mm_dbl, o.dbl(s_dbl))

    ppp = o.mul(pd, pp)
    qq = o.mul(u1, pp)
    zz3 = o.mul(zzp, pp)
    zz3_dbl = o.mul(ZZ1, v_dbl)
    zzz3_dbl = o.mul(ZZZ1, w_dbl)
    wy_dbl = o.mul(w_dbl, Y1)
    x3 = o.sub(o.sub(rr, ppp), o.dbl(qq))

    t1 = o.mul(r, o.sub(qq, x3))
    t2 = o.mul(s1, ppp)
    zzz3 = o.mul(zzzp, ppp)
    ms_dbl = o.mul(m_dbl, o.sub(s_dbl, x3_dbl))
    y3 = o.sub(t1, t2)
    y3_dbl = o.sub(ms_dbl, wy_dbl)

    p_zero = o.is_zero(ZZ1)
    q_zero = o.is_zero(ZZ2)
    eq_u = o.is_zero(pd)
    eq_s = o.is_zero(r)
    zero_like = jnp.zeros_like(X1[0])
    KONE = o.one(zero_like)
    KZERO = o.zero(zero_like)

    dblx = o.sel(~p_zero, x3_dbl, X1)
    dbly = o.sel(~p_zero, y3_dbl, Y1)
    dblzz = o.sel(~p_zero, zz3_dbl, ZZ1)
    dblzzz = o.sel(~p_zero, zzz3_dbl, ZZZ1)

    def pick(res_n, res_d, res_z, pc, qc):
        out = o.sel(eq_u & eq_s, res_d, res_n)
        out = o.sel(eq_u & ~eq_s, res_z, out)
        out = o.sel(p_zero, qc, out)
        out = o.sel(q_zero & ~p_zero, pc, out)
        return out

    ox = pick(x3, dblx, KONE, X1, X2)
    oy = pick(y3, dbly, KONE, Y1, Y2)
    ozz = pick(zz3, dblzz, KZERO, ZZ1, ZZ2)
    ozzz = pick(zzz3, dblzzz, KZERO, ZZZ1, ZZZ2)
    return ox, oy, ozz, ozzz


def _xyzz_add_limbs_fast(o, P, Q):
    """XYZZ+XYZZ WITHOUT the doubling path (14 muls vs 26): returns
    (coords, bad) where bad flags lanes with u1 == u2 (P = +-Q, excluding
    identities) whose result is garbage. Callers OR the flags and rerun
    the MSM through the complete kernels when any lane was degenerate —
    never the case for honest Pippenger inputs with distinct bases, but
    correctness is preserved for all inputs via the retry."""
    X1, Y1, ZZ1, ZZZ1 = P
    X2, Y2, ZZ2, ZZZ2 = Q
    u1 = o.mul(X1, ZZ2)
    u2 = o.mul(X2, ZZ1)
    s1 = o.mul(Y1, ZZZ2)
    s2 = o.mul(Y2, ZZZ1)
    pd = o.sub(u2, u1)
    r = o.sub(s2, s1)
    pp = o.mul(pd, pd)
    rr = o.mul(r, r)
    zzp = o.mul(ZZ1, ZZ2)
    zzzp = o.mul(ZZZ1, ZZZ2)
    ppp = o.mul(pd, pp)
    qq = o.mul(u1, pp)
    zz3 = o.mul(zzp, pp)
    x3 = o.sub(o.sub(rr, ppp), o.dbl(qq))
    t1 = o.mul(r, o.sub(qq, x3))
    t2 = o.mul(s1, ppp)
    zzz3 = o.mul(zzzp, ppp)
    y3 = o.sub(t1, t2)

    p_zero = o.is_zero(ZZ1)
    q_zero = o.is_zero(ZZ2)
    eq_u = o.is_zero(pd)

    def pick(res, pc, qc):
        out = o.sel(p_zero, qc, res)
        return o.sel(q_zero & ~p_zero, pc, out)

    ox = pick(x3, X1, X2)
    oy = pick(y3, Y1, Y2)
    ozz = pick(zz3, ZZ1, ZZ2)
    ozzz = pick(zzz3, ZZZ1, ZZZ2)
    bad = eq_u & ~p_zero & ~q_zero
    return (ox, oy, ozz, ozzz), bad


def _affine_add_limbs_fast(o, P, Q):
    """Round-0 specialization: both operands affine (ZZ = ZZZ = 1, the
    Montgomery one), 6 muls. Identity operands are encoded by the caller
    as ZZ = 0 with the pick logic below; degenerate x1 == x2 flags `bad`
    like _xyzz_add_limbs_fast."""
    X1, Y1, ZZ1, _ = P
    X2, Y2, ZZ2, _ = Q
    pd = o.sub(X2, X1)
    r = o.sub(Y2, Y1)
    pp = o.mul(pd, pd)
    rr = o.mul(r, r)
    ppp = o.mul(pd, pp)
    qq = o.mul(X1, pp)
    x3 = o.sub(o.sub(rr, ppp), o.dbl(qq))
    t1 = o.mul(r, o.sub(qq, x3))
    t2 = o.mul(Y1, ppp)
    y3 = o.sub(t1, t2)

    p_zero = o.is_zero(ZZ1)
    q_zero = o.is_zero(ZZ2)
    eq_u = o.is_zero(pd)
    one = o.one(X1[0])

    def pick(res, pc, qc):
        out = o.sel(p_zero, qc, res)
        return o.sel(q_zero & ~p_zero, pc, out)

    ox = pick(x3, X1, X2)
    oy = pick(y3, Y1, Y2)
    # result zz/zzz: pp/ppp normally; the operand's (1 or 0) when an
    # identity was involved
    ozz = pick(pp, ZZ1, ZZ2)
    ozzz = pick(ppp, ZZ1, ZZ2)
    bad = eq_u & ~p_zero & ~q_zero
    return (ox, oy, ozz, ozzz), bad


def _xyzz_double_limbs(o, P):
    """XYZZ doubling dbl-2008-s-1 (a=0) on limb lists, identity-masked."""
    X1, Y1, ZZ1, ZZZ1 = P
    u = o.dbl(Y1)
    v = o.mul(u, u)
    x_sq = o.mul(X1, X1)
    w = o.mul(u, v)
    s = o.mul(X1, v)
    zz3 = o.mul(ZZ1, v)
    m = o.add(o.dbl(x_sq), x_sq)
    mm = o.mul(m, m)
    zzz3 = o.mul(ZZZ1, w)
    x3 = o.sub(mm, o.dbl(s))
    t1 = o.mul(m, o.sub(s, x3))
    t2 = o.mul(w, Y1)
    y3 = o.sub(t1, t2)
    nz = ~o.is_zero(ZZ1)
    return (
        o.sel(nz, x3, X1),
        o.sel(nz, y3, Y1),
        o.sel(nz, zz3, ZZ1),
        o.sel(nz, zzz3, ZZZ1),
    )


# ---------------------------------------------------------------------------
# combine-stage kernel: R Brent-Kung rounds with each chunk in VMEM
# ---------------------------------------------------------------------------


def _row_shift_dyn(t, s):
    """partner[f] = row[f+s] on a limb row shaped (rows, 128) (flat index
    f = 128*sub + lane), s a TRACED int32 in [1, 128): a dynamic lane-roll
    blended with a static sublane-roll at the lane boundary — all
    layout-preserving (dynamic SUBLANE rolls do not lower, so callers keep
    traced shifts under 128). The last s flat lanes wrap garbage; callers
    mask ZZ there so wrapped partners act as identities."""
    rows = t.shape[0]
    a = pltpu.roll(t, 128 - s, axis=1)  # a[i,j] = t[i, (j+s) % 128]
    b = pltpu.roll(a, rows - 1, axis=0)  # b[i] = a[i+1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    return jnp.where(lane < (128 - s), a, b)


def _row_shift_static(t, s: int):
    """Same as _row_shift_dyn for a STATIC python-int shift (any s)."""
    rows = t.shape[0]
    q, rem = divmod(s, 128)
    a = pltpu.roll(t, (128 - rem) % 128, axis=1)
    b1 = pltpu.roll(a, (rows - q) % rows, axis=0)
    b2 = pltpu.roll(a, (rows - q - 1) % rows, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    return jnp.where(lane < (128 - rem), b1, b2)


def _row_shift_dyn_any(t, s):
    """partner[f] = row[f+s] for a TRACED s in [1, rows*128): the lane
    part is a dynamic lane-roll (lowers fine), the sublane part
    q = s // 128 — which Mosaic cannot roll dynamically — is a select
    over the `rows` static sublane-rolls (rows is small: <= 2 at the
    _GROUP=256 production width, so the select is one where)."""
    rows = t.shape[0]
    q = jax.lax.div(s, jnp.int32(128))
    rem = jax.lax.rem(s, jnp.int32(128))
    a = pltpu.roll(t, jax.lax.rem(jnp.int32(128) - rem, jnp.int32(128)), axis=1)
    bq = pltpu.roll(a, (rows - (rows - 1)) % rows, axis=0)
    bq1 = a  # roll by rows == identity
    for k in reversed(range(rows - 1)):
        bq = jnp.where(q == k, pltpu.roll(a, (rows - k) % rows, axis=0), bq)
        bq1 = jnp.where(
            q == k, pltpu.roll(a, (rows - k - 1) % rows, axis=0), bq1
        )
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    return jnp.where(lane < (128 - rem), bq, bq1)


def _flat_iota2(rows: int):
    sub = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    return sub * 128 + lane


@functools.lru_cache(maxsize=None)
def _stage_call(field_key, rounds: int, n: int, chunk: int,
                mode: str = "complete", affine_in: bool = False):
    """Stage pallas_call: `rounds` (<= 7, so all shifts stay under 128)
    combine rounds over n lanes in chunks of `chunk`.

    Layout: chunk-major packed coords (grid+1, 4, 16, chunk/128, 128) so
    each grid step is ONE contiguous DMA for its chunk plus one for the
    next chunk (the overlap pad; only PAD lanes of it are used) — sliced
    multi-dim DMAs fault the TPU runtime, and BlockSpec windows would need
    block heights divisible by 8. Masks arrive as (grid+1, 8, chunk/128,
    128). Limb rows live as (rows, 128) tiles; partner shifts are
    layout-preserving rolls (_row_shift_dyn); segment merges cross chunk
    boundaries exactly because pad lanes recompute the same rounds."""
    assert rounds <= 7 and chunk % PAD == 0 and n % chunk == 0
    field_p, p_limbs, n0inv, r_limbs = field_key
    o = _limb_ops(p_limbs, n0inv, r_limbs)
    NL = NUM_LIMBS
    width = chunk + PAD
    c128 = chunk // 128
    p128 = PAD // 128
    w128 = width // 128
    grid = n // chunk

    def kernel(coords_hbm, mask_hbm, out_hbm, flag_hbm,
               cmain, cpad, mmain, mpad, obuf, fbuf, sem):
        i = pl.program_id(0)
        cps = []
        for slot, (src_i, dst) in enumerate(
            [(i, cmain), (i + 1, cpad)]
        ):
            cp = pltpu.make_async_copy(
                coords_hbm.at[src_i], dst, sem.at[slot]
            )
            cp.start()
            cps.append(cp)
        for slot, (src_i, dst) in enumerate(
            [(i, mmain), (i + 1, mpad)], start=2
        ):
            cp = pltpu.make_async_copy(mask_hbm.at[src_i], dst, sem.at[slot])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

        ncoords = 2 if affine_in else 4

        def crow(c, l):
            return jnp.concatenate([cmain[c, l], cpad[c, l][:p128]], axis=0)

        if affine_in:
            # zz/zzz synthesized from the live bit (mask row 7): all inputs
            # are affine (zz = one) or inert (zz = 0) — saves shipping two
            # all-constant coordinate arrays through HBM
            one_c = [np.uint32(x) for x in r_limbs]
            live = jnp.concatenate([mmain[7], mpad[7][:p128]], axis=0) > 0
            Z = [
                jnp.where(live, jnp.uint32(cst), jnp.uint32(0))
                for cst in one_c
            ]
            P = (
                [crow(0, l) for l in range(NL)],
                [crow(1, l) for l in range(NL)],
                Z,
                list(Z),
            )
        else:
            P = tuple(
                [crow(c, l) for l in range(NL)] for c in range(4)
            )
        flat = _flat_iota2(w128)

        def partner(P, s_dyn):
            X, Y, ZZ, ZZZ = (
                [_row_shift_dyn(row, s_dyn) for row in coord] for coord in P
            )
            # wrapped tail lanes act as identities (zz = 0)
            tail = flat < (width - s_dyn)
            ZZ = [jnp.where(tail, row, jnp.uint32(0)) for row in ZZ]
            return (X, Y, ZZ, ZZZ)

        def active_mask(r):
            return jnp.concatenate([mmain[r], mpad[r][:p128]], axis=0) > 0

        zero2 = jnp.zeros((w128, 128), jnp.uint32)

        def body(r, carry):
            P, badacc = carry
            s_dyn = jnp.left_shift(jnp.int32(1), r)
            Q = partner(P, s_dyn)
            active = active_mask(r)
            if mode == "complete":
                S = _xyzz_add_limbs(o, P, Q)
                bad = zero2
            else:
                S, badl = _xyzz_add_limbs_fast(o, P, Q)
                bad = jnp.where(active & badl, jnp.uint32(1), zero2)
            P = tuple(o.sel(active, Si, Pi) for Si, Pi in zip(S, P))
            return P, badacc | bad

        badacc = zero2
        r0 = 0
        if mode == "fast0":
            # round 0: every lane is still an affine input (6-mul formula)
            Q = partner(P, jnp.int32(1))
            active = active_mask(0)
            S, badl = _affine_add_limbs_fast(o, P, Q)
            badacc = jnp.where(active & badl, jnp.uint32(1), zero2)
            P = tuple(o.sel(active, Si, Pi) for Si, Pi in zip(S, P))
            r0 = 1
        P, badacc = jax.lax.fori_loop(r0, rounds, body, (P, badacc))

        for c, coord in enumerate(P):
            for l in range(NL):
                obuf[c, l] = coord[l][:c128]
        fbuf[...] = jnp.max(
            badacc.astype(jnp.int32), axis=0, keepdims=True
        ).astype(jnp.uint32)  # unsigned reductions do not lower
        cp = pltpu.make_async_copy(obuf, out_hbm.at[i], sem.at[4])
        cp.start()
        cpf = pltpu.make_async_copy(fbuf, flag_hbm.at[i], sem.at[5])
        cpf.start()
        cp.wait()
        cpf.wait()

    def call(coords, mask):
        # coords: (grid+1, 2 or 4, NL, c128, 128); mask: (grid+1, 8, c128, 128)
        out_shapes = (
            jax.ShapeDtypeStruct((grid, 4, NL, c128, 128), jnp.uint32),
            jax.ShapeDtypeStruct((grid, 1, 128), jnp.uint32),
        )
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
            scratch_shapes=[
                pltpu.VMEM((2 if affine_in else 4, NL, c128, 128), jnp.uint32),
                pltpu.VMEM((2 if affine_in else 4, NL, c128, 128), jnp.uint32),
                pltpu.VMEM((8, c128, 128), jnp.uint32),
                pltpu.VMEM((8, c128, 128), jnp.uint32),
                pltpu.VMEM((4, NL, c128, 128), jnp.uint32),
                pltpu.VMEM((1, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((6,)),
            ],
        )(coords, mask)

    return call


def _stage(jf: JField, rounds: int, masks, pts: dict, chunk: int,
           mode: str = "complete", live=None):
    """Run one combine stage. masks: (rounds, n) uint32; pts: dict of
    (n, 16) coord rows. With `live` (a (n,) bool of non-inert lanes), pts
    needs only x/y: every lane is affine and zz/zzz are synthesized
    in-kernel from the live bit (the big-input stage-1 fast path).
    Returns (updated pts, degenerate-flag scalar)."""
    n = pts["x"].shape[0]
    chunk = min(chunk, n)
    while chunk > PAD and n % chunk:
        chunk //= 2
    affine_in = live is not None
    if _use_pallas() and n % chunk == 0 and chunk % PAD == 0:
        NL = NUM_LIMBS
        grid = n // chunk
        c128 = chunk // 128
        keys = ("x", "y") if affine_in else ("x", "y", "zz", "zzz")
        nc = len(keys)
        # pack to chunk-major (grid+1, nc, NL, c128, 128); the +1 chunk is
        # an all-identity pad chunk
        stacked = jnp.stack([pts[k] for k in keys]).transpose(0, 2, 1)
        stacked = jnp.concatenate(
            [stacked, jnp.zeros((nc, NL, chunk), jnp.uint32)], axis=2
        )
        coords = stacked.reshape(nc, NL, grid + 1, c128, 128).transpose(
            2, 0, 1, 3, 4
        )
        m8 = jnp.zeros((8, (grid + 1) * chunk), jnp.uint32)
        m8 = m8.at[:rounds, :n].set(masks)
        if affine_in:
            m8 = m8.at[7, :n].set(live.astype(jnp.uint32))
        m8 = m8.reshape(8, grid + 1, c128, 128).transpose(1, 0, 2, 3)
        call = _stage_call(_field_key(jf), rounds, n, chunk, mode, affine_in)
        out, flags = call(coords, m8)  # (grid, 4, NL, c128, 128)
        out = (
            out.transpose(1, 2, 0, 3, 4).reshape(4, NL, n).transpose(0, 2, 1)
        )
        return (
            {k: out[i] for i, k in enumerate(("x", "y", "zz", "zzz"))},
            jnp.max(flags),
        )
    if affine_in:
        one = jnp.broadcast_to(
            jnp.asarray(jf.r_limbs, jnp.uint32), (n, NUM_LIMBS)
        )
        zz = jnp.where(live[:, None], one, 0)
        pts = {"x": pts["x"], "y": pts["y"], "zz": zz, "zzz": zz}
    outT = _stage_xla(
        jf, rounds, masks, {k: v.T for k, v in pts.items()}
    )
    return {k: v.T for k, v in outT.items()}, jnp.uint32(0)


def _stage_xla(jf: JField, rounds: int, masks, pts: dict) -> dict:
    """Pure-XLA fallback (CPU tests): same schedule via jpoints.xyzz_add."""
    from nova_tpu.curves.jpoints import xyzz_add

    for r in range(rounds):
        s = 1 << r
        q = {
            k: jnp.concatenate(
                [v[:, s:], jnp.zeros((NUM_LIMBS, s), jnp.uint32)], axis=1
            )
            for k, v in pts.items()
        }
        active = masks[r] > 0
        pT = {k: v.T for k, v in pts.items()}
        qT = {k: v.T for k, v in q.items()}
        sT = xyzz_add(jf, pT, qT)
        pts = {k: jnp.where(active[None, :], sT[k].T, pts[k]) for k in pts}
    return pts


# ---------------------------------------------------------------------------
# weighted bucket reduction: sum_i (i+1) * T[i] in one kernel
# ---------------------------------------------------------------------------


_GROUP = 1024  # bucket-reduce group width; round-5 sweep at nb=2^15:
# 256 -> 42 ms, 1024 -> 31 ms warm (per-block overhead dominates at
# small groups; _row_shift_dyn_any handles the wider dynamic shifts)


@functools.lru_cache(maxsize=None)
def _bucket_reduce_call(field_key, nb: int, group: int):
    """Per-group weighted reduction over an XYZZ table of nb slots viewed
    as nb/group groups of `group` lanes. For each group g outputs:
      W_g = sum_{j=0..group-1} (j+1) * T[g*group + j]   (flat lane 0 of U)
      S_g = sum_j T[g*group + j]                        (flat lane 0 of S)
    via two Hillis-Steele suffix-sum passes (S after pass 1, U after pass
    2). Both passes run inside ONE fori_loop of 2*log2(group) rounds so
    the ~26-mul complete-add formula is instantiated exactly once (the
    old per-pass fori_loop + unrolled >=128-shift rounds put four copies
    in the kernel, ~7.9 MB of Mosaic payload each at group=256 — the
    dominant term of the 50 MB msm3 program the tunnel's compile worker
    could not survive). The S snapshot lands in obuf at the pass boundary
    via pl.when; any-size traced shifts go through _row_shift_dyn_any.
    Input arrives group-major (grid, 4, 16, group/128, 128) so the
    per-step window is ONE contiguous DMA; outputs (grid, 8, 16, 1, 128)
    likewise."""
    field_p, p_limbs, n0inv, r_limbs = field_key
    o = _limb_ops(p_limbs, n0inv, r_limbs)
    NL = NUM_LIMBS
    logb = int(np.log2(group))
    g128 = group // 128
    grid = nb // group

    def kernel(tab_hbm, out_hbm, buf, obuf, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(tab_hbm.at[i], buf, sem.at[0])
        cp.start()
        cp.wait()

        P = tuple([buf[c, l] for l in range(NL)] for c in range(4))
        flat = _flat_iota2(g128)

        def body(r2, P):
            @pl.when(r2 == logb)
            def _():
                for c, coord in enumerate(P):
                    for l in range(NL):
                        obuf[c, l] = coord[l][:1]

            r = jax.lax.rem(r2, jnp.int32(logb))
            s = jnp.left_shift(jnp.int32(1), r)
            X, Y, ZZ, ZZZ = (
                [_row_shift_dyn_any(row, s) for row in coord] for coord in P
            )
            tail = flat < (group - s)
            ZZ = [jnp.where(tail, row, jnp.uint32(0)) for row in ZZ]
            return _xyzz_add_limbs(o, P, (X, Y, ZZ, ZZZ))

        U = jax.lax.fori_loop(0, 2 * logb, body, P)
        for c, coord in enumerate(U):
            for l in range(NL):
                obuf[4 + c, l] = coord[l][:1]

        cpo = pltpu.make_async_copy(obuf, out_hbm.at[i], sem.at[1])
        cpo.start()
        cpo.wait()

    def call(tab):
        # tab: (grid, 4, NL, g128, 128)
        out_shape = jax.ShapeDtypeStruct((grid, 8, NL, 1, 128), jnp.uint32)
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((4, NL, g128, 128), jnp.uint32),
                pltpu.VMEM((8, NL, 1, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(tab)

    return call


def _bucket_reduce_pallas(jf: JField, table: dict) -> dict:
    """Hierarchical sum_i (i+1)*T[i] over row-major (nb, 16), nb pow2 >=
    128: with groups of m = min(nb, _GROUP) lanes and i = g*m + j,
      total = m * sum_g g*S_g + sum_g W_g,
    where the group kernel yields (S_g, W_g), sum_g g*S_g feeds back
    through the same kernel (table T'_i = S_{i+1}), and sum_g W_g uses its
    S output. Single-group tables skip the combine."""
    from nova_tpu.curves.jpoints import xyzz_add, xyzz_double

    keys = ("x", "y", "zz", "zzz")
    nb = table["x"].shape[0]
    m = min(nb, _GROUP)
    G = nb // m
    call = _bucket_reduce_call(_field_key(jf), nb, m)

    def pack(tbl, size):
        st = jnp.stack([tbl[k] for k in keys]).transpose(0, 2, 1)  # (4,NL,sz)
        return st.reshape(4, NUM_LIMBS, size // m, m // 128, 128).transpose(
            2, 0, 1, 3, 4
        )

    outs = call(pack(table, nb))  # (G, 8, NL, 1, 128)
    S = {k: outs[:, c, :, 0, 0].T for c, k in enumerate(keys)}
    Wg = {k: outs[:, 4 + c, :, 0, 0].T for c, k in enumerate(keys)}
    if G == 1:
        return {k: v[:, :1] for k, v in Wg.items()}

    # pad to one group width and reuse the kernel at nb=m (row-major)
    def padded(src, shift):
        out = {}
        for k in keys:
            z = jnp.zeros((m, NUM_LIMBS), jnp.uint32)
            out[k] = z.at[: G - shift].set(src[k].T[shift:])
        return out

    # one grid=2 call covers both combine tables (two separate calls
    # embed the Mosaic payload twice in the program — compile size):
    # row 0 = T'_i = S_{i+1} (its W output is sum_g g*S_g), row 1 = the
    # W table (its S output is the plain fold sum_g W_g)
    call1 = _bucket_reduce_call(_field_key(jf), 2 * m, m)
    o12 = call1(
        jnp.concatenate([pack(padded(S, 1), m), pack(padded(Wg, 0), m)])
    )
    gS = {k: o12[0, 4 + c, :, 0, :1] for c, k in enumerate(keys)}
    sW = {k: o12[1, c, :, 0, :1] for c, k in enumerate(keys)}

    # total = m * gS + sW  (m is a power of two: log2(m) doublings)
    accT = {k: v.T for k, v in gS.items()}  # jpoints layout (1, 16)
    for _ in range(int(np.log2(m))):
        accT = xyzz_double(jf, accT)
    sWT = {k: v.T for k, v in sW.items()}
    totT = xyzz_add(jf, accT, sWT)
    return {k: v.T for k, v in totT.items()}


def _bucket_reduce(jf: JField, table: dict) -> dict:
    """sum_i (i+1)*T[i]; table rows (nb, 16), nb pow2 >= 128. Returns
    (16, 1) XYZZ coords."""
    nb = table["x"].shape[0]
    assert nb & (nb - 1) == 0
    if _use_pallas():
        return _bucket_reduce_pallas(jf, table)
    from nova_tpu.curves.jpoints import xyzz_add, xyzz_double, xyzz_zero

    pT = table  # already (nb, 16) rows
    A = xyzz_zero(jf, jnp.zeros((1, NUM_LIMBS), jnp.uint32))
    size = nb
    while size > 1:
        half = size // 2
        L = {k: v[:half] for k, v in pT.items()}
        H = {k: v[half:size] for k, v in pT.items()}
        Hs = H
        hs = half
        while hs > 1:
            hh = hs // 2
            Hs = xyzz_add(
                jf,
                {k: v[:hh] for k, v in Hs.items()},
                {k: v[hh:hs] for k, v in Hs.items()},
            )
            hs = hh
        A = xyzz_add(jf, xyzz_double(jf, A), Hs)
        pT = xyzz_add(jf, L, H)
        size = half
    A = xyzz_add(jf, A, pT)
    return {k: v.T for k, v in A.items()}


# ---------------------------------------------------------------------------
# digit decomposition (device)
# ---------------------------------------------------------------------------


def signed_digits_device(limbs16, c: int, num_windows: int):
    """(N, 16) uint32 16-bit scalar limbs -> (W, N) int32 signed digits,
    scalar = sum_w d_w * 2^(c*w), d_w in [-2^(c-1), 2^(c-1)]."""
    n = limbs16.shape[0]
    mask = jnp.uint32((1 << c) - 1)
    uns = []
    for w in range(num_windows):
        bit_lo = w * c
        li, ofs = bit_lo // 16, bit_lo % 16
        if li >= 16:
            d = jnp.zeros((n,), jnp.uint32)
        else:
            d = limbs16[:, li] >> ofs
            have = 16 - ofs
            j = li + 1
            while have < c and j < 16:
                d = d | (limbs16[:, j] << have)
                have += 16
                j += 1
        uns.append(d & mask)
    u = jnp.stack(uns).astype(jnp.int32)  # (W, N)
    half = 1 << (c - 1)
    full = 1 << c

    def body(carry, d):
        d = d + carry
        hi = d > half  # keep +half as a positive digit (top bucket)
        d_adj = jnp.where(hi, d - full, d)
        carry = jnp.where(hi, 1, 0).astype(jnp.int32)
        return carry, d_adj

    carry0 = jnp.zeros((n,), jnp.int32)
    _, signed = jax.lax.scan(body, carry0, u)
    return signed


# ---------------------------------------------------------------------------
# full MSM orchestration
# ---------------------------------------------------------------------------


def _compact(keep, size_out: int, ds, rank, pts: dict):
    """Stable-compact lanes where keep=True into arrays of static size
    `size_out`. pts: dict of (n, 16) rows. Implemented as a stable argsort
    of the dead flag + row gathers (a cumsum+scatter version cost 1.3s at
    5M lanes; this is ~16x cheaper). Lanes past the survivor count get
    ds=0 so they stay inert."""
    n = keep.shape[0]
    src = jnp.argsort(jnp.where(keep, 0, 1).astype(jnp.uint8), stable=True)
    src = src[:size_out]
    total = jnp.sum(keep.astype(jnp.int32))
    live = jnp.arange(size_out, dtype=jnp.int32) < total
    ds2 = jnp.where(live, ds[src], 0)
    rank2 = jnp.where(live, rank[src], 0)
    pts2 = {k: pts[k][src] for k in ("x", "y", "zz", "zzz")}
    return ds2, rank2, pts2


def _round_masks(ds, rank, rounds: int):
    """(rounds, n) uint32 Brent-Kung masks: at round r, lane i absorbs
    i + 2^r when both share a nonzero digit and rank(i) % 2^(r+1) == 0."""
    n = ds.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    masks = []
    for r in range(rounds):
        s = 1 << r
        pd = jnp.concatenate([ds[s:], jnp.full((s,), -1, ds.dtype)])
        same = (pd == ds) & (ds != 0) & ((idx + s) < n)
        aligned = (rank & ((s << 1) - 1)) == 0
        masks.append((same & aligned).astype(jnp.uint32))
    return jnp.stack(masks)


def _plan(n: int, nb: int, rounds_per_stage: int = MAX_STAGE_ROUNDS):
    """Stage plan: list of (rounds, width_in, width_out), covering
    log2(n) total rounds so any load distribution merges fully. Widths are
    PAD-multiples. Survivors of a stage over width w: at most one per
    nonzero segment (#segments <= nb) plus one per 2^r lanes."""
    stages = []
    width = n
    merged = 0
    need = max(1, int(np.ceil(np.log2(max(2, n)))))
    while merged < need:
        r = min(rounds_per_stage, need - merged)
        merged += r
        est = nb + (width >> r) + 1
        # powers of two only: stage kernels are cached per (rounds, width,
        # chunk, mode), so pow2 widths are shared across MSM sizes and
        # across stages — compile time dominates iteration otherwise
        width_out = min(n, max(PAD, _next_pow2(est)))
        if merged >= need:
            width_out = min(n, max(PAD, _next_pow2(nb)))
        stages.append((r, width, width_out))
        width = width_out
    return stages


def _window_sum(jf: JField, absd, px, py, chunk: int, nb: int,
                mode: str = "complete"):
    """One Pippenger window. absd: (n,) int32 in [0, 2^(c-1)]; px/py:
    (n, 16) Montgomery affine coord rows with Y sign-adjusted; lanes with
    absd == 0 are inert. Returns ((16, 1) XYZZ coords of sum_b b*bucket_b,
    degenerate-flag)."""
    n = absd.shape[0]
    order = jnp.argsort(absd)
    ds = absd[order]
    px = px[order]
    py = py[order]

    idx = jnp.arange(n, dtype=jnp.int32)
    heads = jnp.concatenate([jnp.ones((1,), bool), ds[1:] != ds[:-1]])
    seg_start = jax.lax.cummax(jnp.where(heads, idx, 0))
    rank = idx - seg_start

    pts = {"x": px, "y": py}
    live = ds != 0

    flag = jnp.uint32(0)
    for si, (rounds, w_in, w_out) in enumerate(_plan(n, nb)):
        masks = _round_masks(ds, rank, rounds)
        smode = mode if (mode != "fast0" or si == 0) else "fast"
        pts, f = _stage(
            jf, rounds, masks, pts, chunk, smode, live=live
        )
        live = None  # affine inputs only on the first stage
        flag = flag | f
        keep = ((rank & ((1 << rounds) - 1)) == 0) & (ds != 0)
        ds, rank, pts = _compact(keep, w_out, ds, rank >> rounds, pts)

    # every surviving lane with rank == 0 is a full bucket sum; non-heads
    # get index nb which mode="drop" discards (NOT -1: negative indices
    # wrap to nb-1 before the bounds check and would clobber that bucket)
    ids = jnp.where((rank == 0) & (ds != 0), ds - 1, nb)
    table = {}
    for k in ("x", "y", "zz", "zzz"):
        tab = jnp.zeros((nb, NUM_LIMBS), jnp.uint32)
        table[k] = tab.at[ids].set(pts[k], mode="drop")

    return _bucket_reduce(jf, table), flag


def _negate_y(jf: JField, y):
    """p - y on (n, 16) rows, fixing y == 0 to stay 0."""
    p_l = np.asarray(jf.p_limbs, dtype=np.uint32)
    yT = [y[:, i] for i in range(NUM_LIMBS)]
    borrow = jnp.zeros_like(yT[0])
    out = []
    for i in range(NUM_LIMBS):
        d = np.uint32(p_l[i]) - yT[i] - borrow
        out.append(d & jnp.uint32(MASK32))
        borrow = (d >> 31) & jnp.uint32(1)
    res = jnp.stack(out, axis=-1)
    is_zero = jnp.all(y == 0, axis=1)
    return jnp.where(is_zero[:, None], y, res)


def msm_windows_device(jf: JField, signed_d, bx, by, binf, c: int, chunk: int):
    """All window sums on device. signed_d: (W, N) int32; bx/by: (N, 16)
    Montgomery affine rows; binf: (N,) bool. Returns dict of (W, 16) XYZZ
    window sums (Montgomery form)."""
    nb = 1 << (c - 1)
    neg_by = _negate_y(jf, by)

    def one_window(d):
        absd = jnp.where(binf, 0, jnp.abs(d))
        sy = jnp.where((d < 0)[:, None], neg_by, by)
        s, _ = _window_sum(jf, absd, bx, sy, chunk, nb)
        return {k: v[:, 0] for k, v in s.items()}

    return jax.lax.map(one_window, signed_d)


# ---------------------------------------------------------------------------
# fixed-base path: precomputed window-shifted bases, one joint window space
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _precompute_shifted(field_p: int, c: int, W: int, bx, by, binf):
    """Affine shifted bases for the fixed-base MSM: window w holds
    2^(c*w) * B_i for every base. Returns (W*n, 16) x/y rows (Montgomery)
    and (W*n,) inf flags. W*c doublings + a batched inversion per window, all
    on device — run once per (key, size) and cached."""
    from nova_tpu.curves.jpoints import xyzz_double

    jf = JField._instances[field_p]
    n = bx.shape[0]
    one = jnp.broadcast_to(jnp.asarray(jf.r_limbs, jnp.uint32), (n, NUM_LIMBS))
    zz0 = jnp.where(~binf[:, None], one, 0)
    pts0 = {"x": bx, "y": by, "zz": zz0, "zzz": zz0}

    def step(pts, _):
        # c doublings, then normalize a snapshot to affine with one
        # batched inversion over [zz; zzz]
        for _ in range(c):
            pts = xyzz_double(jf, pts)
        both = jnp.concatenate([pts["zz"], pts["zzz"]], axis=0)
        pad = _next_pow2(both.shape[0]) - both.shape[0]
        if pad:
            both = jnp.concatenate(
                [both, jnp.broadcast_to(one[:1], (pad, NUM_LIMBS))], axis=0
            )
        inv = jf.batch_inv_tree(both)
        x_aff = jf.mont_mul(pts["x"], inv[:n])
        y_aff = jf.mont_mul(pts["y"], inv[n : 2 * n])
        return pts, (x_aff, y_aff, jf.is_zero(pts["zz"]))

    _, (xs, ys, infs) = jax.lax.scan(step, pts0, None, length=W - 1)
    # row-major outputs: (W*n, 16) and (W*n,)
    fx = jnp.concatenate([bx, xs.reshape((W - 1) * n, NUM_LIMBS)], axis=0)
    fy = jnp.concatenate([by, ys.reshape((W - 1) * n, NUM_LIMBS)], axis=0)
    finf = jnp.concatenate([binf, infs.reshape((W - 1) * n)])
    return fx, fy, finf


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _msm2_fixed_program(field_p: int, c: int, chunk: int, limbs, fx, fy, finf):
    """Fixed-base MSM: ONE joint window space over W*n (point, digit)
    pairs — one sort, one stage cascade, one bucket reduction, no Horner.
    Amortizes every per-window overhead of the general path W-fold."""
    jf = JField._instances[field_p]
    num_windows = (255 + c - 1) // c + 1
    n = limbs.shape[0]
    signed_d = signed_digits_device(limbs, c, num_windows)  # (W, n)
    d = signed_d.reshape(num_windows * n)
    absd = jnp.where(finf, 0, jnp.abs(d))
    neg_fy = _negate_y(jf, fy)
    sy = jnp.where((d < 0)[:, None], neg_fy, fy)
    nb = 1 << (c - 1)
    s, flag = _window_sum(jf, absd, fx, sy, chunk, nb, mode="fast0")
    return {k: jf.from_mont(v.T)[0] for k, v in s.items()}, flag


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _msm2_fixed_program_complete(field_p: int, c: int, chunk: int,
                                 limbs, fx, fy, finf):
    """Retry path with complete additions (compiled only if a degenerate
    add was ever flagged; see _xyzz_add_limbs_fast)."""
    jf = JField._instances[field_p]
    num_windows = (255 + c - 1) // c + 1
    n = limbs.shape[0]
    signed_d = signed_digits_device(limbs, c, num_windows)
    d = signed_d.reshape(num_windows * n)
    absd = jnp.where(finf, 0, jnp.abs(d))
    neg_fy = _negate_y(jf, fy)
    sy = jnp.where((d < 0)[:, None], neg_fy, fy)
    nb = 1 << (c - 1)
    s, _ = _window_sum(jf, absd, fx, sy, chunk, nb, mode="complete")
    return {k: jf.from_mont(v.T)[0] for k, v in s.items()}


# ---------------------------------------------------------------------------
# host-facing API
# ---------------------------------------------------------------------------


class DeviceBases2:
    """Affine bases marshalled once: x, y (16, N) Montgomery + inf (N,)."""

    def __init__(self, curve, points):
        self.curve = curve
        jf = JField(curve.base)
        self.jf = jf
        xs = jf.pack([p.x for p in points])
        ys = jf.pack([p.y for p in points])
        to_mont = jf.jit("to_mont")
        self.x = jnp.asarray(to_mont(jnp.asarray(xs)))  # (N, 16) rows
        self.y = jnp.asarray(to_mont(jnp.asarray(ys)))
        self.inf = jnp.asarray(np.array([p.infinity for p in points], dtype=bool))
        self.n = len(points)
        self._fixed = {}  # (c, n_pad) -> (fx, fy, finf) shifted bases

    def fixed(self, c: int, n_pad: int):
        """Precomputed window-shifted bases for the fixed-base MSM path
        (cached per (window, size); ~W*c doublings on device, once)."""
        key = (c, n_pad)
        if key not in self._fixed:
            from nova_tpu.ops.aot import aot_call

            bx, by, binf = _sized(self, n_pad)
            W = (255 + c - 1) // c + 1
            self._fixed[key] = aot_call(
                _precompute_shifted,
                (self.jf.spec.p, c, W, bx, by, binf),
                static_key=(self.jf.spec.p, c, W),
                label="precompute_shifted",
            )
        return self._fixed[key]

    _cache: dict = {}

    @classmethod
    def for_key(cls, curve, points, cache_key=None):
        if cache_key is not None and cache_key in cls._cache:
            db = cls._cache[cache_key]
            if db.n >= len(points):
                return db
        db = cls(curve, points)
        if cache_key is not None:
            cls._cache[cache_key] = db
        return db


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _msm2_program(field_p: int, c: int, chunk: int, limbs, bx, by, binf):
    jf = JField._instances[field_p]
    num_windows = (255 + c - 1) // c + 1  # +1 for the signed carry
    signed_d = signed_digits_device(limbs, c, num_windows)
    wins = msm_windows_device(jf, signed_d, bx, by, binf, c, chunk)
    return {k: jf.from_mont(v) for k, v in wins.items()}


def _row_to_int(row) -> int:
    return int.from_bytes(
        np.asarray(row).astype(np.uint16).astype("<u2").tobytes(), "little"
    )


def _sized(device_bases: DeviceBases2, n_pad: int):
    """Base arrays padded/truncated to n_pad lanes (pad lanes -> inf)."""
    bx, by, binf = device_bases.x, device_bases.y, device_bases.inf
    if device_bases.n < n_pad:
        padn = n_pad - device_bases.n
        bx = jnp.concatenate([bx, jnp.zeros((padn, NUM_LIMBS), jnp.uint32)])
        by = jnp.concatenate([by, jnp.zeros((padn, NUM_LIMBS), jnp.uint32)])
        binf = jnp.concatenate([binf, jnp.ones((padn,), bool)])
    elif device_bases.n > n_pad:
        bx, by, binf = bx[:n_pad], by[:n_pad], binf[:n_pad]
    return bx, by, binf


def _scalar_limbs(scalars, n_pad: int) -> np.ndarray:
    buf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    limbs = np.zeros((n_pad, 16), dtype=np.uint32)
    limbs[: len(scalars)] = (
        np.frombuffer(buf, dtype="<u2").reshape(len(scalars), 16).astype(np.uint32)
    )
    return limbs


def _xyzz_row_to_affine(curve, wins, w=None):
    f = curve.base
    from nova_tpu.curves.spec import AffinePoint

    pick = (lambda a: a[w]) if w is not None else (lambda a: a)
    zz = _row_to_int(pick(wins["zz"]))
    if zz == 0:
        return AffinePoint.identity(curve)
    x = _row_to_int(pick(wins["x"]))
    y = _row_to_int(pick(wins["y"]))
    zzz = _row_to_int(pick(wins["zzz"]))
    return AffinePoint(curve, f.mul(x, f.inv(zz)), f.mul(y, f.inv(zzz)))


def msm_device2(
    scalars: Sequence[int],
    bases=None,
    device_bases: Optional[DeviceBases2] = None,
    window: Optional[int] = None,
    reuse: bool = None,
):
    """MSM with host int scalars, device compute, exact host finish.

    `device_bases` reuses a marshalled commitment key; when set (or
    `reuse=True`) the FIXED-BASE path runs: window-shifted bases are
    precomputed once per (key, size) so the whole MSM is a single joint
    window space (one sort/stage-cascade/bucket-reduction, no Horner).
    One-shot base sets (`bases=[...]`) use the per-window general path."""
    from nova_tpu.curves.spec import AffinePoint

    n = len(scalars)
    if n == 0:
        raise ValueError("empty msm")
    if reuse is None:
        reuse = device_bases is not None
    if device_bases is None:
        device_bases = DeviceBases2(bases[0].curve, bases)
    curve = device_bases.curve
    jf = JField(curve.base)

    n_pad = max(512, _next_pow2(n))
    limbs = _scalar_limbs(scalars, n_pad)

    if window is None:
        # wider windows cut W*N pair count; bucket-table cost stays minor
        if n_pad >= (1 << 18):
            window = 16
        elif n_pad >= (1 << 14):
            window = 14
        else:
            window = 12
    chunk = min(GRAIN, n_pad)

    if reuse:
        from nova_tpu.ops.aot import aot_call

        fx, fy, finf = device_bases.fixed(window, n_pad)
        out, flag = jax.device_get(
            aot_call(
                _msm2_fixed_program,
                (jf.spec.p, window, chunk, jnp.asarray(limbs), fx, fy, finf),
                static_key=(jf.spec.p, window, chunk),
                label="msm2_fixed",
            )
        )
        if int(flag):
            # a degenerate (P = +-Q) addition was flagged: rerun through
            # the complete-formula kernels (never taken for honest inputs
            # with distinct bases; compiled on first use)
            out = jax.device_get(
                _msm2_fixed_program_complete(
                    jf.spec.p, window, chunk, jnp.asarray(limbs), fx, fy, finf
                )
            )
        return _xyzz_row_to_affine(curve, out)

    bx, by, binf = _sized(device_bases, n_pad)
    wins = jax.device_get(
        _msm2_program(jf.spec.p, window, chunk, jnp.asarray(limbs), bx, by, binf)
    )

    # Horner across windows on exact host ints: acc = 2^c*acc + win_w
    W = wins["x"].shape[0]
    acc = AffinePoint.identity(curve)
    for w in reversed(range(W)):
        if not acc.is_identity():
            acc = acc.mul(1 << window)
        pt = _xyzz_row_to_affine(curve, wins, w)
        if not pt.is_identity():
            acc = acc.add(pt)
    return acc
