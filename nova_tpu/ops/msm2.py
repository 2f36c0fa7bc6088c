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


@functools.lru_cache(maxsize=None)
def _stage_call(field_key, rounds: int, n: int, chunk: int):
    """Stage pallas_call: `rounds` (<= 8) combine rounds over n lanes in
    chunks of `chunk`. Inputs: mask (8, n+PAD) uint32 (row r = round r
    active lanes) and 4 coords (16, n+PAD); outputs 4 coords (16, n). Each
    grid step reads its chunk plus the next PAD lanes. The round loop is a
    fori_loop with a dynamic shift so the (large) complete-add formula is
    instantiated exactly once per kernel."""
    assert rounds <= 8 and chunk % PAD == 0 and n % chunk == 0
    field_p, p_limbs, n0inv, r_limbs = field_key
    o = _limb_ops(p_limbs, n0inv, r_limbs)
    NL = NUM_LIMBS
    width = chunk + PAD

    def kernel(mask_ref, mask_pad_ref,
               px, px2, py, py2, pzz, pzz2, pzzz, pzzz2,
               ox, oy, ozz, ozzz):
        # coords as 2-D (16, width): lane-rolls are supported in 2-D only
        P = tuple(
            jnp.concatenate([main[...], padd[...]], axis=1)
            for main, padd in ((px, px2), (py, py2), (pzz, pzz2), (pzzz, pzzz2))
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (NL, width), 1)

        def body(r, P):
            # partner[j] = coord[:, j+s]; wrapped tail lanes forced to the
            # identity (zz = 0) so they add as no-ops
            s = jnp.left_shift(jnp.int32(1), r)
            X, Y, ZZ, ZZZ = (
                pltpu.roll(coord, width - s, axis=1) for coord in P
            )
            ZZ = jnp.where(lane < (width - s), ZZ, jnp.uint32(0))
            Q = (X, Y, ZZ, ZZZ)
            active = (
                jnp.concatenate(
                    [mask_ref[pl.ds(r, 1), :], mask_pad_ref[pl.ds(r, 1), :]],
                    axis=1,
                )
                > 0
            )[0:1]
            Pr = tuple([c[i, :] for i in range(NL)] for c in P)
            Qr = tuple([c[i, :] for i in range(NL)] for c in Q)
            S = _xyzz_add_limbs(o, Pr, Qr)
            S2 = tuple(jnp.stack(rows_) for rows_ in S)
            return tuple(
                jnp.where(active, S2i, Pi) for S2i, Pi in zip(S2, P)
            )

        P = jax.lax.fori_loop(0, rounds, body, P)

        for dst, coord in zip((ox, oy, ozz, ozzz), P):
            dst[...] = coord[:, :chunk]

    grid = n // chunk
    cpb = chunk // PAD  # chunk measured in PAD-sized blocks

    main_spec = pl.BlockSpec((NL, chunk), lambda i: (0, i), memory_space=pltpu.VMEM)
    pad_spec = pl.BlockSpec(
        (NL, PAD), lambda i: (0, (i + 1) * cpb), memory_space=pltpu.VMEM
    )
    mask_spec = pl.BlockSpec((8, chunk), lambda i: (0, i), memory_space=pltpu.VMEM)
    mask_pad_spec = pl.BlockSpec(
        (8, PAD), lambda i: (0, (i + 1) * cpb), memory_space=pltpu.VMEM
    )

    def call(mask, x, y, zz, zzz):
        out_spec = pl.BlockSpec((NL, chunk), lambda i: (0, i), memory_space=pltpu.VMEM)
        out_shapes = [jax.ShapeDtypeStruct((NL, n), jnp.uint32)] * 4
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=(grid,),
            in_specs=[mask_spec, mask_pad_spec] + [main_spec, pad_spec] * 4,
            out_specs=[out_spec] * 4,
        )(mask, mask, x, x, y, y, zz, zz, zzz, zzz)

    return call


def _stage(jf: JField, rounds: int, masks, pts: dict, chunk: int) -> dict:
    """Run one combine stage. masks: (rounds, n) uint32; pts: dict of
    (16, n) coords. Returns updated pts."""
    n = pts["x"].shape[1]
    chunk = min(chunk, n)
    while chunk > PAD and n % chunk:
        chunk //= 2
    if _use_pallas() and n % chunk == 0 and chunk % PAD == 0:
        padz = jnp.zeros((NUM_LIMBS, PAD), jnp.uint32)
        m8 = jnp.zeros((8, n + PAD), jnp.uint32)
        m8 = m8.at[:rounds, :n].set(masks)
        coords = [
            jnp.concatenate([pts[k], padz], axis=1)
            for k in ("x", "y", "zz", "zzz")
        ]
        call = _stage_call(_field_key(jf), rounds, n, chunk)
        x, y, zz, zzz = call(m8, *coords)
        return {"x": x, "y": y, "zz": zz, "zzz": zzz}
    return _stage_xla(jf, rounds, masks, pts)


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


_GROUP = 512  # bucket-reduce group width (VMEM-bounded like the stage chunk)


@functools.lru_cache(maxsize=None)
def _bucket_reduce_call(field_key, nb: int, group: int):
    """Per-group weighted reduction over an XYZZ table (16, nb) viewed as
    nb/group groups of `group` lanes. For each group g outputs:
      W_g = sum_{j=0..group-1} (j+1) * T[g*group + j]   (lane g*128 of U out)
      S_g = sum_j T[g*group + j]                        (lane g*128 of S out)
    via two Hillis-Steele suffix-sum passes (S after pass 1, U after pass
    2); each pass is log2(group) fori rounds of dynamic-shift roll+add, so
    the complete-add formula instantiates twice. Lanes rolled in from
    beyond the group are forced to ZZ=0 identities."""
    field_p, p_limbs, n0inv, r_limbs = field_key
    o = _limb_ops(p_limbs, n0inv, r_limbs)
    NL = NUM_LIMBS
    logb = int(np.log2(group))

    def kernel(px, py, pzz, pzzz, sx, sy, szz, szzz, ux, uy, uzz, uzzz):
        P = tuple(ref[...] for ref in (px, py, pzz, pzzz))  # (16, group)
        lane = jax.lax.broadcasted_iota(jnp.int32, (NL, group), 1)

        def body(r, P):
            s = jnp.left_shift(jnp.int32(1), r)
            X, Y, ZZ, ZZZ = (
                pltpu.roll(coord, group - s, axis=1) for coord in P
            )
            ZZ = jnp.where(lane < (group - s), ZZ, jnp.uint32(0))
            Q = (X, Y, ZZ, ZZZ)
            Pr = tuple([c[i, :] for i in range(NL)] for c in P)
            Qr = tuple([c[i, :] for i in range(NL)] for c in Q)
            S = _xyzz_add_limbs(o, Pr, Qr)
            return tuple(jnp.stack(rows_) for rows_ in S)

        S = jax.lax.fori_loop(0, logb, body, P)
        for dst, coord in zip((sx, sy, szz, szzz), S):
            dst[...] = coord[:, :128]
        U = jax.lax.fori_loop(0, logb, body, S)
        for dst, coord in zip((ux, uy, uzz, uzzz), U):
            dst[...] = coord[:, :128]

    grid = nb // group

    def call(x, y, zz, zzz):
        in_spec = pl.BlockSpec((NL, group), lambda i: (0, i), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((NL, 128), lambda i: (0, i), memory_space=pltpu.VMEM)
        out_shapes = [jax.ShapeDtypeStruct((NL, 128 * grid), jnp.uint32)] * 8
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=(grid,),
            in_specs=[in_spec] * 4,
            out_specs=[out_spec] * 8,
        )(x, y, zz, zzz)

    return call


def _bucket_reduce_pallas(jf: JField, table: dict) -> dict:
    """Hierarchical sum_i (i+1)*T[i] over (16, nb), nb pow2 >= 128:
    with groups of m = min(nb, _GROUP) lanes and i = g*m + j,
      total = m * sum_g g*S_g + sum_g W_g,
    where the group kernel yields (S_g, W_g), sum_g g*S_g feeds back
    through the same kernel (table T'_i = S_{i+1}), and sum_g W_g uses its
    S output. Single-group tables skip the combine."""
    from nova_tpu.curves.jpoints import xyzz_add, xyzz_double

    nb = table["x"].shape[1]
    m = min(nb, _GROUP)
    call = _bucket_reduce_call(_field_key(jf), nb, m)
    outs = call(table["x"], table["y"], table["zz"], table["zzz"])
    G = nb // m
    S = {k: v.reshape(NUM_LIMBS, G, 128)[:, :, 0] for k, v in
         zip(("x", "y", "zz", "zzz"), outs[:4])}
    Wg = {k: v.reshape(NUM_LIMBS, G, 128)[:, :, 0] for k, v in
          zip(("x", "y", "zz", "zzz"), outs[4:])}
    if G == 1:
        return {k: v[:, :1] for k, v in Wg.items()}

    # pad to one group width and reuse the kernel at nb=m
    def padded(src, shift):
        out = {}
        for k in ("x", "y", "zz", "zzz"):
            z = jnp.zeros((NUM_LIMBS, m), jnp.uint32)
            out[k] = z.at[:, : G - shift].set(src[k][:, shift:])
        return out

    call1 = _bucket_reduce_call(_field_key(jf), m, m)
    # sum_g g*S_g: weighted sum of T'_i = S_{i+1}
    o1 = call1(*[padded(S, 1)[k] for k in ("x", "y", "zz", "zzz")])
    gS = {k: v[:, :1] for k, v in zip(("x", "y", "zz", "zzz"), o1[4:])}
    # sum_g W_g: the S output (plain fold) of the W table
    o2 = call1(*[padded(Wg, 0)[k] for k in ("x", "y", "zz", "zzz")])
    sW = {k: v[:, :1] for k, v in zip(("x", "y", "zz", "zzz"), o2[:4])}

    # total = m * gS + sW  (m is a power of two: log2(m) doublings)
    accT = {k: v.T for k, v in gS.items()}  # jpoints layout (1, 16)
    for _ in range(int(np.log2(m))):
        accT = xyzz_double(jf, accT)
    sWT = {k: v.T for k, v in sW.items()}
    totT = xyzz_add(jf, accT, sWT)
    return {k: v.T for k, v in totT.items()}


def _bucket_reduce(jf: JField, table: dict) -> dict:
    """sum_i (i+1)*T[i]; table coords (16, nb), nb pow2 >= 128. Returns
    (16, 1) XYZZ coords."""
    nb = table["x"].shape[1]
    assert nb & (nb - 1) == 0
    if _use_pallas():
        return _bucket_reduce_pallas(jf, table)
    from nova_tpu.curves.jpoints import xyzz_add, xyzz_double, xyzz_zero

    pT = {k: v.T for k, v in table.items()}  # (nb, 16)
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
    `size_out` via cumsum+scatter. Dropped lanes land in a trash slot.
    Caller guarantees popcount(keep) <= size_out."""
    tgt = jnp.cumsum(keep.astype(jnp.int32)) - 1
    tgt = jnp.where(keep, jnp.minimum(tgt, size_out - 1), size_out)

    def scat1(v):
        out = jnp.zeros((size_out + 1,), v.dtype)
        return out.at[tgt].set(v)[:size_out]

    ds2 = scat1(ds)
    rank2 = scat1(rank)
    pts2 = {}
    for k in ("x", "y", "zz", "zzz"):
        vT = pts[k].T  # (n, 16)
        out = jnp.zeros((size_out + 1, NUM_LIMBS), jnp.uint32)
        pts2[k] = out.at[tgt].set(vT)[:size_out].T
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
        width_out = min(n, _round_up(est, PAD))
        if merged >= need:
            width_out = min(n, _round_up(nb, PAD))
        stages.append((r, width, width_out))
        width = width_out
    return stages


def _window_sum(jf: JField, absd, px, py, chunk: int, nb: int):
    """One Pippenger window. absd: (n,) int32 in [0, 2^(c-1)]; px/py:
    (16, n) Montgomery affine coords with Y sign-adjusted; lanes with
    absd == 0 are inert. Returns (16, 1) XYZZ coords of sum_b b*bucket_b."""
    n = absd.shape[0]
    order = jnp.argsort(absd)
    ds = absd[order]
    px = px[:, order]
    py = py[:, order]

    idx = jnp.arange(n, dtype=jnp.int32)
    heads = jnp.concatenate([jnp.ones((1,), bool), ds[1:] != ds[:-1]])
    seg_start = jax.lax.cummax(jnp.where(heads, idx, 0))
    rank = idx - seg_start

    one = jnp.broadcast_to(
        jnp.asarray(jf.r_limbs, jnp.uint32)[:, None], (NUM_LIMBS, n)
    )
    nonzero = (ds != 0)[None, :]
    pts = {
        "x": px,
        "y": py,
        "zz": jnp.where(nonzero, one, 0),
        "zzz": jnp.where(nonzero, one, 0),
    }

    for rounds, w_in, w_out in _plan(n, nb):
        masks = _round_masks(ds, rank, rounds)
        pts = _stage(jf, rounds, masks, pts, chunk)
        keep = ((rank & ((1 << rounds) - 1)) == 0) & (ds != 0)
        ds, rank, pts = _compact(keep, w_out, ds, rank >> rounds, pts)

    # every surviving lane with rank == 0 is a full bucket sum; non-heads
    # get index nb which mode="drop" discards (NOT -1: negative indices
    # wrap to nb-1 before the bounds check and would clobber that bucket)
    ids = jnp.where((rank == 0) & (ds != 0), ds - 1, nb)
    table = {}
    for k in ("x", "y", "zz", "zzz"):
        vT = pts[k].T
        tab = jnp.zeros((nb, NUM_LIMBS), jnp.uint32)
        table[k] = tab.at[ids].set(vT, mode="drop").T

    return _bucket_reduce(jf, table)


def _negate_y(jf: JField, y):
    """p - y on (16, n) limbs, fixing y == 0 to stay 0."""
    p_l = np.asarray(jf.p_limbs, dtype=np.uint32)
    borrow = jnp.zeros_like(y[0])
    out = []
    for i in range(NUM_LIMBS):
        d = np.uint32(p_l[i]) - y[i] - borrow
        out.append(d & jnp.uint32(MASK32))
        borrow = (d >> 31) & jnp.uint32(1)
    res = jnp.stack(out)
    is_zero = jnp.all(y == 0, axis=0)
    return jnp.where(is_zero[None, :], y, res)


def msm_windows_device(jf: JField, signed_d, bx, by, binf, c: int, chunk: int):
    """All window sums on device. signed_d: (W, N) int32; bx/by: (16, N)
    Montgomery affine; binf: (N,) bool. Returns dict of (W, 16) XYZZ
    window sums (Montgomery form)."""
    nb = 1 << (c - 1)
    neg_by = _negate_y(jf, by)

    def one_window(d):
        absd = jnp.where(binf, 0, jnp.abs(d))
        sy = jnp.where((d < 0)[None, :], neg_by, by)
        s = _window_sum(jf, absd, bx, sy, chunk, nb)
        return {k: v[:, 0] for k, v in s.items()}

    return jax.lax.map(one_window, signed_d)


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
        self.x = jnp.asarray(to_mont(jnp.asarray(xs))).T  # (16, N)
        self.y = jnp.asarray(to_mont(jnp.asarray(ys))).T
        self.inf = jnp.asarray(np.array([p.infinity for p in points], dtype=bool))
        self.n = len(points)

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


def msm_device2(
    scalars: Sequence[int],
    bases=None,
    device_bases: Optional[DeviceBases2] = None,
    window: Optional[int] = None,
):
    """MSM with host int scalars, device compute, exact host Horner finish.
    `device_bases` reuses a marshalled commitment key."""
    from nova_tpu.curves.spec import AffinePoint

    n = len(scalars)
    if n == 0:
        raise ValueError("empty msm")
    if device_bases is None:
        device_bases = DeviceBases2(bases[0].curve, bases)
    curve = device_bases.curve
    jf = JField(curve.base)

    n_pad = max(512, _next_pow2(n))
    buf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    limbs = np.zeros((n_pad, 16), dtype=np.uint32)
    limbs[:n] = np.frombuffer(buf, dtype="<u2").reshape(n, 16).astype(np.uint32)

    bx, by, binf = device_bases.x, device_bases.y, device_bases.inf
    if device_bases.n < n_pad:
        padn = n_pad - device_bases.n
        bx = jnp.concatenate([bx, jnp.zeros((NUM_LIMBS, padn), jnp.uint32)], axis=1)
        by = jnp.concatenate([by, jnp.zeros((NUM_LIMBS, padn), jnp.uint32)], axis=1)
        binf = jnp.concatenate([binf, jnp.ones((padn,), bool)])
    elif device_bases.n > n_pad:
        bx, by, binf = bx[:, :n_pad], by[:, :n_pad], binf[:n_pad]

    if window is None:
        window = 14 if n_pad >= (1 << 14) else 10
    chunk = min(GRAIN, n_pad)

    wins = jax.device_get(
        _msm2_program(jf.spec.p, window, chunk, jnp.asarray(limbs), bx, by, binf)
    )

    # Horner across windows on exact host ints: acc = 2^c*acc + win_w
    f = curve.base
    W = wins["x"].shape[0]
    acc = AffinePoint.identity(curve)
    for w in reversed(range(W)):
        if not acc.is_identity():
            acc = acc.mul(1 << window)
        zz = _row_to_int(wins["zz"][w])
        if zz == 0:
            continue
        x = _row_to_int(wins["x"][w])
        y = _row_to_int(wins["y"][w])
        zzz = _row_to_int(wins["zzz"][w])
        pt = AffinePoint(curve, f.mul(x, f.inv(zz)), f.mul(y, f.inv(zzz)))
        acc = acc.add(pt)
    return acc
