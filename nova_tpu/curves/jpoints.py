"""Vectorized (masked, branch-free) elliptic-curve point kernels.

Points in extended-Jacobian XYZZ coordinates (X, Y, ZZ, ZZZ) with
ZZ = Z^2, ZZZ = Z^3 and affine = (X/ZZ, Y/ZZZ); identity encoded as
ZZ = 0 — the same bucket representation the reference's MSM uses
(src/provider/msm.rs:27-124, formulas from
hyperelliptic.org/EFD/g1p/auto-shortw-xyzz, a = 0).

All branches of the Rust code (identity checks, doubling on equal inputs)
become masked selects so every lane executes the same instruction stream —
the TPU-native replacement for the reference's branchy bucket loops.

A point VECTOR is a dict {x, y, zz, zzz} of (..., 16) uint32 arrays in
Montgomery form.
"""

from __future__ import annotations

import jax.numpy as jnp

from nova_tpu.fields.jfield import JField


def xyzz_zero(jf: JField, shape_like) -> dict:
    """Identity: (1, 1, 0, 0) per BucketXYZZ::zero (msm.rs:47-55)."""
    one = jf.one_mont(shape_like)
    zero = jnp.zeros_like(shape_like)
    return {"x": one, "y": one, "zz": zero, "zzz": zero}


def xyzz_is_zero(jf: JField, p: dict):
    return jf.is_zero(p["zz"])


def xyzz_select(jf: JField, cond, a: dict, b: dict) -> dict:
    return {k: jf.select(cond, a[k], b[k]) for k in ("x", "y", "zz", "zzz")}


def xyzz_from_affine(jf: JField, x, y, inf) -> dict:
    """Affine (x, y, inf) -> XYZZ with ZZ = ZZZ = 1 (identity when inf)."""
    one = jf.one_mont(x)
    p = {"x": x, "y": y, "zz": one, "zzz": one}
    return xyzz_select(jf, ~inf, p, xyzz_zero(jf, x))


def _bmul(jf: JField, pairs):
    """One batched Montgomery multiply for a list of (a, b) operand pairs
    with identical shapes: stacks along a new axis so the whole group costs
    a single mont_mul instantiation in the graph (keeps scan/loop bodies
    small enough to compile)."""
    a = jnp.stack([x for x, _ in pairs])
    b = jnp.stack([y for _, y in pairs])
    out = jf.mont_mul(a, b)
    return [out[i] for i in range(len(pairs))]


def xyzz_double(jf: JField, p: dict) -> dict:
    """dbl-2008-s-1 (a=0), cost 2M+5S (msm.rs:63-88), masked for identity.
    On TPU backends the whole formula runs as one fused Pallas kernel."""
    from nova_tpu.fields.pallas_kernels import pallas_available, xyzz_double_pallas

    if pallas_available():
        return xyzz_double_pallas(jf, p)
    F = jf
    u = F.double(p["y"])
    v, x_sq = _bmul(F, [(u, u), (p["x"], p["x"])])
    w, s, zz3 = _bmul(F, [(u, v), (p["x"], v), (p["zz"], v)])
    m = F.add(F.double(x_sq), x_sq)
    mm, zzz3 = _bmul(F, [(m, m), (p["zzz"], w)])
    x3 = F.sub(mm, F.double(s))
    t1, t2 = _bmul(F, [(m, F.sub(s, x3)), (w, p["y"])])
    y3 = F.sub(t1, t2)
    out = {"x": x3, "y": y3, "zz": zz3, "zzz": zzz3}
    return xyzz_select(jf, ~xyzz_is_zero(jf, p), out, p)


def xyzz_add(jf: JField, p: dict, q: dict) -> dict:
    """Complete XYZZ + XYZZ (add-2008-s, msm.rs:91-123), masked: handles
    either operand being the identity, doubling, and inverses. The ~20
    field multiplies (including the fused doubling path) are grouped into
    4 batched mont_mul calls by dependency level."""
    from nova_tpu.fields.pallas_kernels import pallas_available, xyzz_add_pallas

    if pallas_available():
        return xyzz_add_pallas(jf, p, q)
    F = jf
    x1, y1, zz1, zzz1 = p["x"], p["y"], p["zz"], p["zzz"]
    x2, y2, zz2, zzz2 = q["x"], q["y"], q["zz"], q["zzz"]

    # level 1: cross products + doubling-path squares
    u_dbl = F.double(y1)
    u1, u2, s1, s2, v_dbl, xsq_dbl = _bmul(
        F, [(x1, zz2), (x2, zz1), (y1, zzz2), (y2, zzz1), (u_dbl, u_dbl), (x1, x1)]
    )
    pd = F.sub(u2, u1)
    r = F.sub(s2, s1)
    m_dbl = F.add(F.double(xsq_dbl), xsq_dbl)

    # level 2: squares/pair products
    pp, rr, zzp, zzzp, w_dbl, s_dbl, mm_dbl = _bmul(
        F,
        [
            (pd, pd),
            (r, r),
            (zz1, zz2),
            (zzz1, zzz2),
            (u_dbl, v_dbl),
            (x1, v_dbl),
            (m_dbl, m_dbl),
        ],
    )
    x3_dbl = F.sub(mm_dbl, F.double(s_dbl))

    # level 3
    ppp, qq, zz3, zz3_dbl, zzz3_dbl, wy_dbl = _bmul(
        F,
        [
            (pd, pp),
            (u1, pp),
            (zzp, pp),
            (zz1, v_dbl),
            (zzz1, w_dbl),
            (w_dbl, y1),
        ],
    )
    x3 = F.sub(F.sub(rr, ppp), F.double(qq))

    # level 4
    t1, t2, zzz3, ms_dbl = _bmul(
        F,
        [
            (r, F.sub(qq, x3)),
            (s1, ppp),
            (zzzp, ppp),
            (m_dbl, F.sub(s_dbl, x3_dbl)),
        ],
    )
    y3 = F.sub(t1, t2)
    y3_dbl = F.sub(ms_dbl, wy_dbl)

    normal = {"x": x3, "y": y3, "zz": zz3, "zzz": zzz3}
    p_zero = xyzz_is_zero(jf, p)
    dbl_raw = {"x": x3_dbl, "y": y3_dbl, "zz": zz3_dbl, "zzz": zzz3_dbl}
    dbl = xyzz_select(jf, ~p_zero, dbl_raw, p)

    eq_u = F.is_zero(pd)
    eq_s = F.is_zero(r)
    q_zero = xyzz_is_zero(jf, q)

    out = xyzz_select(jf, eq_u & eq_s, dbl, normal)
    out = xyzz_select(jf, eq_u & ~eq_s, xyzz_zero(jf, p["x"]), out)
    out = xyzz_select(jf, p_zero, q, out)
    out = xyzz_select(jf, q_zero & ~p_zero, p, out)
    return out


def xyzz_add_affine(jf: JField, p: dict, qx, qy, q_inf) -> dict:
    """Mixed add XYZZ + affine (madd-2008-s, 7M+2S; msm.rs:126-165),
    masked for identity/doubling/inverse cases."""
    F = jf
    u2 = F.mont_mul(qx, p["zz"])
    s2 = F.mont_mul(qy, p["zzz"])
    pd = F.sub(u2, p["x"])
    r = F.sub(s2, p["y"])
    pp = F.square(pd)
    ppp = F.mont_mul(pd, pp)
    qq = F.mont_mul(p["x"], pp)
    x3 = F.sub(F.sub(F.square(r), ppp), F.double(qq))
    y3 = F.sub(F.mont_mul(r, F.sub(qq, x3)), F.mont_mul(p["y"], ppp))
    zz3 = F.mont_mul(p["zz"], pp)
    zzz3 = F.mont_mul(p["zzz"], ppp)
    normal = {"x": x3, "y": y3, "zz": zz3, "zzz": zzz3}

    eq_u = F.is_zero(pd)
    eq_s = F.is_zero(r)
    p_zero = xyzz_is_zero(jf, p)

    q_as_xyzz = xyzz_from_affine(jf, qx, qy, q_inf)
    dbl = xyzz_double(jf, p)
    out = xyzz_select(jf, eq_u & eq_s, dbl, normal)
    out = xyzz_select(jf, eq_u & ~eq_s, xyzz_zero(jf, qx), out)
    out = xyzz_select(jf, p_zero, q_as_xyzz, out)
    out = xyzz_select(jf, q_inf & ~p_zero, p, out)
    return out


def xyzz_to_affine_host(jf: JField, p: dict, curve):
    """Device XYZZ -> host AffinePoint list (exact, via host inversion)."""
    from nova_tpu.curves.spec import AffinePoint

    spec = jf.spec
    xs = jf.unpack(jf.from_mont(p["x"].reshape(-1, 16)))
    ys = jf.unpack(jf.from_mont(p["y"].reshape(-1, 16)))
    zzs = jf.unpack(jf.from_mont(p["zz"].reshape(-1, 16)))
    zzzs = jf.unpack(jf.from_mont(p["zzz"].reshape(-1, 16)))
    out = []
    for x, y, zz, zzz in zip(xs, ys, zzs, zzzs):
        if zz == 0:
            out.append(AffinePoint.identity(curve))
        else:
            out.append(
                AffinePoint(curve, spec.mul(x, spec.inv(zz)), spec.mul(y, spec.inv(zzz)))
            )
    return out
