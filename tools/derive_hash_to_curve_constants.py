"""Derive the hash-to-curve constants from first principles.

The reference's `from_label` lifts Shake256 blocks to the curve with
halo2curves' `hash_to_curve` (/root/reference/src/provider/traits.rs:249-293):
SSWU over a 3-isogenous curve for pallas/vesta/secp256k1, SVDW for
bn254/grumpkin/secq256k1.  halo2curves' source is not available here
(zero egress), but everything it hardcodes is *derivable*:

- The isogenous curve E' is a Velu codomain of a rational 3-isogeny
  from E with j(E') not in {0, 1728} (the hash-to-curve draft's
  `find_iso` recipe, which pasta_curves / RFC 9380 used).  The published
  (A', B') pairs — iso-pallas/iso-vesta from the Zcash protocol spec
  §5.4.9.8, iso-secp256k1 from RFC 9380 §E.1 — select WHICH kernel when
  several are rational; each expected A' is verified here to be a true
  Velu codomain, so a mis-remembered constant cannot pass.
- The isogeny map E' -> E is the DUAL of that 3-isogeny: the unique map
  with dual(phi(P)) = [3]P; we compute it with Velu + a sextic-twist
  normalisation and verify the [3] identity on random points.
- Z for SSWU/SVDW comes from the RFC 9380 appendix H search, which is a
  deterministic program (reproduced below).

Run:  python tools/derive_hash_to_curve_constants.py
Output: a Python dict literal, pasted into nova_tpu/provider/hash_to_curve.py.
Every derived artifact is verified numerically before printing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nova_tpu.curves.spec import (
    AffinePoint,
    bn254,
    grumpkin,
    pallas,
    secp256k1,
    secq256k1,
    vesta,
)

# ----------------------------------------------------------------------
# polynomial helpers over F_p (dense coefficient lists, low-to-high)


def poly_mulmod(a, b, f, p):
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        if not ai:
            continue
        for j, bj in enumerate(b):
            out[i + j] = (out[i + j] + ai * bj) % p
    return poly_mod(out, f, p)


def poly_mod(a, f, p):
    a = a[:]
    df = len(f) - 1
    inv_lead = pow(f[-1], p - 2, p)
    while len(a) - 1 >= df and any(a):
        while a and a[-1] == 0:
            a.pop()
        if len(a) - 1 < df:
            break
        k = len(a) - 1 - df
        c = a[-1] * inv_lead % p
        for i, fi in enumerate(f):
            a[i + k] = (a[i + k] - c * fi) % p
        while a and a[-1] == 0:
            a.pop()
    return a or [0]


def poly_pow_xp(f, p):
    """x^p mod f via square-and-multiply."""
    result = [1]
    base = [0, 1]
    e = p
    while e:
        if e & 1:
            result = poly_mulmod(result, base, f, p)
        base = poly_mulmod(base, base, f, p)
        e >>= 1
    return result


def cubic_has_root(a1, a0, p):
    """Does the cubic x^3 + a1*x + a0 have a root in F_p?
    (irreducible cubic <=> gcd(x^p - x, f) = 1)"""
    f = [a0 % p, a1 % p, 0, 1]
    xp = poly_pow_xp(f, p)
    g = xp[:]
    while len(g) < 2:
        g.append(0)
    g[1] = (g[1] - 1) % p
    gcd = poly_gcd(f, g, p)
    return len(gcd) - 1 >= 1


def is_square(x, p):
    x %= p
    return x == 0 or pow(x, (p - 1) // 2, p) == 1


def sqrt_mod(x, p, F):
    return F.sqrt(x % p)


def cube_roots(a, p):
    """All cube roots of a mod p, via factoring x^3 - a."""
    a %= p
    if a == 0:
        return [0]
    if p % 3 == 1 and pow(a, (p - 1) // 3, p) != 1:
        return []
    return sorted(poly_roots_deg_le3([(-a) % p, 0, 0, 1], p))


def poly_roots_deg_le3(f, p):
    """Roots of a cubic by brute Cantor-Zassenhaus (randomized)."""
    import random

    # strip to monic
    f = [c % p for c in f]
    # gcd with x^p - x to keep split part
    xp = poly_pow_xp(f, p)
    g = xp[:]
    while len(g) < 2:
        g.append(0)
    g[1] = (g[1] - 1) % p
    split = poly_gcd(f, g, p)
    roots = []

    def find(fp):
        d = len(fp) - 1
        if d == 0:
            return
        if d == 1:
            roots.append((-fp[0]) * pow(fp[1], p - 2, p) % p)
            return
        while True:
            a = random.randrange(p)
            h = poly_powmod([a, 1], (p - 1) // 2, fp, p)
            h = h[:]
            h[0] = (h[0] - 1) % p
            gg = poly_gcd(fp, h, p)
            if 0 < len(gg) - 1 < d:
                find(gg)
                find(poly_div(fp, gg, p))
                return

    find(split)
    return roots


def poly_gcd(a, b, p):
    a, b = a[:], b[:]
    while any(c % p for c in b):
        a, b = b, poly_mod(a, b, p)
    # monic normalize
    while a and a[-1] == 0:
        a.pop()
    if a:
        il = pow(a[-1], p - 2, p)
        a = [c * il % p for c in a]
    return a or [0]


def poly_div(a, b, p):
    """Exact division a / b."""
    a = [c % p for c in a]
    out = [0] * (len(a) - len(b) + 1)
    il = pow(b[-1], p - 2, p)
    for k in range(len(out) - 1, -1, -1):
        c = a[len(b) - 1 + k] * il % p
        out[k] = c
        for i, bi in enumerate(b):
            a[i + k] = (a[i + k] - c * bi) % p
    return out


def poly_powmod(base, e, f, p):
    result = [1]
    base = poly_mod(base, f, p)
    while e:
        if e & 1:
            result = poly_mulmod(result, base, f, p)
        base = poly_mulmod(base, base, f, p)
        e >>= 1
    return result


# ----------------------------------------------------------------------
# Velu 3-isogeny machinery (curves y^2 = x^3 + A x + B)


class Iso3:
    """phi: (x, y) -> (N(x)/D(x), y * N'(x)-ish / ...) for kernel x0."""

    def __init__(self, p, A, B, x0):
        self.p, self.A, self.B, self.x0 = p, A % p, B % p, x0 % p
        t = (3 * x0 * x0 + A) % p
        u = 4 * (x0 * x0 * x0 + A * x0 + B) % p
        v = 2 * t % p
        self.u, self.v = u, v
        w = (u + x0 * v) % p
        self.A2 = (A - 5 * v) % p
        self.B2 = (B - 7 * w) % p

    def map(self, x, y):
        p, x0, u, v = self.p, self.x0, self.u, self.v
        d = (x - x0) % p
        if d == 0:
            return None  # kernel -> infinity
        di = pow(d, p - 2, p)
        X = (x + v * di + u * di * di) % p
        Xp = (1 - v * di * di - 2 * u * di * di * di) % p
        return X, y * Xp % p


def on_curve(p, A, B, x, y):
    return (y * y - (x * x * x + A * x + B)) % p == 0


def random_point(p, A, B, F, seed=1):
    x = seed
    while True:
        rhs = (x * x * x + A * x + B) % p
        y = F.sqrt(rhs)
        if y is not None:
            return x, y
        x += 1


def ec_add(p, A, x1, y1, x2, y2):
    if x1 is None:
        return x2, y2
    if x2 is None:
        return x1, y1
    if x1 == x2 and (y1 + y2) % p == 0:
        return None, None
    if x1 == x2:
        lam = (3 * x1 * x1 + A) * pow(2 * y1, p - 2, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, p - 2, p) % p
    x3 = (lam * lam - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return x3, y3


def ec_mul(p, A, k, x, y):
    rx, ry = None, None
    while k:
        if k & 1:
            rx, ry = ec_add(p, A, rx, ry, x, y)
        x, y = ec_add(p, A, x, y, x, y)
        k >>= 1
    return rx, ry


# ----------------------------------------------------------------------
# RFC 9380 appendix H Z searches


def find_z_sswu(p, A, B, F):
    ctr = 1
    while True:
        for z in (ctr, p - ctr):
            if is_square(z, p):
                continue
            if z == p - 1:
                continue
            # g(x) - z irreducible <=> cubic x^3 + A x + (B - z) has no root
            if cubic_has_root(A, B - z, p):
                continue
            gval = (pow(B * pow(z * A % p, p - 2, p), 3, p)
                    + A * (B * pow(z * A % p, p - 2, p)) + B) % p
            if is_square(gval, p):
                return z if z == ctr else -ctr
        ctr += 1


def find_z_svdw(p, A, B, F):
    def g(x):
        return (x * x * x + A * x + B) % p

    ctr = 1
    while True:
        for z in (ctr, p - ctr):
            gz = g(z)
            if gz == 0:
                continue
            hz = (-(3 * z * z + 4 * A)) * pow(4 * gz % p, p - 2, p) % p
            if hz == 0:
                continue
            if not is_square(hz, p):
                continue
            if is_square(gz, p) or is_square(g((-z) * pow(2, p - 2, p) % p), p):
                return z if z == ctr else -ctr
        ctr += 1


# ----------------------------------------------------------------------


def derive_sswu(curve, expect_bprime, expect_aprime=None):
    p = curve.base.p
    F = curve.base
    A, B = 0, curve.b % p
    # rational 3-isogeny kernels from E: roots of psi3 = 3x(x^3 + 4B)
    kernels = [0] + cube_roots((-4 * B) % p, p)
    cands = []
    for x0 in kernels:
        iso = Iso3(p, A, B, x0)
        jnum = 4 * iso.A2 * iso.A2 * iso.A2 % p
        jden = (4 * iso.A2 * iso.A2 * iso.A2 + 27 * iso.B2 * iso.B2) % p
        if jnum == 0:  # j = 0 codomain, excluded by find_iso
            continue
        cands.append((x0, iso))
    print(f"  {curve.name}: {len(cands)} non-j0 kernel(s); codomain B' values:",
          [c[1].B2 if c[1].B2 < 10**6 else hex(c[1].B2) for c in cands])
    match = [c for c in cands if c[1].B2 == expect_bprime % p
             and (expect_aprime is None or c[1].A2 == expect_aprime % p)]
    assert match, f"{curve.name}: no Velu codomain with B'={expect_bprime}"
    x0, phi = match[0]
    Ap, Bp = phi.A2, phi.B2
    print(f"  {curve.name}: iso curve A'={hex(Ap)} B'={Bp} (kernel x0={hex(x0)})")

    # sanity: phi maps E -> E'
    x, y = random_point(p, A, B, F, seed=3)
    X, Y = phi.map(x, y)
    assert on_curve(p, Ap, Bp, X, Y)

    # dual: 3-isogenies from E'; compose with sextic twist to land on E; pick
    # the one with dual(phi(P)) = [3]P.  The dual kernel x-coords are
    # x(phi(Q)) for Q in E[3] \ ker phi (no need to factor E''s psi3):
    # rational candidates are the other kernels of E mapped through phi.
    dual_kernel_xs = set()
    for x1 in kernels:
        if x1 == x0:
            continue
        rhs = (x1 * x1 * x1 + A * x1 + B) % p
        yy = F.sqrt(rhs)
        if yy is None:
            # kernel point defined over Fp2; its image x-coord is still
            # computable from the x-only part of the Velu map
            d = (x1 - x0) % p
            di = pow(d, p - 2, p)
            X1 = (x1 + phi.v * di + phi.u * di * di) % p
            dual_kernel_xs.add(X1)
        else:
            X1, _ = phi.map(x1, yy)
            dual_kernel_xs.add(X1)
    # also x=0 kernel images etc. covered above.
    assert dual_kernel_xs, "no dual kernel candidates"

    P = random_point(p, A, B, F, seed=7)
    P3 = ec_mul(p, A, 3, *P)
    for kx in sorted(dual_kernel_xs):
        psi = Iso3(p, Ap, Bp, kx)
        # codomain should be sextic-twist-isomorphic to E (A=0)
        if psi.A2 != 0:
            continue
        # find c with c^6 = B / B2c
        ratio = B * pow(psi.B2, p - 2, p) % p
        # sixth roots: solve c^2 = cube root of ratio (try all)
        for cr in cube_roots(ratio, p):
            c = F.sqrt(cr)
            if c is None:
                continue
            for cc in (c, p - c):
                # candidate dual: iota(psi(.)) with iota(x,y) = (cc^2 x, cc^3 y)
                def dual(x, y, _psi=psi, _cc=cc):
                    r = _psi.map(x, y)
                    if r is None:
                        return None
                    X, Y = r
                    return _cc * _cc % p * X % p, pow(_cc, 3, p) * Y % p

                img = phi.map(*P)
                got = dual(*img)
                if got is not None and got == P3:
                    # verify on more points
                    ok = True
                    for s in (11, 23, 31):
                        Q = random_point(p, A, B, F, seed=s)
                        gq = dual(*phi.map(*Q))
                        if gq != ec_mul(p, A, 3, *Q):
                            ok = False
                            break
                    assert ok
                    # extract 13 constants of the composed map E' -> E
                    # X(x) = cc^2 * [x^3 + n2 x^2 + n1 x + n0] / (x - kx)^2
                    # Y(x,y) = y * cc^3 * [x^3 + m2 x^2 + m1 x + m0] / (x-kx)^3
                    u, v, kx_ = psi.u, psi.v, kx
                    c2, c3 = cc * cc % p, pow(cc, 3, p)
                    xn = [c2 * ((-v * kx_ + u) % p) % p,
                          c2 * ((kx_ * kx_ + v) % p) % p,
                          c2 * ((-2 * kx_) % p) % p,
                          c2]
                    xd = [kx_ * kx_ % p, (-2 * kx_) % p, 1]
                    # numerator of X' * (x-kx)^3 = (x-kx)^3 - v(x-kx) - 2u
                    yn = [c3 * ((-pow(kx_, 3, p) + v * kx_ - 2 * u) % p) % p,
                          c3 * ((3 * kx_ * kx_ - v) % p) % p,
                          c3 * ((-3 * kx_) % p) % p,
                          c3]
                    yd = [(-pow(kx_, 3, p)) % p, 3 * kx_ * kx_ % p,
                          (-3 * kx_) % p, 1]
                    # verify constant form on a point
                    Q = random_point(p, A, B, F, seed=101)
                    Xq, Yq = phi.map(*Q)
                    num = sum(cf * pow(Xq, i, p) for i, cf in enumerate(xn)) % p
                    den = sum(cf * pow(Xq, i, p) for i, cf in enumerate(xd)) % p
                    gx = num * pow(den, p - 2, p) % p
                    nym = sum(cf * pow(Xq, i, p) for i, cf in enumerate(yn)) % p
                    dym = sum(cf * pow(Xq, i, p) for i, cf in enumerate(yd)) % p
                    gy = Yq * nym % p * pow(dym, p - 2, p) % p
                    assert dual(Xq, Yq) == (gx, gy)
                    z = find_z_sswu(p, Ap, Bp, F)
                    print(f"  {curve.name}: SSWU Z = {z}")
                    return {
                        "method": "sswu",
                        "iso_a": Ap,
                        "iso_b": Bp,
                        "z": z % p,
                        "x_num": xn,
                        "x_den": xd,
                        "y_num": yn,
                        "y_den": yd,
                    }
    raise AssertionError(f"{curve.name}: no dual found")


def derive_svdw(curve):
    p = curve.base.p
    F = curve.base
    A, B = 0, curve.b % p
    z = find_z_svdw(p, A, B, F)
    zp = z % p
    gz = (pow(zp, 3, p) + A * zp + B) % p
    c1 = gz
    c2 = (-zp) * pow(2, p - 2, p) % p
    c3cand = F.sqrt((-gz * (3 * zp * zp + 4 * A)) % p)
    assert c3cand is not None
    if c3cand & 1:  # sgn0(c3) must be 0
        c3cand = p - c3cand
    c4 = (-4 * gz % p) * pow((3 * zp * zp + 4 * A) % p, p - 2, p) % p
    print(f"  {curve.name}: SVDW Z = {z}")
    return {"method": "svdw", "z": zp, "c1": c1, "c2": c2, "c3": c3cand, "c4": c4}


def main():
    out = {}
    print("SSWU (isogeny) curves:")
    # expected A' values: iso-pallas / iso-vesta per the published pasta
    # constants (Zcash protocol spec 5.4.9.8), iso-secp256k1 per RFC 9380
    # E.1 — each selects WHICH rational 3-isogeny kernel the upstream
    # implementation picked; all three are verified Velu codomains here.
    out["pallas"] = derive_sswu(
        pallas, 1265,
        0x18354a2eb0ea8c9c49be2d7258370742b74134581a27a59f92bb4b0b657a014b)
    # For y^2 = x^3 + b, every rational 3-isogeny kernel x0 has x0^3 = -4b,
    # so B' = b - 7*(10*x0^3 + 4b) = 253*b is kernel-independent:
    # 1265 for pallas AND vesta (b=5), 1771 for secp256k1 (b=7) — the
    # latter two matching the published iso-curve constants, which also
    # pins the kernel ordering (first = smallest root, matching the
    # derived iso-pallas A' against the published one).
    out["vesta"] = derive_sswu(
        vesta, 1265,
        0x267f9b2ee592271a81639c4d96f787739673928c7d01b212c515ad7242eaa6b1)
    out["secp256k1"] = derive_sswu(
        secp256k1, 1771,
        0x3f8731abdd661adca08a5558f0f5d272e953d363cb6f0e5d405447c01a444533)
    print("SVDW curves:")
    out["bn254"] = derive_svdw(bn254)
    out["grumpkin"] = derive_svdw(grumpkin)
    out["secq256k1"] = derive_svdw(secq256k1)
    print("\nHASH_TO_CURVE_CONSTANTS = {")
    for name, d in out.items():
        print(f"    {name!r}: {{")
        for k, v in d.items():
            if isinstance(v, list):
                print(f"        {k!r}: [{', '.join(hex(c) for c in v)}],")
            elif isinstance(v, int):
                print(f"        {k!r}: {hex(v)},")
            else:
                print(f"        {k!r}: {v!r},")
        print("    },")
    print("}")


if __name__ == "__main__":
    main()
