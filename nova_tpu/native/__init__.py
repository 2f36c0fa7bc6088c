"""ctypes bindings for the C++ host kernels (native/nova_native.cpp).

Compiled on demand with g++ (cached .so). All boundary values are
numpy (n, 4) uint64 little-endian limb arrays in normal (non-Montgomery)
form. Falls back gracefully: `available()` returns False if the toolchain
or compile fails, and callers keep their pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native", "nova_native.cpp")
_SO = os.path.join(_HERE, "_nova_native.so")

_lib = None
_lib_lock = threading.Lock()
_ctx_cache: dict = {}


def _build() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SRC):
        return None
    if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
            "-fno-exceptions", "-fomit-frame-pointer",
            _SRC, "-o", _SO + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            os.replace(_SO + ".tmp", _SO)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ctx_new.restype = ctypes.c_void_p
    lib.ctx_new.argtypes = [u64p]
    lib.poseidon_ctx_new.restype = ctypes.c_void_p
    lib.poseidon_ctx_new.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u64p, ctypes.c_size_t, u64p, u64p, u64p, u64p,
    ]
    lib.poseidon_ctx_free.argtypes = [ctypes.c_void_p]
    lib.keccak_f1600.argtypes = [u64p]
    lib.poseidon_permute.argtypes = [ctypes.c_void_p, u64p]
    lib.poseidon_permute_witness.restype = ctypes.c_size_t
    lib.poseidon_permute_witness.argtypes = [ctypes.c_void_p, u64p, u64p,
                                             ctypes.c_int]
    lib.ctx_free.argtypes = [ctypes.c_void_p]
    for name, extra in [
        ("vec_mulmod", [u64p, u64p, u64p, ctypes.c_size_t]),
        ("vec_addmod", [u64p, u64p, u64p, ctypes.c_size_t]),
        ("vec_submod", [u64p, u64p, u64p, ctypes.c_size_t]),
        ("vec_axpy", [u64p, u64p, u64p, u64p, ctypes.c_size_t]),
        ("vec_invmod", [u64p, u64p, ctypes.c_size_t]),
        ("vec_fold", [u64p, u64p, u64p, u64p, u64p, ctypes.c_size_t]),
        ("vec_dot", [u64p, u64p, u64p, ctypes.c_size_t]),
        ("spmv", [u64p, u8p, ctypes.POINTER(ctypes.c_uint32),
                  ctypes.POINTER(ctypes.c_uint32), ctypes.c_size_t, u64p, u64p]),
        ("vec_cross", [u64p, u64p, u64p, u64p, u64p, u64p, ctypes.c_size_t]),
        ("vec_cross_relaxed", [u64p, u64p, u64p, u64p, u64p, u64p, u64p, u64p,
                               u64p, u64p, u64p, ctypes.c_size_t]),
        ("vec_sat_check", [u64p, u64p, u64p, u64p, u64p, ctypes.c_size_t]),
        ("vec_batch_inv", [u64p, u64p, ctypes.c_size_t]),
        ("vec_from_mont", [u64p, u64p, ctypes.c_size_t]),
        ("inv_mod", [u64p, u64p]),
        ("neutron_round", [u64p, u64p, u64p, u64p, u64p, u64p, u64p, u64p,
                           ctypes.c_size_t, ctypes.c_size_t, u64p]),
        ("eq_evals", [u64p, ctypes.c_size_t, u64p]),
        ("sumcheck_cubic_round", [u64p, u64p, u64p, u64p, ctypes.c_size_t, u64p]),
        ("sumcheck_quad_round", [u64p, u64p, ctypes.c_size_t, u64p]),
        ("sumcheck_cubic_gruen_round", [u64p, u64p, u64p, u64p, ctypes.c_size_t, u64p]),
        ("sumcheck_cubicprod_round", [u64p, u64p, u64p, ctypes.c_size_t, u64p]),
        ("sumcheck_quadeval_round", [u64p, u64p, ctypes.c_size_t, u64p]),
        ("sumcheck_linear_round", [u64p, u64p, ctypes.c_size_t, u64p]),
        ("msm", [u64p, u64p, u8p, u64p, ctypes.c_size_t, u64p, u64p, u8p]),
        ("msm_idx", [u64p, u64p, u8p, u64p,
                     ctypes.POINTER(ctypes.c_uint32), ctypes.c_size_t,
                     u64p, u64p, u8p]),
        ("poly_eval_horner", [u64p, ctypes.c_size_t, u64p, u64p]),
        ("poly_div_linear", [u64p, ctypes.c_size_t, u64p, u64p]),
        ("ntt", [u64p, ctypes.c_size_t, u64p, ctypes.c_int]),
        ("batch_add_seg", [u64p, u64p, u8p,
                           ctypes.POINTER(ctypes.c_uint32),
                           ctypes.POINTER(ctypes.c_uint32), ctypes.c_size_t,
                           u64p, u64p, u8p]),
        ("ec_fold", [u64p, u64p, u8p, u64p, u64p, u8p, u64p, u64p,
                     ctypes.c_size_t, u64p, u64p, u8p]),
        ("ec_scale", [u64p, u64p, u8p, u64p, ctypes.c_size_t, u64p, u64p, u8p]),
        ("ec_fixed_mul_many", [u64p, u64p, u64p, ctypes.c_size_t, u64p, u64p, u8p]),
        ("ec_mul_many", [u64p, u64p, u8p, u64p, ctypes.c_size_t, u64p, u64p, u8p]),
    ]:
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [ctypes.c_void_p] + extra
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        with _lib_lock:
            if _lib is None:
                _lib = _build() or False
    return _lib or None


def available() -> bool:
    return _get_lib() is not None


def _ctx(p: int):
    lib = _get_lib()
    if lib is None:
        return None
    key = p
    if key not in _ctx_cache:
        limbs = ints_to_limbs([p])
        _ctx_cache[key] = lib.ctx_new(_ptr64(limbs))
    return _ctx_cache[key]


# -- conversions --------------------------------------------------------------

def ints_to_limbs(vals: Sequence[int]) -> np.ndarray:
    buf = b"".join(int(v).to_bytes(32, "little") for v in vals)
    return np.frombuffer(buf, dtype="<u8").reshape(len(vals), 4).copy()


def limbs_to_ints(arr: np.ndarray) -> List[int]:
    b = arr.astype("<u8").tobytes()
    return [int.from_bytes(b[32 * i : 32 * (i + 1)], "little") for i in range(arr.shape[0])]


def _ptr64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _ptr8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _points_to_arrays(points) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    xs = ints_to_limbs([p.x for p in points])
    ys = ints_to_limbs([p.y for p in points])
    inf = np.array([1 if p.infinity else 0 for p in points], dtype=np.uint8)
    return xs, ys, inf


def _arrays_to_points(curve, ox, oy, oinf):
    from nova_tpu.curves.spec import AffinePoint

    xs = limbs_to_ints(ox)
    ys = limbs_to_ints(oy)
    return [
        AffinePoint.identity(curve) if oinf[i] else AffinePoint(curve, xs[i], ys[i])
        for i in range(len(xs))
    ]


# -- public ops ---------------------------------------------------------------

def msm(scalars: Sequence[int], points) -> "AffinePoint":
    """Host Pippenger MSM in C++ (normal-form ints in/out)."""
    from nova_tpu.curves.spec import AffinePoint

    curve = points[0].curve
    ctx = _ctx(curve.base.p)
    lib = _get_lib()
    n = len(points)
    assert len(scalars) == n
    xs, ys, inf = _points_to_arrays(points)
    ks = ints_to_limbs([s % curve.scalar.p for s in scalars])
    ox = np.zeros(4, dtype=np.uint64)
    oy = np.zeros(4, dtype=np.uint64)
    oinf = np.zeros(1, dtype=np.uint8)
    lib.msm(ctx, _ptr64(xs), _ptr64(ys), _ptr8(inf), _ptr64(ks), n,
            _ptr64(ox), _ptr64(oy), _ptr8(oinf))
    if oinf[0]:
        return AffinePoint.identity(curve)
    return AffinePoint(
        curve,
        int.from_bytes(ox.astype("<u8").tobytes(), "little"),
        int.from_bytes(oy.astype("<u8").tobytes(), "little"),
    )


def marshal_points(points) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-time limb marshalling of an affine point list, for msm_cached."""
    return _points_to_arrays(points)


def msm_cached(curve, arrays, scalars: Sequence[int], indices=None):
    """MSM over pre-marshalled bases (from marshal_points), optionally
    index-selected: base i = arrays[indices[i]]. Saves the per-call
    Python-int -> limb conversion of the points (the dominant Python-side
    cost for repeated commits against one key)."""
    from nova_tpu.curves.spec import AffinePoint

    ctx = _ctx(curve.base.p)
    lib = _get_lib()
    xs, ys, inf = arrays
    if isinstance(scalars, np.ndarray):
        ks = np.ascontiguousarray(scalars)
        n = ks.shape[0]
    else:
        n = len(scalars)
        ks = ints_to_limbs([s % curve.scalar.p for s in scalars])
    if indices is None:
        assert n <= xs.shape[0]
        idxp = None
        idx_arr = None
    else:
        idx_arr = np.asarray(indices, dtype=np.uint32)
        assert idx_arr.shape[0] == n
        idxp = idx_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    ox = np.zeros(4, dtype=np.uint64)
    oy = np.zeros(4, dtype=np.uint64)
    oinf = np.zeros(1, dtype=np.uint8)
    if indices is None:
        lib.msm(ctx, _ptr64(xs), _ptr64(ys), _ptr8(inf), _ptr64(ks), n,
                _ptr64(ox), _ptr64(oy), _ptr8(oinf))
    else:
        lib.msm_idx(ctx, _ptr64(xs), _ptr64(ys), _ptr8(inf), _ptr64(ks),
                    idxp, n, _ptr64(ox), _ptr64(oy), _ptr8(oinf))
    if oinf[0]:
        return AffinePoint.identity(curve)
    return AffinePoint(
        curve,
        int.from_bytes(ox.astype("<u8").tobytes(), "little"),
        int.from_bytes(oy.astype("<u8").tobytes(), "little"),
    )


def batch_add_seg(curve, arrays, order, seg_off):
    """Segmented batch-add over pre-marshalled points: result s = sum of
    arrays[order[seg_off[s]:seg_off[s+1]]], all segments reduced together
    by the shared-inversion batched-affine pair scheduler (the reference's
    batch_add, src/provider/msm.rs:689-770). Returns len(seg_off)-1
    AffinePoints."""
    ctx = _ctx(curve.base.p)
    lib = _get_lib()
    xs, ys, inf = arrays
    order_arr = np.asarray(order, dtype=np.uint32)
    off_arr = np.asarray(seg_off, dtype=np.uint32)
    nseg = off_arr.shape[0] - 1
    assert nseg >= 1 and off_arr[-1] == order_arr.shape[0]
    ox = np.zeros((nseg, 4), dtype=np.uint64)
    oy = np.zeros((nseg, 4), dtype=np.uint64)
    oinf = np.zeros(nseg, dtype=np.uint8)
    lib.batch_add_seg(
        ctx, _ptr64(xs), _ptr64(ys), _ptr8(inf),
        order_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        off_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        nseg, _ptr64(ox), _ptr64(oy), _ptr8(oinf))
    return _arrays_to_points(curve, ox, oy, oinf)


def ec_fixed_mul_many(base, scalars):
    """[k * base for k in scalars] with one shared fixed-base window table
    (reference fixed_base_exp_comb_batch, hyperkzg.rs:443)."""
    curve = base.curve
    ctx = _ctx(curve.base.p)
    lib = _get_lib()
    n = len(scalars)
    gx = ints_to_limbs([base.x])
    gy = ints_to_limbs([base.y])
    ks = ints_to_limbs([s % curve.scalar.p for s in scalars])
    ox = np.zeros((n, 4), dtype=np.uint64)
    oy = np.zeros((n, 4), dtype=np.uint64)
    oinf = np.zeros(n, dtype=np.uint8)
    lib.ec_fixed_mul_many(ctx, _ptr64(gx), _ptr64(gy), _ptr64(ks), n,
                          _ptr64(ox), _ptr64(oy), _ptr8(oinf))
    return _arrays_to_points(curve, ox, oy, oinf)


def ec_fold(L, R, w1: int, w2: int):
    """[w1*L_i + w2*R_i] for commitment-key folding."""
    curve = L[0].curve
    ctx = _ctx(curve.base.p)
    lib = _get_lib()
    n = len(L)
    lx, ly, li = _points_to_arrays(L)
    rx, ry, ri = _points_to_arrays(R)
    w1a = ints_to_limbs([w1 % curve.scalar.p])
    w2a = ints_to_limbs([w2 % curve.scalar.p])
    ox = np.zeros((n, 4), dtype=np.uint64)
    oy = np.zeros((n, 4), dtype=np.uint64)
    oinf = np.zeros(n, dtype=np.uint8)
    lib.ec_fold(ctx, _ptr64(lx), _ptr64(ly), _ptr8(li), _ptr64(rx), _ptr64(ry),
                _ptr8(ri), _ptr64(w1a), _ptr64(w2a), n, _ptr64(ox), _ptr64(oy),
                _ptr8(oinf))
    return _arrays_to_points(curve, ox, oy, oinf)


def ec_scale(points, k: int):
    curve = points[0].curve
    ctx = _ctx(curve.base.p)
    lib = _get_lib()
    n = len(points)
    xs, ys, inf = _points_to_arrays(points)
    ka = ints_to_limbs([k % curve.scalar.p])
    ox = np.zeros((n, 4), dtype=np.uint64)
    oy = np.zeros((n, 4), dtype=np.uint64)
    oinf = np.zeros(n, dtype=np.uint8)
    lib.ec_scale(ctx, _ptr64(xs), _ptr64(ys), _ptr8(inf), _ptr64(ka), n,
                 _ptr64(ox), _ptr64(oy), _ptr8(oinf))
    return _arrays_to_points(curve, ox, oy, oinf)


def ec_mul_many(points, scalars: Sequence[int]):
    curve = points[0].curve
    ctx = _ctx(curve.base.p)
    lib = _get_lib()
    n = len(points)
    xs, ys, inf = _points_to_arrays(points)
    ks = ints_to_limbs([s % curve.scalar.p for s in scalars])
    ox = np.zeros((n, 4), dtype=np.uint64)
    oy = np.zeros((n, 4), dtype=np.uint64)
    oinf = np.zeros(n, dtype=np.uint8)
    lib.ec_mul_many(ctx, _ptr64(xs), _ptr64(ys), _ptr8(inf), _ptr64(ks), n,
                    _ptr64(ox), _ptr64(oy), _ptr8(oinf))
    return _arrays_to_points(curve, ox, oy, oinf)


def vec_mulmod(p: int, a: Sequence[int], b: Sequence[int]) -> List[int]:
    ctx = _ctx(p)
    lib = _get_lib()
    n = len(a)
    aa = ints_to_limbs([x % p for x in a])
    bb = ints_to_limbs([x % p for x in b])
    out = np.zeros((n, 4), dtype=np.uint64)
    lib.vec_mulmod(ctx, _ptr64(aa), _ptr64(bb), _ptr64(out), n)
    return limbs_to_ints(out)


# -- limb-array-level ops (no int conversion; (n,4) uint64 LE in/out) ---------

def vec_mulmod_l(p: int, aa: np.ndarray, bb: np.ndarray) -> np.ndarray:
    ctx = _ctx(p)
    lib = _get_lib()
    n = aa.shape[0]
    aa = np.ascontiguousarray(aa)
    bb = np.ascontiguousarray(bb)
    out = np.zeros((n, 4), dtype=np.uint64)
    lib.vec_mulmod(ctx, _ptr64(aa), _ptr64(bb), _ptr64(out), n)
    return out


def vec_fold_l(p: int, aa: np.ndarray, bb: np.ndarray, r1: int, r2: int) -> np.ndarray:
    """out = r1*a + r2*b elementwise."""
    ctx = _ctx(p)
    lib = _get_lib()
    n = aa.shape[0]
    aa = np.ascontiguousarray(aa)
    bb = np.ascontiguousarray(bb)
    rr1 = ints_to_limbs([r1 % p])
    rr2 = ints_to_limbs([r2 % p])
    out = np.zeros((n, 4), dtype=np.uint64)
    lib.vec_fold(ctx, _ptr64(aa), _ptr64(bb), _ptr64(rr1), _ptr64(rr2), _ptr64(out), n)
    return out


def vec_addmod_l(p: int, aa: np.ndarray, bb: np.ndarray) -> np.ndarray:
    ctx = _ctx(p)
    lib = _get_lib()
    n = aa.shape[0]
    out = np.zeros((n, 4), dtype=np.uint64)
    lib.vec_addmod(ctx, _ptr64(np.ascontiguousarray(aa)),
                   _ptr64(np.ascontiguousarray(bb)), _ptr64(out), n)
    return out


def vec_axpy_l(p: int, aa: np.ndarray, bb: np.ndarray, s: int) -> np.ndarray:
    """out = a + s*b elementwise."""
    ctx = _ctx(p)
    lib = _get_lib()
    n = aa.shape[0]
    out = np.zeros((n, 4), dtype=np.uint64)
    ss = ints_to_limbs([s % p])
    lib.vec_axpy(ctx, _ptr64(np.ascontiguousarray(aa)),
                 _ptr64(np.ascontiguousarray(bb)), _ptr64(ss), _ptr64(out), n)
    return out


def _u32arr(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.uint32))


def marshal_matrix(p: int, data, indices, indptr):
    """One-time native rep of a CSR matrix: Montgomery-form coefficients
    with +-1 coefficient classes (reference PrecomputedSparseMatrix,
    src/r1cs/sparse.rs:19-107)."""
    r1 = pow(2, 256, p)
    dl = ints_to_limbs([x % p for x in data])
    dm = vec_mulmod_l(p, dl, ints_to_limbs([r1] * len(data)))
    cls = np.zeros(len(data), dtype=np.uint8)
    for i, x in enumerate(data):
        v = x % p
        if v == 1:
            cls[i] = 1
        elif v == p - 1:
            cls[i] = 2
    return (dm, cls, _u32arr(indices), _u32arr(indptr), len(indptr) - 1)


def spmv_l(p: int, cache, z: np.ndarray) -> np.ndarray:
    dm, cls, idx, ptr, rows = cache
    ctx = _ctx(p)
    lib = _get_lib()
    z = np.ascontiguousarray(z)
    out = np.zeros((rows, 4), dtype=np.uint64)
    lib.spmv(ctx, _ptr64(dm), _ptr8(cls),
             idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
             ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
             rows, _ptr64(z), _ptr64(out))
    return out


def vec_cross_l(p: int, az, bz, cz, e, u: int) -> np.ndarray:
    ctx = _ctx(p)
    lib = _get_lib()
    n = az.shape[0]
    out = np.zeros((n, 4), dtype=np.uint64)
    uu = ints_to_limbs([u % p])
    lib.vec_cross(ctx, _ptr64(np.ascontiguousarray(az)),
                  _ptr64(np.ascontiguousarray(bz)),
                  _ptr64(np.ascontiguousarray(cz)),
                  _ptr64(np.ascontiguousarray(e)), _ptr64(uu), _ptr64(out), n)
    return out


def vec_cross_relaxed_l(p: int, az1, bz1, cz1, az2, bz2, cz2, e1, e2,
                        u1: int, u2: int) -> np.ndarray:
    ctx = _ctx(p)
    lib = _get_lib()
    n = az1.shape[0]
    out = np.zeros((n, 4), dtype=np.uint64)
    uu1 = ints_to_limbs([u1 % p])
    uu2 = ints_to_limbs([u2 % p])
    args = [np.ascontiguousarray(a) for a in (az1, bz1, cz1, az2, bz2, cz2, e1, e2)]
    lib.vec_cross_relaxed(ctx, *[_ptr64(a) for a in args],
                          _ptr64(uu1), _ptr64(uu2), _ptr64(out), n)
    return out


def eq_evals_l(p: int, r: "Sequence[int]") -> np.ndarray:
    """Full eq(r, x) table as (2^k, 4) limbs (top variable = r[0])."""
    ctx = _ctx(p)
    lib = _get_lib()
    k = len(r)
    rl = ints_to_limbs([x % p for x in r])
    out = np.zeros((1 << k, 4), dtype=np.uint64)
    lib.eq_evals(ctx, _ptr64(rl), k, _ptr64(out))
    return out


def sumcheck_cubic_round_l(p: int, E, A, B, Cv) -> tuple:
    """(e0, cubic_coeff, e_minus_1) for one round; inputs (2h,4) limbs."""
    ctx = _ctx(p)
    lib = _get_lib()
    half = E.shape[0] // 2
    out = np.zeros((3, 4), dtype=np.uint64)
    lib.sumcheck_cubic_round(ctx, _ptr64(np.ascontiguousarray(E)),
                             _ptr64(np.ascontiguousarray(A)),
                             _ptr64(np.ascontiguousarray(B)),
                             _ptr64(np.ascontiguousarray(Cv)), half, _ptr64(out))
    v = limbs_to_ints(out)
    return v[0], v[1], v[2]


def sumcheck_quad_round_l(p: int, A, B) -> tuple:
    """(e0, quad_coeff) for one round; inputs (2h,4) limbs."""
    ctx = _ctx(p)
    lib = _get_lib()
    half = A.shape[0] // 2
    out = np.zeros((2, 4), dtype=np.uint64)
    lib.sumcheck_quad_round(ctx, _ptr64(np.ascontiguousarray(A)),
                            _ptr64(np.ascontiguousarray(B)), half, _ptr64(out))
    v = limbs_to_ints(out)
    return v[0], v[1]


def sumcheck_cubic_gruen_round_l(p: int, E, A, B, Cv) -> tuple:
    """(t0, tinf) of the eq-factored round; E is the UNBOUND prefix slice
    of the full eq table (length half), A/B/Cv the bound tables (2*half)."""
    ctx = _ctx(p)
    lib = _get_lib()
    half = A.shape[0] // 2
    assert E.shape[0] == half
    out = np.zeros((2, 4), dtype=np.uint64)
    lib.sumcheck_cubic_gruen_round(ctx, _ptr64(np.ascontiguousarray(E)),
                                   _ptr64(np.ascontiguousarray(A)),
                                   _ptr64(np.ascontiguousarray(B)),
                                   _ptr64(np.ascontiguousarray(Cv)), half,
                                   _ptr64(out))
    v = limbs_to_ints(out)
    return v[0], v[1]


def sumcheck_cubicprod_round_l(p: int, A, B, Cv) -> tuple:
    ctx = _ctx(p)
    lib = _get_lib()
    half = A.shape[0] // 2
    out = np.zeros((3, 4), dtype=np.uint64)
    lib.sumcheck_cubicprod_round(ctx, _ptr64(np.ascontiguousarray(A)),
                                 _ptr64(np.ascontiguousarray(B)),
                                 _ptr64(np.ascontiguousarray(Cv)), half,
                                 _ptr64(out))
    v = limbs_to_ints(out)
    return v[0], v[1], v[2]


def sumcheck_quadeval_round_l(p: int, A, B) -> tuple:
    ctx = _ctx(p)
    lib = _get_lib()
    half = A.shape[0] // 2
    out = np.zeros((2, 4), dtype=np.uint64)
    lib.sumcheck_quadeval_round(ctx, _ptr64(np.ascontiguousarray(A)),
                                _ptr64(np.ascontiguousarray(B)), half,
                                _ptr64(out))
    v = limbs_to_ints(out)
    return v[0], v[1]


def sumcheck_linear_round_l(p: int, A, B) -> tuple:
    ctx = _ctx(p)
    lib = _get_lib()
    half = A.shape[0] // 2
    out = np.zeros((2, 4), dtype=np.uint64)
    lib.sumcheck_linear_round(ctx, _ptr64(np.ascontiguousarray(A)),
                              _ptr64(np.ascontiguousarray(B)), half,
                              _ptr64(out))
    v = limbs_to_ints(out)
    return v[0], v[1]


def vec_bind_l(p: int, arr: np.ndarray, r: int) -> np.ndarray:
    """Bind the top variable: out = lo + r*(hi - lo) = (1-r)*lo + r*hi."""
    half = arr.shape[0] // 2
    return vec_fold_l(p, arr[:half], arr[half:], (1 - r) % p, r % p)


def poly_eval_horner_l(p: int, f: np.ndarray, u: int) -> int:
    """f(u) by Horner over a limb coefficient array (f[0] lowest degree)."""
    lib = _get_lib()
    ua = ints_to_limbs([u % p])
    out = np.zeros(4, dtype=np.uint64)
    ff = np.ascontiguousarray(f)
    lib.poly_eval_horner(_ctx(p), _ptr64(ff), ff.shape[0], _ptr64(ua), _ptr64(out))
    return int.from_bytes(out.astype("<u8").tobytes(), "little")


def poly_div_linear_l(p: int, f: np.ndarray, u: int) -> np.ndarray:
    """Quotient h = f // (x - u) (synthetic division), limb arrays."""
    lib = _get_lib()
    n = f.shape[0]
    assert n >= 2
    ua = ints_to_limbs([u % p])
    out = np.zeros((n - 1, 4), dtype=np.uint64)
    ff = np.ascontiguousarray(f)
    lib.poly_div_linear(_ctx(p), _ptr64(ff), n, _ptr64(ua), _ptr64(out))
    return out


def ntt_l(p: int, a: np.ndarray, root: int, invert: bool = False) -> np.ndarray:
    """Radix-2 NTT (in place on a copy) over 2^k limb entries; `root` is a
    primitive n-th root of unity. invert=True includes the 1/n scale."""
    lib = _get_lib()
    aa = np.ascontiguousarray(a).copy()
    n = aa.shape[0]
    assert n & (n - 1) == 0
    ra = ints_to_limbs([root % p])
    lib.ntt(_ctx(p), _ptr64(aa), n, _ptr64(ra), 1 if invert else 0)
    return aa


_inv_in = np.zeros(4, dtype=np.uint64)
_inv_out = np.zeros(4, dtype=np.uint64)
_inv_in_p = None
_inv_out_p = None


def keccak_f1600_lanes(lanes):
    """keccak-f[1600] on a 5x5 lane list via the C kernel."""
    a = np.zeros(25, dtype=np.uint64)
    for x in range(5):
        for y in range(5):
            a[x * 5 + y] = lanes[x][y]
    lib = _get_lib()
    lib.keccak_f1600(a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return [[int(a[x * 5 + y]) for y in range(5)] for x in range(5)]


def neutron_round_l(p: int, e1, e2, Az1, Bz1, Cz1, Az2, Bz2, Cz2,
                    left: int, right: int) -> list:
    """Neutron NIFS 5-point round sums (pre-eq-factor), limb arrays in."""
    ctx = _ctx(p)
    lib = _get_lib()
    out = np.zeros((5, 4), dtype=np.uint64)
    args = [np.ascontiguousarray(a) for a in (e1, e2, Az1, Bz1, Cz1, Az2, Bz2, Cz2)]
    lib.neutron_round(ctx, *[_ptr64(a) for a in args], left, right, _ptr64(out))
    return limbs_to_ints(out)


_poseidon_ctx_cache: dict = {}


def poseidon_ctx(p: int, width: int, half_full: int, partial: int,
                 crc, m, pre_sparse, sparse_matrixes):
    """Native Poseidon permutation context, cached per constants object."""
    # content-derived key covering the matrices too (constants bundles
    # differing only in MDS/sparse matrices must not alias)
    key = (p, width, half_full, partial, len(crc), crc[0], crc[-1],
           m[0][0], pre_sparse[0][0], len(sparse_matrixes),
           sparse_matrixes[0][0][0] if sparse_matrixes else 0)
    h = _poseidon_ctx_cache.get(key)
    if h is not None:
        return h
    ctx = _ctx(p)
    lib = _get_lib()
    crc_l = ints_to_limbs([x % p for x in crc])
    m_l = ints_to_limbs([m[i][j] % p for i in range(width) for j in range(width)])
    pre_l = ints_to_limbs(
        [pre_sparse[i][j] % p for i in range(width) for j in range(width)]
    )
    w_hats = []
    v_rests = []
    for w_hat, v_rest in sparse_matrixes:
        w_hats.extend(x % p for x in w_hat)
        v_rests.extend(x % p for x in v_rest)
    wh_l = ints_to_limbs(w_hats) if w_hats else np.zeros((1, 4), dtype=np.uint64)
    vr_l = ints_to_limbs(v_rests) if v_rests else np.zeros((1, 4), dtype=np.uint64)
    h = lib.poseidon_ctx_new(ctx, width, half_full, partial,
                             _ptr64(crc_l), len(crc), _ptr64(m_l), _ptr64(pre_l),
                             _ptr64(wh_l), _ptr64(vr_l))
    _poseidon_ctx_cache[key] = h
    return h


def poseidon_permute_witness(handle, p: int, elements, width: int,
                             full_rounds: int, partial: int,
                             compact: bool) -> tuple:
    """(final_state, alloc_values) of one permutation, alloc order matching
    the circuit gadget's flat witness plan."""
    lib = _get_lib()
    assert len(elements) == width, (len(elements), width)
    el = ints_to_limbs([x % p for x in elements])
    cap = 3 * (width * full_rounds + partial) + (
        partial * (width - 1) if compact else 0
    )
    allocs = np.zeros((cap, 4), dtype=np.uint64)
    na = lib.poseidon_permute_witness(handle, _ptr64(el), _ptr64(allocs),
                                      1 if compact else 0)
    assert na <= cap, (na, cap)
    return limbs_to_ints(el), limbs_to_ints(allocs[:na])


def poseidon_permute(handle, p: int, elements, width: int = None) -> list:
    lib = _get_lib()
    el = ints_to_limbs([x % p for x in elements])
    if width is not None:
        # the C kernel reads/writes exactly `width` rows; fail loudly here
        # instead of corrupting the heap
        assert len(elements) == width, (len(elements), width)
    lib.poseidon_permute(handle, _ptr64(el))
    return limbs_to_ints(el)


def inv_mod(p: int, a: int) -> int:
    """Scalar modular inverse via the native kernel (xgcd). Reuses static
    scratch buffers: single-threaded like the rest of the frontend."""
    global _inv_in_p, _inv_out_p
    ctx = _ctx(p)
    lib = _get_lib()
    if _inv_in_p is None:
        _inv_in_p = _ptr64(_inv_in)
        _inv_out_p = _ptr64(_inv_out)
    a %= p
    _inv_in[0] = a & 0xFFFFFFFFFFFFFFFF
    _inv_in[1] = (a >> 64) & 0xFFFFFFFFFFFFFFFF
    _inv_in[2] = (a >> 128) & 0xFFFFFFFFFFFFFFFF
    _inv_in[3] = a >> 192
    lib.inv_mod(ctx, _inv_in_p, _inv_out_p)
    o = _inv_out
    return int(o[0]) | (int(o[1]) << 64) | (int(o[2]) << 128) | (int(o[3]) << 192)


def vec_from_mont_l(p: int, aa: np.ndarray) -> np.ndarray:
    """Montgomery -> normal form on (n, 4) uint64 limbs (one REDC each)."""
    lib = _get_lib()
    a = np.ascontiguousarray(aa)
    out = np.empty_like(a)
    lib.vec_from_mont(_ctx(p), _ptr64(a), _ptr64(out), a.shape[0])
    return out


def vec_batch_inv_l(p: int, aa: np.ndarray) -> np.ndarray:
    """Batch modular inverse ((n,4) limbs in/out); zeros map to zero."""
    ctx = _ctx(p)
    lib = _get_lib()
    n = aa.shape[0]
    out = np.zeros((n, 4), dtype=np.uint64)
    lib.vec_batch_inv(ctx, _ptr64(np.ascontiguousarray(aa)), _ptr64(out), n)
    return out


def batch_inv_ints(p: int, vals) -> list:
    """Batch inverse on Python ints via the native kernel."""
    aa = ints_to_limbs([v % p for v in vals])
    return limbs_to_ints(vec_batch_inv_l(p, aa))


def vec_sat_check_l(p: int, az, bz, cz, e, u: int) -> int:
    """Count of rows where az*bz - u*cz - e != 0."""
    ctx = _ctx(p)
    lib = _get_lib()
    lib.vec_sat_check.restype = ctypes.c_size_t
    n = az.shape[0]
    uu = ints_to_limbs([u % p])
    return int(lib.vec_sat_check(ctx, _ptr64(np.ascontiguousarray(az)),
                                 _ptr64(np.ascontiguousarray(bz)),
                                 _ptr64(np.ascontiguousarray(cz)),
                                 _ptr64(np.ascontiguousarray(e)),
                                 _ptr64(uu), n))


def vec_dot_l(p: int, aa: np.ndarray, bb: np.ndarray) -> int:
    ctx = _ctx(p)
    lib = _get_lib()
    n = aa.shape[0]
    assert bb.shape[0] == n
    aa = np.ascontiguousarray(aa)
    bb = np.ascontiguousarray(bb)
    out = np.zeros(4, dtype=np.uint64)
    lib.vec_dot(ctx, _ptr64(aa), _ptr64(bb), _ptr64(out), n)
    return int.from_bytes(out.astype("<u8").tobytes(), "little")


def vec_invmod(p: int, a: Sequence[int]) -> List[int]:
    ctx = _ctx(p)
    lib = _get_lib()
    n = len(a)
    aa = ints_to_limbs([x % p for x in a])
    out = np.zeros((n, 4), dtype=np.uint64)
    lib.vec_invmod(ctx, _ptr64(aa), _ptr64(out), n)
    return limbs_to_ints(out)
