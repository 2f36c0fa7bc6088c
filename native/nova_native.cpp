// nova_native: host-side 256-bit field + short-Weierstrass (a=0) EC kernels.
//
// Replaces the reference's halo2curves x86_64-assembly field arithmetic
// (reference Cargo.toml:36-41) for the HOST side of the TPU framework:
// commitment-key folding/scaling (IPA), small/medium MSMs below the device
// dispatch threshold, and batch field ops that back witness-side math.
// The TPU device path (JAX/XLA kernels over 16-bit limb vectors) is
// independent; this library is the latency-optimized scalar companion.
//
// ABI: plain C. Field elements cross the boundary as 4x uint64 little-
// endian limbs in NORMAL (non-Montgomery) form; conversion happens inside.
// A Ctx is created per modulus (and optionally curve b) via ctx_new.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <algorithm>
#include <thread>

// Host thread count for the parallel phases (MSM windows, SpMV row
// chunks). Default 1: this build box is single-core; multi-core hosts
// opt in via NOVA_NATIVE_THREADS (the reference is rayon-parallel
// throughout, src/provider/msm.rs:237-419).
static int native_threads() {
  static int n = -1;
  if (n < 0) {
    const char* e = getenv("NOVA_NATIVE_THREADS");
    int v = e ? atoi(e) : 1;
    if (v < 1) v = 1;
    if (v > 64) v = 64;
    n = v;
  }
  return n;
}

typedef unsigned __int128 u128;
typedef uint64_t u64;

struct Ctx {
  u64 p[4];     // modulus
  u64 r1[4];    // 2^256 mod p        (Montgomery ONE)
  u64 r2[4];    // (2^256)^2 mod p
  u64 n0inv;    // -p^{-1} mod 2^64
  u64 b_mont[4];// curve b in Montgomery form (for on-curve checks; unused in group law)
  // 52-bit-limb mirror (radix 2^52, R' = 2^260) for the AVX-512 IFMA path
  u64 p52[5];   // modulus in 52-bit limbs
  u64 k052;     // -p^{-1} mod 2^52
  u64 one52[5]; // R' mod p   (Montgomery-52 ONE, canonical)
  u64 rr52[5];  // R'^2 mod p (canonical)
};

#define MASK52 ((1ULL << 52) - 1)

// ---------------------------------------------------------------------------
// 256-bit helpers (non-modular)
// ---------------------------------------------------------------------------

static inline int cmp256(const u64 a[4], const u64 b[4]) {
  for (int i = 3; i >= 0; i--) {
    if (a[i] < b[i]) return -1;
    if (a[i] > b[i]) return 1;
  }
  return 0;
}

static inline u64 add256(const u64 a[4], const u64 b[4], u64 out[4]) {
  u128 c = 0;
  for (int i = 0; i < 4; i++) {
    u128 s = (u128)a[i] + b[i] + c;
    out[i] = (u64)s;
    c = s >> 64;
  }
  return (u64)c;
}

static inline u64 sub256(const u64 a[4], const u64 b[4], u64 out[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a[i] - b[i] - borrow;
    out[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  return (u64)borrow;
}

// ---------------------------------------------------------------------------
// Montgomery field ops
// ---------------------------------------------------------------------------

static inline void fp_add(const Ctx& C, const u64 a[4], const u64 b[4], u64 out[4]) {
  u64 t[4];
  u64 carry = add256(a, b, t);
  u64 t2[4];
  u64 borrow = sub256(t, C.p, t2);
  if (carry || !borrow) memcpy(out, t2, 32); else memcpy(out, t, 32);
}

static inline void fp_sub(const Ctx& C, const u64 a[4], const u64 b[4], u64 out[4]) {
  u64 t[4];
  u64 borrow = sub256(a, b, t);
  if (borrow) add256(t, C.p, out); else memcpy(out, t, 32);
}

static inline void fp_mul(const Ctx& C, const u64 a[4], const u64 b[4], u64 out[4]) {
  // CIOS Montgomery multiplication, 4x64 limbs
#ifdef FP_MUL_HOOK
  FP_MUL_HOOK
#endif
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 cur = (u128)a[i] * b[j] + t[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (u64)cur;
    t[5] = (u64)(cur >> 64);

    u64 m = t[0] * C.n0inv;
    carry = ((u128)m * C.p[0] + t[0]) >> 64;
    for (int j = 1; j < 4; j++) {
      u128 cur2 = (u128)m * C.p[j] + t[j] + carry;
      t[j - 1] = (u64)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t[4] + carry;
    t[3] = (u64)cur3;
    t[4] = t[5] + (u64)(cur3 >> 64);
    t[5] = 0;
  }
  u64 res[4];
  u64 borrow = sub256(t, C.p, res);
  if (t[4] || !borrow) memcpy(out, res, 32); else memcpy(out, t, 32);
}

static inline void fp_sqr(const Ctx& C, const u64 a[4], u64 out[4]) {
  fp_mul(C, a, a, out);
}

static inline void fp_to_mont(const Ctx& C, const u64 a[4], u64 out[4]) {
  fp_mul(C, a, C.r2, out);
}

static inline void fp_from_mont(const Ctx& C, const u64 a[4], u64 out[4]) {
  u64 one[4] = {1, 0, 0, 0};
  fp_mul(C, a, one, out);
}

static inline bool fp_is_zero(const u64 a[4]) {
  return (a[0] | a[1] | a[2] | a[3]) == 0;
}

static void fp_pow(const Ctx& C, const u64 base[4], const u64 exp[4], u64 out[4]) {
  // out = base^exp (base in Montgomery form)
  u64 acc[4];
  memcpy(acc, C.r1, 32); // one
  bool started = false;
  for (int limb = 3; limb >= 0; limb--) {
    for (int bit = 63; bit >= 0; bit--) {
      if (started) fp_sqr(C, acc, acc);
      if ((exp[limb] >> bit) & 1) {
        if (started) fp_mul(C, acc, base, acc);
        else { memcpy(acc, base, 32); started = true; }
      }
    }
  }
  memcpy(out, acc, 32);
}

static void fp_inv(const Ctx& C, const u64 a[4], u64 out[4]) {
  // a^(p-2) via fp_pow
  u64 pm2[4];
  u64 two[4] = {2, 0, 0, 0};
  sub256(C.p, two, pm2);
  fp_pow(C, a, pm2, out);
}

// ---------------------------------------------------------------------------
// Scalar 52-bit-limb helpers (Montgomery radix 2^52, R' = 2^260). Companion
// to the AVX-512 IFMA vector core below; also used for per-bucket domain
// conversions. All outputs canonical [0, p).
// ---------------------------------------------------------------------------

static inline void limbs64_to_52(const u64 a[4], u64 o[5]) {
  o[0] = a[0] & MASK52;
  o[1] = ((a[0] >> 52) | (a[1] << 12)) & MASK52;
  o[2] = ((a[1] >> 40) | (a[2] << 24)) & MASK52;
  o[3] = ((a[2] >> 28) | (a[3] << 36)) & MASK52;
  o[4] = a[3] >> 16;
}

static inline void limbs52_to_64(const u64 a[5], u64 o[4]) {
  o[0] = a[0] | (a[1] << 52);
  o[1] = (a[1] >> 12) | (a[2] << 40);
  o[2] = (a[2] >> 24) | (a[3] << 28);
  o[3] = (a[3] >> 36) | (a[4] << 16);
}

static inline bool s52_is_zero(const u64 a[5]) {
  return (a[0] | a[1] | a[2] | a[3] | a[4]) == 0;
}

// out = (a - b) mod p, inputs canonical
static inline void s52_sub(const Ctx& C, const u64 a[5], const u64 b[5], u64 out[5]) {
  long long borrow = 0;
  u64 t[5];
  for (int i = 0; i < 5; i++) {
    long long d = (long long)a[i] - (long long)b[i] + borrow;
    t[i] = (u64)d & MASK52;
    borrow = d < 0 ? -1 : 0;
  }
  if (borrow) {
    u128 c = 0;
    for (int i = 0; i < 5; i++) {
      c += (u128)t[i] + C.p52[i];
      out[i] = (u64)c & MASK52;
      c >>= 52;
    }
  } else {
    memcpy(out, t, 40);
  }
}

static void s52_mont_mul(const Ctx& C, const u64 a[5], const u64 b[5], u64 out[5]) {
  u128 r[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 5; i++) {
    for (int j = 0; j < 5; j++) {
      u128 prod = (u128)a[i] * b[j];
      r[j]   += (u64)(prod & MASK52);
      r[j+1] += (u64)(prod >> 52);
    }
    u64 y = ((u64)r[0] * C.k052) & MASK52;
    for (int j = 0; j < 5; j++) {
      u128 prod = (u128)y * C.p52[j];
      r[j]   += (u64)(prod & MASK52);
      r[j+1] += (u64)(prod >> 52);
    }
    r[1] += (u64)(r[0] >> 52);
    for (int j = 0; j < 5; j++) r[j] = r[j+1];
    r[5] = 0;
  }
  u64 o[5];
  u128 c = 0;
  for (int i = 0; i < 5; i++) { c += r[i]; o[i] = (u64)(c & MASK52); c >>= 52; }
  long long borrow = 0;
  u64 t[5];
  for (int i = 0; i < 5; i++) {
    long long d = (long long)o[i] - (long long)C.p52[i] + borrow;
    t[i] = (u64)d & MASK52;
    borrow = d < 0 ? -1 : 0;
  }
  if (borrow == 0) memcpy(out, t, 40); else memcpy(out, o, 40);
}

// x (normal 64-limb) -> Montgomery-52
static inline void s52_to_mont(const Ctx& C, const u64 a[4], u64 out[5]) {
  u64 a52[5];
  limbs64_to_52(a, a52);
  s52_mont_mul(C, a52, C.rr52, out);
}

// Montgomery-52 -> normal 64-limb
static inline void s52_from_mont(const Ctx& C, const u64 a[5], u64 out[4]) {
  u64 one[5] = {1, 0, 0, 0, 0}, t[5];
  s52_mont_mul(C, a, one, t);
  limbs52_to_64(t, out);
}

// ---------------------------------------------------------------------------
// Jacobian EC (a = 0)
// ---------------------------------------------------------------------------

struct Jac { u64 X[4], Y[4], Z[4]; };  // Z == 0 => identity (Montgomery form)

static inline void jac_set_identity(Jac& P) { memset(&P, 0, sizeof(P)); }
static inline bool jac_is_identity(const Jac& P) { return fp_is_zero(P.Z); }

static void jac_dbl(const Ctx& C, const Jac& P, Jac& out) {
  if (jac_is_identity(P) || fp_is_zero(P.Y)) { jac_set_identity(out); return; }
  u64 A[4], B[4], Cc[4], D[4], E[4], F[4], t[4], t2[4];
  fp_sqr(C, P.X, A);
  fp_sqr(C, P.Y, B);
  fp_sqr(C, B, Cc);
  fp_add(C, P.X, B, t);
  fp_sqr(C, t, t);
  fp_sub(C, t, A, t);
  fp_sub(C, t, Cc, t);
  fp_add(C, t, t, D);
  fp_add(C, A, A, E);
  fp_add(C, E, A, E);
  fp_sqr(C, E, F);
  u64 X3[4], Y3[4], Z3[4];
  fp_add(C, D, D, t2);
  fp_sub(C, F, t2, X3);
  fp_sub(C, D, X3, t);
  fp_mul(C, E, t, t);
  u64 c8[4];
  fp_add(C, Cc, Cc, c8); fp_add(C, c8, c8, c8); fp_add(C, c8, c8, c8);
  fp_sub(C, t, c8, Y3);
  fp_mul(C, P.Y, P.Z, Z3);
  fp_add(C, Z3, Z3, Z3);
  memcpy(out.X, X3, 32); memcpy(out.Y, Y3, 32); memcpy(out.Z, Z3, 32);
}

static void jac_add(const Ctx& C, const Jac& P, const Jac& Q, Jac& out) {
  if (jac_is_identity(P)) { out = Q; return; }
  if (jac_is_identity(Q)) { out = P; return; }
  u64 Z1Z1[4], Z2Z2[4], U1[4], U2[4], S1[4], S2[4];
  fp_sqr(C, P.Z, Z1Z1);
  fp_sqr(C, Q.Z, Z2Z2);
  fp_mul(C, P.X, Z2Z2, U1);
  fp_mul(C, Q.X, Z1Z1, U2);
  fp_mul(C, P.Y, Q.Z, S1); fp_mul(C, S1, Z2Z2, S1);
  fp_mul(C, Q.Y, P.Z, S2); fp_mul(C, S2, Z1Z1, S2);
  u64 H[4], R[4];
  fp_sub(C, U2, U1, H);
  fp_sub(C, S2, S1, R);
  if (fp_is_zero(H)) {
    if (fp_is_zero(R)) { jac_dbl(C, P, out); return; }
    jac_set_identity(out); return;
  }
  u64 I[4], J[4], V[4], t[4];
  fp_add(C, H, H, t); fp_sqr(C, t, I);      // I = (2H)^2
  fp_mul(C, H, I, J);                        // J = H*I
  fp_add(C, R, R, R);                        // r = 2*(S2-S1)
  fp_mul(C, U1, I, V);                       // V = U1*I
  u64 X3[4], Y3[4], Z3[4];
  fp_sqr(C, R, X3);
  fp_sub(C, X3, J, X3);
  fp_add(C, V, V, t);
  fp_sub(C, X3, t, X3);
  fp_sub(C, V, X3, t);
  fp_mul(C, R, t, Y3);
  u64 t2[4];
  fp_mul(C, S1, J, t2); fp_add(C, t2, t2, t2);
  fp_sub(C, Y3, t2, Y3);
  fp_add(C, P.Z, Q.Z, Z3);
  fp_sqr(C, Z3, Z3);
  fp_sub(C, Z3, Z1Z1, Z3);
  fp_sub(C, Z3, Z2Z2, Z3);
  fp_mul(C, Z3, H, Z3);
  memcpy(out.X, X3, 32); memcpy(out.Y, Y3, 32); memcpy(out.Z, Z3, 32);
}

// mixed add: Q affine (Montgomery coords), q_inf flag
static void jac_madd(const Ctx& C, const Jac& P, const u64 qx[4], const u64 qy[4],
                     bool q_inf, Jac& out) {
  if (q_inf) { out = P; return; }
  if (jac_is_identity(P)) {
    memcpy(out.X, qx, 32); memcpy(out.Y, qy, 32); memcpy(out.Z, C.r1, 32);
    return;
  }
  u64 Z1Z1[4], U2[4], S2[4];
  fp_sqr(C, P.Z, Z1Z1);
  fp_mul(C, qx, Z1Z1, U2);
  fp_mul(C, qy, P.Z, S2); fp_mul(C, S2, Z1Z1, S2);
  u64 H[4], R[4];
  fp_sub(C, U2, P.X, H);
  fp_sub(C, S2, P.Y, R);
  if (fp_is_zero(H)) {
    if (fp_is_zero(R)) { jac_dbl(C, P, out); return; }
    jac_set_identity(out); return;
  }
  u64 HH[4], I[4], J[4], V[4], t[4];
  fp_sqr(C, H, HH);
  fp_add(C, HH, HH, I); fp_add(C, I, I, I); // I = 4*HH
  fp_mul(C, H, I, J);
  fp_add(C, R, R, R); // r = 2*(S2-Y1)
  fp_mul(C, P.X, I, V);
  u64 X3[4], Y3[4], Z3[4];
  fp_sqr(C, R, X3);
  fp_sub(C, X3, J, X3);
  fp_add(C, V, V, t);
  fp_sub(C, X3, t, X3);
  fp_sub(C, V, X3, t);
  fp_mul(C, R, t, Y3);
  u64 t2[4];
  fp_mul(C, P.Y, J, t2); fp_add(C, t2, t2, t2);
  fp_sub(C, Y3, t2, Y3);
  fp_add(C, P.Z, H, Z3);
  fp_sqr(C, Z3, Z3);
  fp_sub(C, Z3, Z1Z1, Z3);
  fp_sub(C, Z3, HH, Z3);
  memcpy(out.X, X3, 32); memcpy(out.Y, Y3, 32); memcpy(out.Z, Z3, 32);
}

// scalar: 4x64 LE limbs (plain integer, NOT Montgomery)
static void jac_scalar_mul(const Ctx& C, const u64 px[4], const u64 py[4],
                           bool p_inf, const u64 k[4], Jac& out) {
  jac_set_identity(out);
  if (p_inf) return;
  int top = 255;
  while (top >= 0 && !((k[top / 64] >> (top % 64)) & 1)) top--;
  for (int bit = top; bit >= 0; bit--) {
    jac_dbl(C, out, out);
    if ((k[bit / 64] >> (bit % 64)) & 1) jac_madd(C, out, px, py, false, out);
  }
}

// batch Jacobian -> affine via Montgomery-trick inversion (in Montgomery domain)
static void batch_to_affine(const Ctx& C, std::vector<Jac>& pts,
                            u64* xs, u64* ys, uint8_t* inf) {
  size_t n = pts.size();
  std::vector<u64> prefix(4 * (n + 1));
  memcpy(&prefix[0], C.r1, 32);
  for (size_t i = 0; i < n; i++) {
    const u64* prev = &prefix[4 * i];
    u64* cur = &prefix[4 * (i + 1)];
    if (jac_is_identity(pts[i])) memcpy(cur, prev, 32);
    else fp_mul(C, prev, pts[i].Z, cur);
  }
  u64 acc[4];
  fp_inv(C, &prefix[4 * n], acc);
  for (size_t ii = n; ii-- > 0;) {
    if (jac_is_identity(pts[ii])) {
      inf[ii] = 1;
      memset(xs + 4 * ii, 0, 32);
      memset(ys + 4 * ii, 0, 32);
      continue;
    }
    u64 zinv[4];
    fp_mul(C, acc, &prefix[4 * ii], zinv);       // 1/Z_ii
    fp_mul(C, acc, pts[ii].Z, acc);              // strip Z_ii from acc
    u64 zinv2[4], zinv3[4], ax[4], ay[4];
    fp_sqr(C, zinv, zinv2);
    fp_mul(C, zinv2, zinv, zinv3);
    fp_mul(C, pts[ii].X, zinv2, ax);
    fp_mul(C, pts[ii].Y, zinv3, ay);
    fp_from_mont(C, ax, xs + 4 * ii);
    fp_from_mont(C, ay, ys + 4 * ii);
    inf[ii] = 0;
  }
}

// ---------------------------------------------------------------------------
// Scheduled batched-affine signed-digit Pippenger (reference algorithm
// family: src/provider/msm.rs signed decomposition + batch_add). Per
// window, points are counting-sorted by bucket, then each bucket's run is
// reduced by pairwise affine additions; all pairs of a round (across all
// buckets) share ONE modular inversion via the Montgomery trick, so an
// effective point add costs ~6 field muls with no scatter conflicts.
// ---------------------------------------------------------------------------

// ---------------------------------------------------------------------------
// AVX-512 IFMA vector field core: 8 independent field elements per op,
// 52-bit limbs (radix 2^52, Montgomery R' = 2^260), canonical [0, p)
// in/out. Used by the MSM pair phase; runtime-dispatched.
// ---------------------------------------------------------------------------
#if defined(__x86_64__)
#include <immintrin.h>
#pragma GCC push_options
#pragma GCC target("avx512f,avx512dq,avx512ifma,avx512vl,avx512bw")

struct V52 { __m512i l[5]; };

static inline V52 v52_bcast(const u64 a[5]) {
  V52 r;
  for (int l = 0; l < 5; l++) r.l[l] = _mm512_set1_epi64((long long)a[l]);
  return r;
}

// gather 8 rows (row-major (n,5) u64 array) by u32 row indices
static inline V52 v52_gather(const u64* base, const uint32_t* idx) {
  __m256i i32 = _mm256_loadu_si256((const __m256i*)idx);
  __m512i i64 = _mm512_cvtepu32_epi64(i32);
  __m512i i5 = _mm512_add_epi64(_mm512_slli_epi64(i64, 2), i64);  // idx*5
  V52 r;
  for (int l = 0; l < 5; l++)
    r.l[l] = _mm512_i64gather_epi64(
        _mm512_add_epi64(i5, _mm512_set1_epi64(l)), (const long long*)base, 8);
  return r;
}

static inline void v52_scatter(u64* base, const uint32_t* idx, const V52& v,
                               __mmask8 m) {
  __m256i i32 = _mm256_loadu_si256((const __m256i*)idx);
  __m512i i64 = _mm512_cvtepu32_epi64(i32);
  __m512i i5 = _mm512_add_epi64(_mm512_slli_epi64(i64, 2), i64);
  for (int l = 0; l < 5; l++)
    _mm512_mask_i64scatter_epi64((long long*)base, m,
        _mm512_add_epi64(i5, _mm512_set1_epi64(l)), v.l[l], 8);
}

static inline void v52_store_blk(u64* dst, const V52& v) {
  for (int l = 0; l < 5; l++) _mm512_storeu_si512((__m512i*)(dst + 8 * l), v.l[l]);
}

static inline V52 v52_load_blk(const u64* srcp) {
  V52 r;
  for (int l = 0; l < 5; l++) r.l[l] = _mm512_loadu_si512((const __m512i*)(srcp + 8 * l));
  return r;
}

static inline __mmask8 v52_iszero(const V52& a) {
  __m512i acc = _mm512_or_epi64(_mm512_or_epi64(a.l[0], a.l[1]),
                                _mm512_or_epi64(a.l[2], a.l[3]));
  acc = _mm512_or_epi64(acc, a.l[4]);
  return _mm512_cmpeq_epu64_mask(acc, _mm512_setzero_si512());
}

static inline V52 v52_blend(__mmask8 m, const V52& a, const V52& b) {
  // lane = m ? b : a
  V52 r;
  for (int l = 0; l < 5; l++) r.l[l] = _mm512_mask_blend_epi64(m, a.l[l], b.l[l]);
  return r;
}

// canonical conditional-subtract-p tail shared by mul/add
static inline V52 v52_cond_sub_p(const Ctx& C, __m512i r0, __m512i r1, __m512i r2,
                                 __m512i r3, __m512i r4) {
  const __m512i m52 = _mm512_set1_epi64(MASK52);
  __m512i p0 = _mm512_set1_epi64((long long)C.p52[0]);
  __m512i p1 = _mm512_set1_epi64((long long)C.p52[1]);
  __m512i p2 = _mm512_set1_epi64((long long)C.p52[2]);
  __m512i p3 = _mm512_set1_epi64((long long)C.p52[3]);
  __m512i p4 = _mm512_set1_epi64((long long)C.p52[4]);
  __m512i t0 = _mm512_sub_epi64(r0, p0);
  __m512i b0 = _mm512_srli_epi64(t0, 63);
  t0 = _mm512_and_epi64(t0, m52);
  __m512i t1 = _mm512_sub_epi64(_mm512_sub_epi64(r1, p1), b0);
  __m512i b1 = _mm512_srli_epi64(t1, 63);
  t1 = _mm512_and_epi64(t1, m52);
  __m512i t2 = _mm512_sub_epi64(_mm512_sub_epi64(r2, p2), b1);
  __m512i b2 = _mm512_srli_epi64(t2, 63);
  t2 = _mm512_and_epi64(t2, m52);
  __m512i t3 = _mm512_sub_epi64(_mm512_sub_epi64(r3, p3), b2);
  __m512i b3 = _mm512_srli_epi64(t3, 63);
  t3 = _mm512_and_epi64(t3, m52);
  __m512i t4 = _mm512_sub_epi64(_mm512_sub_epi64(r4, p4), b3);
  __mmask8 lt = _mm512_movepi64_mask(t4);  // sign set => value < p => keep r
  t4 = _mm512_and_epi64(t4, m52);
  V52 out;
  out.l[0] = _mm512_mask_blend_epi64(lt, t0, r0);
  out.l[1] = _mm512_mask_blend_epi64(lt, t1, r1);
  out.l[2] = _mm512_mask_blend_epi64(lt, t2, r2);
  out.l[3] = _mm512_mask_blend_epi64(lt, t3, r3);
  out.l[4] = _mm512_mask_blend_epi64(lt, t4, r4);
  return out;
}

static inline V52 v52_mont_mul(const Ctx& C, const V52& a, const V52& b) {
  const __m512i zero = _mm512_setzero_si512();
  __m512i r0 = zero, r1 = zero, r2 = zero, r3 = zero, r4 = zero, r5 = zero;
  const __m512i k0 = _mm512_set1_epi64((long long)C.k052);
  const __m512i p0 = _mm512_set1_epi64((long long)C.p52[0]);
  const __m512i p1 = _mm512_set1_epi64((long long)C.p52[1]);
  const __m512i p2 = _mm512_set1_epi64((long long)C.p52[2]);
  const __m512i p3 = _mm512_set1_epi64((long long)C.p52[3]);
  const __m512i p4 = _mm512_set1_epi64((long long)C.p52[4]);
  for (int i = 0; i < 5; i++) {
    __m512i ai = a.l[i];
    r0 = _mm512_madd52lo_epu64(r0, ai, b.l[0]);
    r1 = _mm512_madd52lo_epu64(r1, ai, b.l[1]);
    r2 = _mm512_madd52lo_epu64(r2, ai, b.l[2]);
    r3 = _mm512_madd52lo_epu64(r3, ai, b.l[3]);
    r4 = _mm512_madd52lo_epu64(r4, ai, b.l[4]);
    r1 = _mm512_madd52hi_epu64(r1, ai, b.l[0]);
    r2 = _mm512_madd52hi_epu64(r2, ai, b.l[1]);
    r3 = _mm512_madd52hi_epu64(r3, ai, b.l[2]);
    r4 = _mm512_madd52hi_epu64(r4, ai, b.l[3]);
    r5 = _mm512_madd52hi_epu64(r5, ai, b.l[4]);
    __m512i y = _mm512_madd52lo_epu64(zero, r0, k0);
    r0 = _mm512_madd52lo_epu64(r0, y, p0);
    __m512i c = _mm512_srli_epi64(r0, 52);
    r1 = _mm512_add_epi64(r1, c);
    r1 = _mm512_madd52hi_epu64(r1, y, p0);
    r1 = _mm512_madd52lo_epu64(r1, y, p1);
    r2 = _mm512_madd52hi_epu64(r2, y, p1);
    r2 = _mm512_madd52lo_epu64(r2, y, p2);
    r3 = _mm512_madd52hi_epu64(r3, y, p2);
    r3 = _mm512_madd52lo_epu64(r3, y, p3);
    r4 = _mm512_madd52hi_epu64(r4, y, p3);
    r4 = _mm512_madd52lo_epu64(r4, y, p4);
    r5 = _mm512_madd52hi_epu64(r5, y, p4);
    r0 = r1; r1 = r2; r2 = r3; r3 = r4; r4 = r5; r5 = zero;
  }
  const __m512i m52 = _mm512_set1_epi64(MASK52);
  __m512i c;
  c = _mm512_srli_epi64(r0, 52); r0 = _mm512_and_epi64(r0, m52); r1 = _mm512_add_epi64(r1, c);
  c = _mm512_srli_epi64(r1, 52); r1 = _mm512_and_epi64(r1, m52); r2 = _mm512_add_epi64(r2, c);
  c = _mm512_srli_epi64(r2, 52); r2 = _mm512_and_epi64(r2, m52); r3 = _mm512_add_epi64(r3, c);
  c = _mm512_srli_epi64(r3, 52); r3 = _mm512_and_epi64(r3, m52); r4 = _mm512_add_epi64(r4, c);
  return v52_cond_sub_p(C, r0, r1, r2, r3, r4);
}

static inline V52 v52_add(const Ctx& C, const V52& a, const V52& b) {
  const __m512i m52 = _mm512_set1_epi64(MASK52);
  __m512i s0 = _mm512_add_epi64(a.l[0], b.l[0]);
  __m512i s1 = _mm512_add_epi64(a.l[1], b.l[1]);
  __m512i s2 = _mm512_add_epi64(a.l[2], b.l[2]);
  __m512i s3 = _mm512_add_epi64(a.l[3], b.l[3]);
  __m512i s4 = _mm512_add_epi64(a.l[4], b.l[4]);
  __m512i c;
  c = _mm512_srli_epi64(s0, 52); s0 = _mm512_and_epi64(s0, m52); s1 = _mm512_add_epi64(s1, c);
  c = _mm512_srli_epi64(s1, 52); s1 = _mm512_and_epi64(s1, m52); s2 = _mm512_add_epi64(s2, c);
  c = _mm512_srli_epi64(s2, 52); s2 = _mm512_and_epi64(s2, m52); s3 = _mm512_add_epi64(s3, c);
  c = _mm512_srli_epi64(s3, 52); s3 = _mm512_and_epi64(s3, m52); s4 = _mm512_add_epi64(s4, c);
  return v52_cond_sub_p(C, s0, s1, s2, s3, s4);
}

static inline V52 v52_sub(const Ctx& C, const V52& a, const V52& b) {
  const __m512i m52 = _mm512_set1_epi64(MASK52);
  // t = a - b with borrow chain
  __m512i t0 = _mm512_sub_epi64(a.l[0], b.l[0]);
  __m512i b0 = _mm512_srli_epi64(t0, 63);
  t0 = _mm512_and_epi64(t0, m52);
  __m512i t1 = _mm512_sub_epi64(_mm512_sub_epi64(a.l[1], b.l[1]), b0);
  __m512i b1 = _mm512_srli_epi64(t1, 63);
  t1 = _mm512_and_epi64(t1, m52);
  __m512i t2 = _mm512_sub_epi64(_mm512_sub_epi64(a.l[2], b.l[2]), b1);
  __m512i b2 = _mm512_srli_epi64(t2, 63);
  t2 = _mm512_and_epi64(t2, m52);
  __m512i t3 = _mm512_sub_epi64(_mm512_sub_epi64(a.l[3], b.l[3]), b2);
  __m512i b3 = _mm512_srli_epi64(t3, 63);
  t3 = _mm512_and_epi64(t3, m52);
  __m512i t4 = _mm512_sub_epi64(_mm512_sub_epi64(a.l[4], b.l[4]), b3);
  __mmask8 neg = _mm512_movepi64_mask(t4);  // borrow out => add p back
  t4 = _mm512_and_epi64(t4, m52);
  // u = t + p (only used for neg lanes)
  __m512i u0 = _mm512_add_epi64(t0, _mm512_set1_epi64((long long)C.p52[0]));
  __m512i u1 = _mm512_add_epi64(t1, _mm512_set1_epi64((long long)C.p52[1]));
  __m512i u2 = _mm512_add_epi64(t2, _mm512_set1_epi64((long long)C.p52[2]));
  __m512i u3 = _mm512_add_epi64(t3, _mm512_set1_epi64((long long)C.p52[3]));
  __m512i u4 = _mm512_add_epi64(t4, _mm512_set1_epi64((long long)C.p52[4]));
  __m512i c;
  c = _mm512_srli_epi64(u0, 52); u0 = _mm512_and_epi64(u0, m52); u1 = _mm512_add_epi64(u1, c);
  c = _mm512_srli_epi64(u1, 52); u1 = _mm512_and_epi64(u1, m52); u2 = _mm512_add_epi64(u2, c);
  c = _mm512_srli_epi64(u2, 52); u2 = _mm512_and_epi64(u2, m52); u3 = _mm512_add_epi64(u3, c);
  c = _mm512_srli_epi64(u3, 52); u3 = _mm512_and_epi64(u3, m52); u4 = _mm512_add_epi64(u4, c);
  u4 = _mm512_and_epi64(u4, m52);
  V52 out;
  out.l[0] = _mm512_mask_blend_epi64(neg, t0, u0);
  out.l[1] = _mm512_mask_blend_epi64(neg, t1, u1);
  out.l[2] = _mm512_mask_blend_epi64(neg, t2, u2);
  out.l[3] = _mm512_mask_blend_epi64(neg, t3, u3);
  out.l[4] = _mm512_mask_blend_epi64(neg, t4, u4);
  return out;
}

#pragma GCC pop_options
#endif  // __x86_64__

// One pairwise affine-addition round over all bucket segments.
// bufs alternate between rounds (pair writes would clobber later reads
// in-place).
struct PairRound {
  uint32_t dst;      // output slot
  uint8_t kind;      // 0 add, 1 dbl
};

// Pair-round scratch. Operands are STASHED at classify time (when their
// cache lines are hot) so the later passes stream sequentially instead of
// chasing bucket-ordered slots; the inversion runs per 1024-pair chunk so
// each chunk's working set stays L1/L2-resident across all four passes.
struct PairScratch {
  std::vector<PairRound> pairs;
  std::vector<u64> dens, nums, pax, pay, pbx, prefix;
  void ensure(size_t np) {
    if (4 * np > dens.size()) {
      dens.resize(4 * np); nums.resize(4 * np);
      pax.resize(4 * np); pay.resize(4 * np); pbx.resize(4 * np);
    }
  }
};

static const size_t PAIR_CHUNK = 1024;

static void msm_pair_rounds(const Ctx& C, size_t nb,
                            std::vector<u64>& ax, std::vector<u64>& ay,
                            std::vector<u64>& bx_, std::vector<u64>& by_,
                            std::vector<uint32_t>& seg_start,
                            std::vector<uint32_t>& seg_len,
                            PairScratch& S) {
  size_t max_len = 0;
  for (size_t b = 0; b < nb; b++) max_len = std::max(max_len, (size_t)seg_len[b]);
  const u64* cx = ax.data();
  const u64* cy = ay.data();
  u64* nx = bx_.data();
  u64* ny = by_.data();
  if (S.prefix.size() < 4 * (PAIR_CHUNK + 1)) S.prefix.resize(4 * (PAIR_CHUNK + 1));
  while (max_len >= 2) {
    S.pairs.clear();
    // pairs per round are bounded by half the live slots, NOT by
    // max_len/2 per bucket times nb (skewed bucket distributions would
    // blow that product up to multi-GB allocations)
    size_t cap_pairs = ax.size() / 8 + nb + 8;
    S.ensure(cap_pairs);
    // classify: build pair list, stash operands, copy lone points/carries
    for (size_t b = 0; b < nb; b++) {
      uint32_t s = seg_start[b], k = seg_len[b];
      if (k == 0) continue;
      if (k == 1) {
        memcpy(nx + 4 * s, cx + 4 * s, 32);
        memcpy(ny + 4 * s, cy + 4 * s, 32);
        continue;
      }
      uint32_t out = 0;
      for (uint32_t t = 0; t + 1 < k; t += 2) {
        uint32_t i1 = s + t, i2 = s + t + 1;
        size_t pi = S.pairs.size();
        u64* den = &S.dens[4 * pi];
        u64* num = &S.nums[4 * pi];
        u64 dx[4];
        fp_sub(C, cx + 4 * i2, cx + 4 * i1, dx);
        if (fp_is_zero(dx)) {
          u64 dy[4];
          fp_sub(C, cy + 4 * i2, cy + 4 * i1, dy);
          if (!fp_is_zero(dy)) continue;  // P + (-P): cancels, no output
          fp_add(C, cy + 4 * i1, cy + 4 * i1, den);  // 2y
          u64 xsq[4], t3[4];
          fp_sqr(C, cx + 4 * i1, xsq);
          fp_add(C, xsq, xsq, t3);
          fp_add(C, t3, xsq, num);                   // 3x^2
          S.pairs.push_back(PairRound{s + out, 1});
        } else {
          memcpy(den, dx, 32);
          fp_sub(C, cy + 4 * i2, cy + 4 * i1, num);
          S.pairs.push_back(PairRound{s + out, 0});
        }
        memcpy(&S.pax[4 * pi], cx + 4 * i1, 32);
        memcpy(&S.pbx[4 * pi], cx + 4 * i2, 32);
        memcpy(&S.pay[4 * pi], cy + 4 * i1, 32);
        out++;
      }
      if (k & 1) {
        memcpy(nx + 4 * (s + out), cx + 4 * (s + k - 1), 32);
        memcpy(ny + 4 * (s + out), cy + 4 * (s + k - 1), 32);
        out++;
      }
      seg_len[b] = out;
    }
    // batched EC math, one inversion per chunk
    size_t np = S.pairs.size();
    for (size_t c0 = 0; c0 < np; c0 += PAIR_CHUNK) {
      size_t cn = std::min(PAIR_CHUNK, np - c0);
      u64* prefix = S.prefix.data();
      memcpy(prefix, C.r1, 32);
      for (size_t i = 0; i < cn; i++)
        fp_mul(C, prefix + 4 * i, &S.dens[4 * (c0 + i)], prefix + 4 * (i + 1));
      u64 acc[4];
      fp_inv(C, prefix + 4 * cn, acc);
      // descending: dinv_i overwrites dens slot (streaming)
      for (size_t ii = cn; ii-- > 0;) {
        u64 dinv[4];
        fp_mul(C, acc, prefix + 4 * ii, dinv);
        fp_mul(C, acc, &S.dens[4 * (c0 + ii)], acc);
        memcpy(&S.dens[4 * (c0 + ii)], dinv, 32);
      }
      // ascending: EC formulas, all operands sequential
      for (size_t i = 0; i < cn; i++) {
        size_t pi = c0 + i;
        const PairRound& pr = S.pairs[pi];
        u64 lam[4], x3[4], y3[4], t[4];
        fp_mul(C, &S.nums[4 * pi], &S.dens[4 * pi], lam);
        fp_sqr(C, lam, x3);
        fp_sub(C, x3, &S.pax[4 * pi], x3);
        fp_sub(C, x3, &S.pbx[4 * pi], x3);
        fp_sub(C, &S.pax[4 * pi], x3, t);
        fp_mul(C, lam, t, y3);
        fp_sub(C, y3, &S.pay[4 * pi], y3);
        memcpy(nx + 4 * pr.dst, x3, 32);
        memcpy(ny + 4 * pr.dst, y3, 32);
      }
    }
    std::swap(ax, bx_); std::swap(ay, by_);
    cx = ax.data(); cy = ay.data();
    nx = bx_.data(); ny = by_.data();
    max_len = 0;
    for (size_t b = 0; b < nb; b++) max_len = std::max(max_len, (size_t)seg_len[b]);
  }
}

#if defined(__x86_64__)
#pragma GCC push_options
#pragma GCC target("avx512f,avx512dq,avx512ifma,avx512vl,avx512bw")

#include <chrono>
#include <cstdio>
static double g_t_classify, g_t_fwd, g_t_inv, g_t_bwd, g_t_sort, g_t_bucket, g_t_conv;
static long g_n_pairs, g_n_rounds;

// IFMA pair-phase scratch: pairs as stashed operands in blocked 8-lane
// layout (block j, limb l at offset (j*5 + l)*8) plus dst slot indices.
// Operands are stashed at classify time (scalar, cache-hot) so the vector
// passes run on aligned loads with no gathers.
struct IfmaPairScratch {
  std::vector<uint32_t> dst, alive;
  std::vector<u64> dens, nums, sx1, sx2, sy1, sy2, pp;
  std::vector<uint8_t> livemask;
  void ensure_pairs(size_t np8) {
    size_t nblk = np8 / 8;
    if (dst.size() < np8) dst.resize(np8);
    size_t need = nblk * 40;
    if (dens.size() < need) {
      dens.resize(need); nums.resize(need); sx1.resize(need);
      sx2.resize(need); sy1.resize(need); sy2.resize(need); pp.resize(need);
    }
    if (livemask.size() < nblk) livemask.resize(nblk);
  }
};

static const int NCHAIN = 4;  // interleaved inversion chains (latency hiding)

// One full tree-reduction (all rounds) of bucket segments, 8 pairs per
// vector op, one modular inversion per round shared across all pairs via
// 32 parallel Montgomery chains (4 vector accumulators x 8 lanes).
// Arrays are (cap,5) row-major 52-limb canonical Montgomery; `dead` flags
// mark cancelled (P + -P) slots.
static void msm_pair_rounds_ifma(const Ctx& C, size_t nb,
                                 std::vector<u64>& ax, std::vector<u64>& ay,
                                 std::vector<u64>& bx_, std::vector<u64>& by_,
                                 std::vector<uint8_t>& dead_a,
                                 std::vector<uint8_t>& dead_b,
                                 std::vector<uint32_t>& seg_start,
                                 std::vector<uint32_t>& seg_len,
                                 IfmaPairScratch& S,
                                 const u64* base_x, const u64* base_y,
                                 const u64* base_yneg,
                                 const uint32_t* slot_src) {
  const V52 one_vec = v52_bcast(C.one52);
  // Round 1 sources operands straight from the (pre-negated) base tables
  // via slot_src, so the counting sort never copies point rows.
  bool first = true;
  while (true) {
    auto tt0 = std::chrono::steady_clock::now();
    // ---- classify: collect pairs over alive slots, stash operands ----
    memset(dead_b.data(), 0, dead_b.size());
    size_t np = 0;
    u64* nx = bx_.data();
    u64* ny = by_.data();
    const u64* cx = ax.data();
    const u64* cy = ay.data();
    for (size_t b = 0; b < nb; b++) {
      uint32_t s = seg_start[b], k = seg_len[b];
      if (k == 0) continue;
      size_t m;
      uint32_t* alive_p;
      if (first) {
        m = k;                      // all slots alive in round 1
        alive_p = NULL;
      } else {
        S.alive.clear();
        for (uint32_t t = 0; t < k; t++)
          if (!dead_a[s + t]) S.alive.push_back(s + t);
        m = S.alive.size();
        alive_p = S.alive.data();
      }
      uint32_t out = 0;
      if (m >= 2) {
        S.ensure_pairs(((np + m / 2) / 8 + 2) * 8);
        for (size_t t = 0; t + 1 < m; t += 2) {
          const u64 *r1, *r2, *q1, *q2;
          if (first) {
            uint32_t s1 = slot_src[s + t], s2 = slot_src[s + t + 1];
            r1 = base_x + 5 * (s1 & 0x7fffffff);
            q1 = ((s1 >> 31) ? base_yneg : base_y) + 5 * (s1 & 0x7fffffff);
            r2 = base_x + 5 * (s2 & 0x7fffffff);
            q2 = ((s2 >> 31) ? base_yneg : base_y) + 5 * (s2 & 0x7fffffff);
          } else {
            uint32_t i1 = alive_p[t], i2 = alive_p[t + 1];
            r1 = cx + 5 * i1;
            q1 = cy + 5 * i1;
            r2 = cx + 5 * i2;
            q2 = cy + 5 * i2;
          }
          size_t blk = np / 8, lane = np & 7;
          u64* bx1 = &S.sx1[blk * 40 + lane];
          u64* bx2 = &S.sx2[blk * 40 + lane];
          u64* by1 = &S.sy1[blk * 40 + lane];
          u64* by2 = &S.sy2[blk * 40 + lane];
          for (int l = 0; l < 5; l++) {
            bx1[8 * l] = r1[l];
            bx2[8 * l] = r2[l];
            by1[8 * l] = q1[l];
            by2[8 * l] = q2[l];
          }
          S.dst[np] = s + out;
          np++; out++;
        }
      }
      if (m & 1) {
        const u64 *rs, *qs;
        if (first) {
          uint32_t sl = slot_src[s + m - 1];
          rs = base_x + 5 * (sl & 0x7fffffff);
          qs = ((sl >> 31) ? base_yneg : base_y) + 5 * (sl & 0x7fffffff);
        } else {
          uint32_t srci = alive_p[m - 1];
          rs = cx + 5 * srci;
          qs = cy + 5 * srci;
        }
        memcpy(nx + 5 * (s + out), rs, 40);
        memcpy(ny + 5 * (s + out), qs, 40);
        out++;
      }
      seg_len[b] = out;
    }
    first = false;
    if (np == 0) {
      std::swap(ax, bx_); std::swap(ay, by_);
      std::swap(dead_a, dead_b);
      break;
    }
    size_t np8 = (np + 7) & ~(size_t)7;
    S.ensure_pairs(np8);
    if (np & 7) {  // pad tail lanes with lane-0 operands of the last block
      size_t blk = np / 8;
      for (size_t i = np; i < np8; i++) {
        size_t lane = i & 7;
        for (int l = 0; l < 5; l++) {
          S.sx1[blk * 40 + 8 * l + lane] = S.sx1[blk * 40 + 8 * l];
          S.sx2[blk * 40 + 8 * l + lane] = S.sx2[blk * 40 + 8 * l];
          S.sy1[blk * 40 + 8 * l + lane] = S.sy1[blk * 40 + 8 * l];
          S.sy2[blk * 40 + 8 * l + lane] = S.sy2[blk * 40 + 8 * l];
        }
        S.dst[i] = 0;
      }
    }
    size_t nblk = np8 / 8;
    g_n_pairs += (long)np; g_n_rounds++;
    g_t_classify += std::chrono::duration<double, std::milli>(std::chrono::steady_clock::now() - tt0).count();
    tt0 = std::chrono::steady_clock::now();

    // ---- forward: lane classification + interleaved prefix chains ----
    V52 PPc[NCHAIN];
    for (int t = 0; t < NCHAIN; t++) PPc[t] = one_vec;
    for (size_t j = 0; j < nblk; j++) {
      V52 X1 = v52_load_blk(&S.sx1[j * 40]);
      V52 X2 = v52_load_blk(&S.sx2[j * 40]);
      V52 Y1 = v52_load_blk(&S.sy1[j * 40]);
      V52 Y2 = v52_load_blk(&S.sy2[j * 40]);
      V52 DX = v52_sub(C, X2, X1);
      V52 DY = v52_sub(C, Y2, Y1);
      V52 den = DX, num = DY;
      __mmask8 pad = (j == nblk - 1 && (np & 7))
                         ? (__mmask8)(0xFF << (np & 7)) : (__mmask8)0;
      __mmask8 z = v52_iszero(DX);
      __mmask8 cancel = 0;
      if (z) {
        __mmask8 dbl = z & v52_iszero(DY);
        // pad lanes replicate a real lane's operands; they must NOT mark
        // their dst (slot 0) dead, so exclude them from `cancel`.
        cancel = z & (__mmask8)~dbl & (__mmask8)~pad;
        if (dbl) {
          V52 twoY = v52_add(C, Y1, Y1);
          V52 XX = v52_mont_mul(C, X1, X1);
          V52 thrXX = v52_add(C, v52_add(C, XX, XX), XX);
          den = v52_blend(dbl, den, twoY);
          num = v52_blend(dbl, num, thrXX);
        }
      }
      __mmask8 deadlanes = cancel | pad;
      if (deadlanes) {
        den = v52_blend(deadlanes, den, one_vec);
        for (int k2 = 0; k2 < 8; k2++)
          if ((cancel >> k2) & 1) dead_b[S.dst[8 * j + k2]] = 1;
      }
      S.livemask[j] = (uint8_t)~deadlanes;
      v52_store_blk(&S.dens[j * 40], den);
      v52_store_blk(&S.nums[j * 40], num);
      int ch = (int)(j % NCHAIN);
      PPc[ch] = v52_mont_mul(C, PPc[ch], den);
      v52_store_blk(&S.pp[j * 40], PPc[ch]);
    }

    g_t_fwd += std::chrono::duration<double, std::milli>(std::chrono::steady_clock::now() - tt0).count();
    tt0 = std::chrono::steady_clock::now();
    // ---- per-lane chain-total inverses (scalar, once per round) ----
    {
      int nch = (int)(nblk < (size_t)NCHAIN ? nblk : (size_t)NCHAIN);
      int total = 8 * nch;
      u64 T[8 * NCHAIN][5], q[8 * NCHAIN][5];
      u64 buf[40];
      for (int t = 0; t < nch; t++) {
        v52_store_blk(buf, PPc[t]);
        for (int k2 = 0; k2 < 8; k2++)
          for (int l = 0; l < 5; l++) T[t * 8 + k2][l] = buf[l * 8 + k2];
      }
      memcpy(q[0], T[0], 40);
      for (int k2 = 1; k2 < total; k2++) s52_mont_mul(C, q[k2 - 1], T[k2], q[k2]);
      u64 g64[4], gm64[4], gi[4], gin[4], inv52[5];
      s52_from_mont(C, q[total - 1], g64);
      fp_to_mont(C, g64, gm64);
      fp_inv(C, gm64, gi);
      fp_from_mont(C, gi, gin);
      s52_to_mont(C, gin, inv52);
      u64 invT[8 * NCHAIN][5];
      for (int k2 = total - 1; k2 >= 0; k2--) {
        if (k2 > 0) s52_mont_mul(C, inv52, q[k2 - 1], invT[k2]);
        else memcpy(invT[0], inv52, 40);
        s52_mont_mul(C, inv52, T[k2], inv52);
      }
      for (int t = 0; t < nch; t++) {
        for (int k2 = 0; k2 < 8; k2++)
          for (int l = 0; l < 5; l++) buf[l * 8 + k2] = invT[t * 8 + k2][l];
        PPc[t] = v52_load_blk(buf);  // reuse as inv_cum per chain
      }
    }

    g_t_inv += std::chrono::duration<double, std::milli>(std::chrono::steady_clock::now() - tt0).count();
    tt0 = std::chrono::steady_clock::now();
    // ---- backward: per-pair inverses, complete the adds ----
    for (size_t j = nblk; j-- > 0;) {
      int ch = (int)(j % NCHAIN);
      V52 den = v52_load_blk(&S.dens[j * 40]);
      V52 PPprev = (j >= (size_t)NCHAIN) ? v52_load_blk(&S.pp[(j - NCHAIN) * 40])
                                         : one_vec;
      V52 dinv = v52_mont_mul(C, PPc[ch], PPprev);
      PPc[ch] = v52_mont_mul(C, PPc[ch], den);
      V52 num = v52_load_blk(&S.nums[j * 40]);
      V52 X1 = v52_load_blk(&S.sx1[j * 40]);
      V52 X2 = v52_load_blk(&S.sx2[j * 40]);
      V52 Y1 = v52_load_blk(&S.sy1[j * 40]);
      V52 lam = v52_mont_mul(C, num, dinv);
      V52 L2 = v52_mont_mul(C, lam, lam);
      V52 X3 = v52_sub(C, v52_sub(C, L2, X1), X2);
      V52 Tt = v52_sub(C, X1, X3);
      V52 Y3 = v52_sub(C, v52_mont_mul(C, lam, Tt), Y1);
      __mmask8 live = S.livemask[j];
      v52_scatter(nx, &S.dst[8 * j], X3, live);
      v52_scatter(ny, &S.dst[8 * j], Y3, live);
    }
    g_t_bwd += std::chrono::duration<double, std::milli>(std::chrono::steady_clock::now() - tt0).count();
    std::swap(ax, bx_); std::swap(ay, by_);
    std::swap(dead_a, dead_b);
  }
}

// ---------------------------------------------------------------------------
// Vectorized bucket combine: 8 XYZZ lane-chains over the bucket array,
// then a scalar weighted lane merge. Lane k accumulates buckets
// b = 8t + k for t = m-1..0 into running T_k and weighted wsum_k
// (a bucket added at step t survives t+1 wsum additions, so
// wsum_k = sum_t (t+1) B_{8t+k}); the window sum is
//   sum_b (b+1) B_b = 8 * sum_k wsum_k - sum_k (7-k) T_k.
// Degenerate lane adds (equal x) set a flag and the caller falls back to
// the scalar chain for that window (adversarial bucket collisions).
// ---------------------------------------------------------------------------
#pragma GCC push_options
#pragma GCC target("avx512f,avx512dq,avx512ifma,avx512vl,avx512bw")

extern "C" void inv_mod(Ctx* C, const u64 a[4], u64 out[4]);

struct VXYZZ { V52 X, Y, ZZ, ZZZ; __mmask8 live; };

// returns true on success, false when a degenerate add was flagged
static bool bucket_combine_ifma(Ctx* C, size_t nb,
                                const std::vector<u64>& bx_rows,
                                const std::vector<u64>& by_rows,
                                const std::vector<uint8_t>& occ_rows,
                                Jac& total_out) {
  Jac total;
  jac_set_identity(total);
  size_t m = nb / 8;
  const V52 zero_v = v52_bcast((const u64[5]){0, 0, 0, 0, 0});
  VXYZZ run, ws;
  run.X = run.Y = run.ZZ = run.ZZZ = zero_v;
  ws.X = ws.Y = ws.ZZ = ws.ZZZ = zero_v;
  run.live = 0;
  ws.live = 0;
  __mmask8 bad = 0;
  u64 blk[40];
  for (size_t t = m; t-- > 0;) {
    // load 8 bucket points (lane k = bucket 8t + k)
    __mmask8 occ = 0;
    V52 Bx, By;
    for (int l = 0; l < 5; l++) {
      for (int k = 0; k < 8; k++) blk[8 * l + k] = bx_rows[5 * (8 * t + k) + l];
    }
    Bx = v52_load_blk(blk);
    for (int l = 0; l < 5; l++) {
      for (int k = 0; k < 8; k++) blk[8 * l + k] = by_rows[5 * (8 * t + k) + l];
    }
    By = v52_load_blk(blk);
    for (int k = 0; k < 8; k++) occ |= (occ_rows[8 * t + k] ? 1 : 0) << k;

    if (occ) {
      // running += B (mixed add; identity lanes assign)
      __mmask8 fresh = occ & (__mmask8)~run.live;
      __mmask8 addm = occ & run.live;
      if (addm) {
        V52 U2 = v52_mont_mul(*C, Bx, run.ZZ);
        V52 S2 = v52_mont_mul(*C, By, run.ZZZ);
        V52 Pd = v52_sub(*C, U2, run.X);
        V52 Rd = v52_sub(*C, S2, run.Y);
        bad |= addm & v52_iszero(Pd);
        V52 PP = v52_mont_mul(*C, Pd, Pd);
        V52 PPP = v52_mont_mul(*C, Pd, PP);
        V52 Q = v52_mont_mul(*C, run.X, PP);
        V52 R2 = v52_mont_mul(*C, Rd, Rd);
        V52 X3 = v52_sub(*C, v52_sub(*C, R2, PPP), v52_add(*C, Q, Q));
        V52 Y3 = v52_sub(*C, v52_mont_mul(*C, Rd, v52_sub(*C, Q, X3)),
                         v52_mont_mul(*C, run.Y, PPP));
        V52 ZZ3 = v52_mont_mul(*C, run.ZZ, PP);
        V52 ZZZ3 = v52_mont_mul(*C, run.ZZZ, PPP);
        run.X = v52_blend(addm, run.X, X3);
        run.Y = v52_blend(addm, run.Y, Y3);
        run.ZZ = v52_blend(addm, run.ZZ, ZZ3);
        run.ZZZ = v52_blend(addm, run.ZZZ, ZZZ3);
      }
      if (fresh) {
        const V52 one_v = v52_bcast(C->one52);
        run.X = v52_blend(fresh, run.X, Bx);
        run.Y = v52_blend(fresh, run.Y, By);
        run.ZZ = v52_blend(fresh, run.ZZ, one_v);
        run.ZZZ = v52_blend(fresh, run.ZZZ, one_v);
        run.live |= fresh;
      }
    }
    // wsum += running (full XYZZ add; identity lanes assign)
    __mmask8 fresh2 = run.live & (__mmask8)~ws.live;
    __mmask8 addm2 = run.live & ws.live;
    if (addm2) {
      V52 U1 = v52_mont_mul(*C, ws.X, run.ZZ);
      V52 U2 = v52_mont_mul(*C, run.X, ws.ZZ);
      V52 S1 = v52_mont_mul(*C, ws.Y, run.ZZZ);
      V52 S2 = v52_mont_mul(*C, run.Y, ws.ZZZ);
      V52 Pd = v52_sub(*C, U2, U1);
      V52 Rd = v52_sub(*C, S2, S1);
      __mmask8 pz = addm2 & v52_iszero(Pd);
      __mmask8 dblm = pz & v52_iszero(Rd);
      bad |= pz & (__mmask8)~dblm;  // true cancellation: fall back
      V52 PP = v52_mont_mul(*C, Pd, Pd);
      V52 PPP = v52_mont_mul(*C, Pd, PP);
      V52 Q = v52_mont_mul(*C, U1, PP);
      V52 R2 = v52_mont_mul(*C, Rd, Rd);
      V52 X3 = v52_sub(*C, v52_sub(*C, R2, PPP), v52_add(*C, Q, Q));
      V52 Y3 = v52_sub(*C, v52_mont_mul(*C, Rd, v52_sub(*C, Q, X3)),
                       v52_mont_mul(*C, S1, PPP));
      V52 ZZc = v52_mont_mul(*C, ws.ZZ, run.ZZ);
      V52 ZZ3 = v52_mont_mul(*C, ZZc, PP);
      V52 ZZZc = v52_mont_mul(*C, ws.ZZZ, run.ZZZ);
      V52 ZZZ3 = v52_mont_mul(*C, ZZZc, PPP);
      __mmask8 addonly = addm2 & (__mmask8)~dblm;
      ws.X = v52_blend(addonly, ws.X, X3);
      ws.Y = v52_blend(addonly, ws.Y, Y3);
      ws.ZZ = v52_blend(addonly, ws.ZZ, ZZ3);
      ws.ZZZ = v52_blend(addonly, ws.ZZZ, ZZZ3);
      if (dblm) {
        // XYZZ doubling of ws (== running on those lanes): U=2Y, V=U^2,
        // W=U*V, S=X*V, M=3X^2, X3=M^2-2S, Y3=M*(S-X3)-W*Y, ZZ*=V, ZZZ*=W
        V52 U = v52_add(*C, ws.Y, ws.Y);
        V52 V = v52_mont_mul(*C, U, U);
        V52 W = v52_mont_mul(*C, U, V);
        V52 Sd = v52_mont_mul(*C, ws.X, V);
        V52 XX = v52_mont_mul(*C, ws.X, ws.X);
        V52 M = v52_add(*C, v52_add(*C, XX, XX), XX);
        V52 M2 = v52_mont_mul(*C, M, M);
        V52 X3d = v52_sub(*C, M2, v52_add(*C, Sd, Sd));
        V52 Y3d = v52_sub(*C, v52_mont_mul(*C, M, v52_sub(*C, Sd, X3d)),
                          v52_mont_mul(*C, W, ws.Y));
        V52 ZZ3d = v52_mont_mul(*C, V, ws.ZZ);
        V52 ZZZ3d = v52_mont_mul(*C, W, ws.ZZZ);
        ws.X = v52_blend(dblm, ws.X, X3d);
        ws.Y = v52_blend(dblm, ws.Y, Y3d);
        ws.ZZ = v52_blend(dblm, ws.ZZ, ZZ3d);
        ws.ZZZ = v52_blend(dblm, ws.ZZZ, ZZZ3d);
      }
    }
    if (fresh2) {
      ws.X = v52_blend(fresh2, ws.X, run.X);
      ws.Y = v52_blend(fresh2, ws.Y, run.Y);
      ws.ZZ = v52_blend(fresh2, ws.ZZ, run.ZZ);
      ws.ZZZ = v52_blend(fresh2, ws.ZZZ, run.ZZZ);
      ws.live |= fresh2;
    }
  }
  if (bad) return false;

  // extract lanes, convert to 64-limb Montgomery Jacobian, combine:
  // S = 8 * sum_k wsum_k - sum_k (7-k) T_k
  auto lane_to_jac = [&](const VXYZZ& v, int k, Jac& out) -> bool {
    if (!((v.live >> k) & 1)) { jac_set_identity(out); return true; }
    u64 buf2[40];
    u64 x52[5], y52[5], zz52[5], zzz52[5];
    v52_store_blk(buf2, v.X);
    for (int l = 0; l < 5; l++) x52[l] = buf2[8 * l + k];
    v52_store_blk(buf2, v.Y);
    for (int l = 0; l < 5; l++) y52[l] = buf2[8 * l + k];
    v52_store_blk(buf2, v.ZZ);
    for (int l = 0; l < 5; l++) zz52[l] = buf2[8 * l + k];
    v52_store_blk(buf2, v.ZZZ);
    for (int l = 0; l < 5; l++) zzz52[l] = buf2[8 * l + k];
    // affine: x = X/ZZ, y = Y/ZZZ (normal-form math via 64-limb kernels)
    u64 xn[4], yn[4], zzn[4], zzzn[4];
    s52_from_mont(*C, x52, xn);
    s52_from_mont(*C, y52, yn);
    s52_from_mont(*C, zz52, zzn);
    s52_from_mont(*C, zzz52, zzzn);
    u64 zzi[4], zzzi[4];
    inv_mod(C, zzn, zzi);
    inv_mod(C, zzzn, zzzi);
    u64 xm[4], ym[4], t1[4], t2[4];
    fp_to_mont(*C, xn, t1);
    fp_to_mont(*C, zzi, t2);
    fp_mul(*C, t1, t2, xm);          // (x*R)(zzi*R)R^-1 = x*zzi*R: Montgomery
    fp_to_mont(*C, yn, t1);
    fp_to_mont(*C, zzzi, t2);
    fp_mul(*C, t1, t2, ym);
    Jac j;
    jac_set_identity(j);
    jac_madd(*C, j, xm, ym, false, j);
    out = j;
    return true;
  };
  // lane-chain algebra: wsum_k = sum_t (t+1) B_{8t+k} (a bucket added at
  // step t survives t+1 wsum additions), T_k = sum_t B_{8t+k}, so
  //   sum_b (b+1) B_b = 8 * sum_k wsum_k - sum_k (7-k) * T_k.
  Jac wsum_total;
  jac_set_identity(wsum_total);
  for (int k = 0; k < 8; k++) {
    Jac Tk, Wk;
    lane_to_jac(run, k, Tk);
    lane_to_jac(ws, k, Wk);
    jac_add(*C, wsum_total, Wk, wsum_total);
    u64 w = (u64)(7 - k);
    if (w && !jac_is_identity(Tk)) {
      // subtract w * Tk: negate Y, double-and-add (w <= 7)
      u64 negY[4];
      fp_sub(*C, C->p, Tk.Y, negY);  // negation is domain-agnostic mod p
      memcpy(Tk.Y, negY, 32);
      Jac acc;
      jac_set_identity(acc);
      for (int bit = 2; bit >= 0; bit--) {
        jac_dbl(*C, acc, acc);
        if ((w >> bit) & 1) jac_add(*C, acc, Tk, acc);
      }
      jac_add(*C, total, acc, total);
    }
  }
  // total += 8 * wsum_total
  jac_dbl(*C, wsum_total, wsum_total);
  jac_dbl(*C, wsum_total, wsum_total);
  jac_dbl(*C, wsum_total, wsum_total);
  jac_add(*C, total, wsum_total, total);
  jac_add(*C, total_out, total, total_out);
  return true;
}

#pragma GCC pop_options

// Full window loop for the IFMA path: points live as (n,5) 52-limb
// canonical Montgomery rows end to end; buckets convert to the 64-limb
// Jacobian domain only for the final running/weighted reduction.
static void msm_windows_ifma(Ctx* C, const std::vector<u64>& xs_n,
                             const std::vector<u64>& ys_n, size_t live,
                             const std::vector<int16_t>& digits, int W, int c,
                             size_t nb, Jac& total) {
  bool prof = getenv("NOVA_MSM_PROF") != NULL;
  g_t_classify = g_t_fwd = g_t_inv = g_t_bwd = g_t_sort = g_t_bucket = g_t_conv = 0;
  g_n_pairs = g_n_rounds = 0;
  auto tc0 = std::chrono::steady_clock::now();
  // 52-limb split (scalar shifts) + vectorized to-Montgomery (x, -y premul)
  std::vector<u64> mx52(5 * live), my52(5 * live), myneg52(5 * live);
  {
    u64 buf[40];
    const V52 rr = v52_bcast(C->rr52);
    for (int coord = 0; coord < 2; coord++) {
      const std::vector<u64>& srcv = coord ? ys_n : xs_n;
      std::vector<u64>& dstv = coord ? my52 : mx52;
      for (size_t i0 = 0; i0 < live; i0 += 8) {
        size_t cnt = live - i0 < 8 ? live - i0 : 8;
        for (size_t k = 0; k < cnt; k++) {
          u64 t52[5];
          limbs64_to_52(&srcv[4 * (i0 + k)], t52);
          for (int l = 0; l < 5; l++) buf[8 * l + k] = t52[l];
        }
        for (size_t k = cnt; k < 8; k++)
          for (int l = 0; l < 5; l++) buf[8 * l + k] = 0;
        V52 v = v52_mont_mul(*C, v52_load_blk(buf), rr);
        v52_store_blk(buf, v);
        for (size_t k = 0; k < cnt; k++)
          for (int l = 0; l < 5; l++) dstv[5 * (i0 + k) + l] = buf[8 * l + k];
      }
    }
    const u64 zero52[5] = {0, 0, 0, 0, 0};
    for (size_t i = 0; i < live; i++)
      s52_sub(*C, zero52, &my52[5 * i], &myneg52[5 * i]);
  }
  g_t_conv += std::chrono::duration<double, std::milli>(std::chrono::steady_clock::now() - tc0).count();
  // Per-window partial sums are independent; compute them (optionally on
  // a thread pool, NOVA_NATIVE_THREADS) and fold with the radix doublings
  // serially afterwards. Each worker owns its full scratch set.
  struct WinScratch {
    std::vector<u64> ax, ay, bxx, byy, brow_x, brow_y;
    std::vector<uint8_t> dead_a, dead_b, brow_occ;
    std::vector<uint32_t> seg_start, seg_len, cursor, slot_src;
    IfmaPairScratch scratch;
  };
  const bool prof_serial = prof && native_threads() == 1;
  auto run_window = [&](int w, WinScratch& S, Jac& wsum) {
    auto tw0 = std::chrono::steady_clock::now();
    std::fill(S.seg_len.begin(), S.seg_len.end(), 0);
    for (size_t i = 0; i < live; i++) {
      int d = digits[(size_t)i * W + w];
      if (d) S.seg_len[(d < 0 ? -d : d) - 1]++;
    }
    uint32_t acc_off = 0;
    for (size_t b = 0; b < nb; b++) {
      S.seg_start[b] = acc_off;
      S.cursor[b] = acc_off;
      acc_off += S.seg_len[b];
    }
    memset(S.dead_a.data(), 0, live);
    for (size_t i = 0; i < live; i++) {
      int d = digits[(size_t)i * W + w];
      if (!d) continue;
      uint32_t b = (uint32_t)((d < 0 ? -d : d) - 1);
      S.slot_src[S.cursor[b]++] = (uint32_t)i | (d < 0 ? 0x80000000u : 0);
    }
    if (prof_serial)
      g_t_sort += std::chrono::duration<double, std::milli>(std::chrono::steady_clock::now() - tw0).count();
    msm_pair_rounds_ifma(*C, nb, S.ax, S.ay, S.bxx, S.byy, S.dead_a, S.dead_b,
                         S.seg_start, S.seg_len, S.scratch,
                         mx52.data(), my52.data(), myneg52.data(),
                         S.slot_src.data());
    tw0 = std::chrono::steady_clock::now();
    // collect bucket values (52-limb Montgomery rows) + occupancy
    S.brow_x.resize(5 * nb);
    S.brow_y.resize(5 * nb);
    S.brow_occ.assign(nb, 0);
    for (size_t b = 0; b < nb; b++) {
      uint32_t s = S.seg_start[b], k = S.seg_len[b];
      for (uint32_t t = 0; t < k; t++) {
        if (S.dead_a[s + t]) continue;
        memcpy(&S.brow_x[5 * b], &S.ax[5 * (s + t)], 40);
        memcpy(&S.brow_y[5 * b], &S.ay[5 * (s + t)], 40);
        S.brow_occ[b] = 1;
        break;
      }
    }
    jac_set_identity(wsum);
    if (nb < 16 || !bucket_combine_ifma(C, nb, S.brow_x, S.brow_y, S.brow_occ, wsum)) {
      // scalar fallback (tiny nb, or a degenerate lane add was flagged)
      Jac running;
      jac_set_identity(running);
      jac_set_identity(wsum);
      for (size_t b = nb; b-- > 0;) {
        if (S.brow_occ[b]) {
          u64 x64[4], y64[4], xm[4], ym[4];
          s52_from_mont(*C, &S.brow_x[5 * b], x64);
          s52_from_mont(*C, &S.brow_y[5 * b], y64);
          fp_to_mont(*C, x64, xm);
          fp_to_mont(*C, y64, ym);
          jac_madd(*C, running, xm, ym, false, running);
        }
        jac_add(*C, wsum, running, wsum);
      }
    }
    if (prof_serial)
      g_t_bucket += std::chrono::duration<double, std::milli>(std::chrono::steady_clock::now() - tw0).count();
  };
  auto make_scratch = [&](WinScratch& S) {
    S.ax.resize(5 * live); S.ay.resize(5 * live);
    S.bxx.resize(5 * live); S.byy.resize(5 * live);
    S.dead_a.resize(live); S.dead_b.resize(live);
    S.seg_start.resize(nb); S.seg_len.resize(nb);
    S.cursor.resize(nb); S.slot_src.resize(live);
  };
  std::vector<Jac> wsums(W);
  int T = std::min(native_threads(), W);
  if (T <= 1) {
    WinScratch S;
    make_scratch(S);
    for (int w = 0; w < W; w++) run_window(w, S, wsums[w]);
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < T; t++)
      pool.emplace_back([&, t]() {
        WinScratch S;
        make_scratch(S);
        for (int w = t; w < W; w += T) run_window(w, S, wsums[w]);
      });
    for (auto& th : pool) th.join();
  }
  for (int w = W - 1; w >= 0; w--) {
    for (int d = 0; d < c; d++) jac_dbl(*C, total, total);
    jac_add(*C, total, wsums[w], total);
  }
  if (prof)
    fprintf(stderr,
            "[msm_ifma] conv %.1f sort %.1f classify %.1f fwd %.1f inv %.1f "
            "bwd %.1f bucket %.1f ms; pairs %ld rounds %ld\n",
            g_t_conv, g_t_sort, g_t_classify, g_t_fwd, g_t_inv, g_t_bwd,
            g_t_bucket, g_n_pairs, g_n_rounds);
}

#pragma GCC pop_options

static bool ifma_available() {
  static int ok = -1;
  if (ok < 0)
    ok = (__builtin_cpu_supports("avx512ifma") &&
          __builtin_cpu_supports("avx512vl") &&
          __builtin_cpu_supports("avx512dq") &&
          getenv("NOVA_NO_IFMA") == NULL) ? 1 : 0;
  return ok == 1;
}
#else
static bool ifma_available() { return false; }
#endif  // __x86_64__

// Core MSM over selected bases. idx == NULL selects bases 0..n-1.
static void msm_core(Ctx* C, const u64* xs, const u64* ys, const uint8_t* inf,
                     const u64* scalars, const uint32_t* idx, size_t n,
                     u64 out_x[4], u64 out_y[4], uint8_t* out_inf) {
  // gather live (non-infinity, nonzero-scalar) points in NORMAL form
  std::vector<u64> gx, gy, sc;
  gx.reserve(4 * n); gy.reserve(4 * n); sc.reserve(4 * n);
  for (size_t i = 0; i < n; i++) {
    size_t src = idx ? idx[i] : i;
    const u64* k = scalars + 4 * i;
    if (inf[src]) continue;
    if ((k[0] | k[1] | k[2] | k[3]) == 0) continue;
    gx.insert(gx.end(), xs + 4 * src, xs + 4 * src + 4);
    gy.insert(gy.end(), ys + 4 * src, ys + 4 * src + 4);
    sc.insert(sc.end(), k, k + 4);
  }
  size_t live = sc.size() / 4;
  if (live == 0) {
    *out_inf = 1;
    memset(out_x, 0, 32); memset(out_y, 0, 32);
    return;
  }

  // max scalar bit-width: small-valued vectors (Spark oracles, counts,
  // bit decompositions; reference msm_small, src/provider/msm.rs:469) get
  // proportionally fewer windows.
  int max_bits = 0;
  for (size_t i = 0; i < live; i++) {
    const u64* k = &sc[4 * i];
    for (int limb = 3; limb >= 0; limb--) {
      if (k[limb]) {
        int b = limb * 64 + 64 - __builtin_clzll(k[limb]);
        if (b > max_bits) max_bits = b;
        break;
      }
    }
  }
  if (max_bits == 0) max_bits = 1;

  // pick window size minimizing the measured-cost model (ns):
  bool ifma = ifma_available();
  double k_pair = ifma ? 100.0 : 500.0;
  double k_bkt = ifma ? 380.0 : 810.0;  // vectorized bucket chains
  int c_best = 4;
  double cost_best = 1e300;
  for (int c = 4; c <= 15; c++) {
    int W = (max_bits + c - 1) / c + 1;
    double cost = k_pair * (double)live * W + k_bkt * (double)(1 << (c - 1)) * W;
    if (cost < cost_best) { cost_best = cost; c_best = c; }
  }
  int c = c_best;
  if (const char* cenv = getenv("NOVA_MSM_C")) {
    int cf = atoi(cenv);
    if (cf >= 2 && cf <= 15) c = cf;  // 16 would overflow the int16 digits
  }
  int W = (max_bits + c - 1) / c + 1;
  size_t nb = (size_t)1 << (c - 1);
  int half = 1 << (c - 1);
  u64 mask = ((u64)1 << c) - 1;

  // signed digits
  std::vector<int16_t> digits((size_t)live * W, 0);
  for (size_t i = 0; i < live; i++) {
    const u64* k = &sc[4 * i];
    int carry = 0;
    for (int w = 0; w < W; w++) {
      int bit_lo = w * c;
      u64 raw = 0;
      if (bit_lo < 256) {
        int limb = bit_lo / 64, ofs = bit_lo % 64;
        raw = k[limb] >> ofs;
        if (ofs + c > 64 && limb + 1 < 4) raw |= k[limb + 1] << (64 - ofs);
        raw &= mask;
      }
      int d = (int)raw + carry;
      if (d > half) { d -= (1 << c); carry = 1; } else carry = 0;
      digits[(size_t)i * W + w] = (int16_t)d;
    }
  }

  Jac total_ifma;
  if (ifma_available()) {
    jac_set_identity(total_ifma);
    msm_windows_ifma(C, gx, gy, live, digits, W, c, nb, total_ifma);
    if (jac_is_identity(total_ifma)) {
      *out_inf = 1;
      memset(out_x, 0, 32); memset(out_y, 0, 32);
      return;
    }
    std::vector<Jac> one_v(1, total_ifma);
    batch_to_affine(*C, one_v, out_x, out_y, out_inf);
    return;
  }

  // scalar fallback path: Montgomery-convert the gathered points
  std::vector<u64> mx(4 * live), my(4 * live);
  for (size_t i = 0; i < live; i++) {
    fp_to_mont(*C, &gx[4 * i], &mx[4 * i]);
    fp_to_mont(*C, &gy[4 * i], &my[4 * i]);
  }

  // window scratch (double-buffered for the pair rounds)
  std::vector<u64> ax(4 * live), ay(4 * live), bxx(4 * live), byy(4 * live);
  std::vector<uint32_t> seg_start(nb), seg_len(nb), cursor(nb);
  PairScratch scratch;
  scratch.pairs.reserve(live / 2 + 1);
  scratch.ensure(live / 2 + 1);

  Jac total; jac_set_identity(total);
  for (int w = W - 1; w >= 0; w--) {
    for (int d = 0; d < c; d++) jac_dbl(*C, total, total);
    // counting sort by bucket, materializing signed affine points
    std::fill(seg_len.begin(), seg_len.end(), 0);
    for (size_t i = 0; i < live; i++) {
      int d = digits[(size_t)i * W + w];
      if (d) seg_len[(d < 0 ? -d : d) - 1]++;
    }
    uint32_t acc_off = 0;
    for (size_t b = 0; b < nb; b++) {
      seg_start[b] = acc_off;
      cursor[b] = acc_off;
      acc_off += seg_len[b];
    }
    for (size_t i = 0; i < live; i++) {
      int d = digits[(size_t)i * W + w];
      if (!d) continue;
      uint32_t b = (uint32_t)((d < 0 ? -d : d) - 1);
      uint32_t pos = cursor[b]++;
      memcpy(&ax[4 * pos], &mx[4 * i], 32);
      if (d < 0) fp_sub(*C, C->p, &my[4 * i], &ay[4 * pos]);
      else memcpy(&ay[4 * pos], &my[4 * i], 32);
    }
    msm_pair_rounds(*C, nb, ax, ay, bxx, byy, seg_start, seg_len, scratch);
    // running/weighted bucket reduction (buckets hold <=1 affine point)
    Jac running, wsum;
    jac_set_identity(running);
    jac_set_identity(wsum);
    for (size_t b = nb; b-- > 0;) {
      if (seg_len[b])
        jac_madd(*C, running, &ax[4 * seg_start[b]], &ay[4 * seg_start[b]],
                 false, running);
      jac_add(*C, wsum, running, wsum);
    }
    jac_add(*C, total, wsum, total);
  }

  if (jac_is_identity(total)) {
    *out_inf = 1;
    memset(out_x, 0, 32); memset(out_y, 0, 32);
    return;
  }
  std::vector<Jac> one(1, total);
  batch_to_affine(*C, one, out_x, out_y, out_inf);
}


// ---------------------------------------------------------------------------
// extern "C" API
// ---------------------------------------------------------------------------

extern "C" {

Ctx* ctx_new(const u64 p[4]) {
  Ctx* C = new Ctx();
  memcpy(C->p, p, 32);
  // r1 = 2^256 mod p by repeated doubling of (2^255 mod p)... simpler:
  // start with t = p with top bit handling: compute 2^256 mod p by shifting 1 left 256 times mod p
  u64 t[4] = {1, 0, 0, 0};
  for (int i = 0; i < 256; i++) {
    // t = 2t mod p
    u64 t2[4];
    u64 carry = add256(t, t, t2);
    u64 t3[4];
    u64 borrow = sub256(t2, C->p, t3);
    if (carry || !borrow) memcpy(t, t3, 32); else memcpy(t, t2, 32);
  }
  memcpy(C->r1, t, 32);
  // r2 = (2^256)^2 mod p: square r1 by doubling r1 256 times
  u64 r2[4];
  memcpy(r2, t, 32);
  for (int i = 0; i < 256; i++) {
    u64 t2[4];
    u64 carry = add256(r2, r2, t2);
    u64 t3[4];
    u64 borrow = sub256(t2, C->p, t3);
    if (carry || !borrow) memcpy(r2, t3, 32); else memcpy(r2, t2, 32);
  }
  memcpy(C->r2, r2, 32);
  // 52-bit-limb mirror
  limbs64_to_52(C->p, C->p52);
  {
    u64 x2 = 1;
    for (int i = 0; i < 6; i++) x2 = x2 * (2 - C->p52[0] * x2);
    C->k052 = (u64)(0 - x2) & MASK52;
    u64 one[5] = {1, 0, 0, 0, 0};
    auto dbl_mod52 = [&](u64 v[5]) {
      u128 c = 0;
      for (int i = 0; i < 5; i++) {
        c += ((u128)v[i]) << 1;
        v[i] = (u64)(c & MASK52);
        c >>= 52;
      }
      long long borrow = 0;
      u64 t52[5];
      for (int i = 0; i < 5; i++) {
        long long d = (long long)v[i] - (long long)C->p52[i] + borrow;
        t52[i] = (u64)d & MASK52;
        borrow = d < 0 ? -1 : 0;
      }
      if (borrow == 0) memcpy(v, t52, 40);
    };
    for (int i = 0; i < 260; i++) dbl_mod52(one);
    memcpy(C->one52, one, 40);
    u64 rr[5];
    memcpy(rr, one, 40);
    for (int i = 0; i < 260; i++) dbl_mod52(rr);
    memcpy(C->rr52, rr, 40);
  }
  // n0inv = -p^{-1} mod 2^64 (Newton iteration)
  u64 pinv = C->p[0];           // p odd: p^{-1} mod 2 is 1; iterate
  for (int i = 0; i < 6; i++) pinv *= 2 - C->p[0] * pinv;
  C->n0inv = (u64)(0 - pinv);
  memset(C->b_mont, 0, 32);
  return C;
}

void ctx_free(Ctx* C) { delete C; }

void vec_mulmod(Ctx* C, const u64* a, const u64* b, u64* out, size_t n) {
  u64 am[4], bm[4], r[4];
  for (size_t i = 0; i < n; i++) {
    fp_to_mont(*C, a + 4 * i, am);
    fp_to_mont(*C, b + 4 * i, bm);
    fp_mul(*C, am, bm, r);
    fp_from_mont(*C, r, out + 4 * i);
  }
}

void vec_addmod(Ctx* C, const u64* a, const u64* b, u64* out, size_t n) {
  for (size_t i = 0; i < n; i++) fp_add(*C, a + 4 * i, b + 4 * i, out + 4 * i);
}

void vec_submod(Ctx* C, const u64* a, const u64* b, u64* out, size_t n) {
  for (size_t i = 0; i < n; i++) fp_sub(*C, a + 4 * i, b + 4 * i, out + 4 * i);
}

// out[i] = a[i] + s * b[i]  (fused axpy; s normal form)
void vec_axpy(Ctx* C, const u64* a, const u64* b, const u64 s[4], u64* out, size_t n) {
  u64 sm[4], bm[4], r[4];
  fp_to_mont(*C, s, sm);
  for (size_t i = 0; i < n; i++) {
    fp_to_mont(*C, b + 4 * i, bm);
    fp_mul(*C, sm, bm, r);
    fp_from_mont(*C, r, r);
    fp_add(*C, a + 4 * i, r, out + 4 * i);
  }
}

// out = r1*a + r2*b elementwise (fold step of IPA halving rounds)
void vec_fold(Ctx* C, const u64* a, const u64* b, const u64 r1[4],
              const u64 r2[4], u64* out, size_t n) {
  u64 r1m[4], r2m[4], am[4], bm[4], t1[4], t2[4];
  fp_to_mont(*C, r1, r1m);
  fp_to_mont(*C, r2, r2m);
  for (size_t i = 0; i < n; i++) {
    fp_to_mont(*C, a + 4 * i, am);
    fp_to_mont(*C, b + 4 * i, bm);
    fp_mul(*C, r1m, am, t1);
    fp_mul(*C, r2m, bm, t2);
    fp_add(*C, t1, t2, t1);
    fp_from_mont(*C, t1, out + 4 * i);
  }
}

// Horner evaluation out = f(u); f is n coefficients, f[0] lowest degree.
// Serial dependency chain, but each step is one Montgomery mul (~tens of
// ns) — backs the HyperKZG per-fold evaluations (hyperkzg.rs:919-934).
void poly_eval_horner(Ctx* C, const u64* f, size_t n, const u64 u[4],
                      u64 out[4]) {
  u64 um[4], acc[4] = {0, 0, 0, 0}, fm[4];
  fp_to_mont(*C, u, um);
  for (size_t i = n; i-- > 0;) {
    fp_mul(*C, acc, um, acc);
    fp_to_mont(*C, f + 4 * i, fm);
    fp_add(*C, acc, fm, acc);
  }
  fp_from_mont(*C, acc, out);
}

// Synthetic division by (x - u): writes the n-1 coefficients of h with
// f = (x-u)*h + f(u). Backs the KZG witness openings (hyperkzg.rs:940-952).
void poly_div_linear(Ctx* C, const u64* f, size_t n, const u64 u[4],
                     u64* out_h) {
  if (n < 2) return;
  u64 um[4], acc[4], fm[4];
  fp_to_mont(*C, u, um);
  fp_to_mont(*C, f + 4 * (n - 1), acc);
  fp_from_mont(*C, acc, out_h + 4 * (n - 2));
  for (size_t i = n - 2; i > 0; i--) {
    fp_mul(*C, acc, um, acc);
    fp_to_mont(*C, f + 4 * i, fm);
    fp_add(*C, acc, fm, acc);
    fp_from_mont(*C, acc, out_h + 4 * (i - 1));
  }
}

// In-place radix-2 NTT over n=2^k entries given a primitive n-th root of
// unity w (normal form). invert=1 runs the inverse transform including
// the 1/n scale. Backs Mercury's univariate polynomial algebra
// (src/provider/mercury.rs); the reference leans on halo2curves
// best_fft, this is an original iterative Cooley-Tukey.
void ntt(Ctx* C, u64* a, size_t n, const u64 w[4], int invert) {
  // bit-reversal permutation
  for (size_t i = 1, j = 0; i < n; i++) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      u64 t[4];
      memcpy(t, a + 4 * i, 32);
      memcpy(a + 4 * i, a + 4 * j, 32);
      memcpy(a + 4 * j, t, 32);
    }
  }
  for (size_t i = 0; i < n; i++) fp_to_mont(*C, a + 4 * i, a + 4 * i);
  u64 wm[4];
  fp_to_mont(*C, w, wm);
  if (invert) {
    // w^{-1} = w^{n-1}
    u64 winv[4];
    memcpy(winv, C->r1, 32);
    for (size_t e = n - 1; e; e >>= 1) {
      if (e & 1) fp_mul(*C, winv, wm, winv);
      u64 sq[4];
      fp_sqr(*C, wm, sq);
      memcpy(wm, sq, 32);
    }
    memcpy(wm, winv, 32);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    // wlen = w^(n/len)
    u64 wlen[4];
    memcpy(wlen, wm, 32);
    for (size_t e = n / len; e > 1; e >>= 1) {
      // square-and-multiply on exponent n/len (power of two): just square
      u64 sq[4];
      fp_sqr(*C, wlen, sq);
      memcpy(wlen, sq, 32);
    }
    for (size_t i = 0; i < n; i += len) {
      u64 cur[4];
      memcpy(cur, C->r1, 32);  // Montgomery one
      for (size_t j = 0; j < len / 2; j++) {
        u64 *lo = a + 4 * (i + j), *hi = a + 4 * (i + j + len / 2);
        u64 t[4], v[4];
        fp_mul(*C, hi, cur, t);
        memcpy(v, lo, 32);
        fp_add(*C, v, t, lo);
        fp_sub(*C, v, t, hi);
        fp_mul(*C, cur, wlen, cur);
      }
    }
  }
  if (invert) {
    // scale by n^{-1}: n fits a word; invert via Fermat on the fly is
    // overkill — use inv_mod on the normal-form value.
    u64 nv[4] = {(u64)n, 0, 0, 0}, ninv[4];
    inv_mod(C, nv, ninv);
    u64 nm[4];
    fp_to_mont(*C, ninv, nm);
    for (size_t i = 0; i < n; i++) fp_mul(*C, a + 4 * i, nm, a + 4 * i);
  }
  for (size_t i = 0; i < n; i++) fp_from_mont(*C, a + 4 * i, a + 4 * i);
}

// eq(r, x) table by doubling (src/spartan/polys/eq.rs evals): for each
// challenge, every entry e splits into adjacent (e - e*r, e*r).
void eq_evals(Ctx* C, const u64* r, size_t k, u64* out) {
  memcpy(out, C->r1, 32);  // start from Montgomery ONE; convert at the end
  size_t m = 1;
  for (size_t l = 0; l < k; l++) {
    u64 rm[4];
    fp_to_mont(*C, r + 4 * l, rm);
    for (size_t i = m; i-- > 0;) {
      u64 hi[4], lo[4];
      fp_mul(*C, out + 4 * i, rm, hi);
      fp_sub(*C, out + 4 * i, hi, lo);
      memcpy(out + 8 * i, lo, 32);
      memcpy(out + 8 * i + 4, hi, 32);
    }
    m <<= 1;
  }
  for (size_t i = 0; i < m; i++)
    fp_from_mont(*C, out + 4 * i, out + 4 * i);
}

// One round of the cubic eq-sumcheck: evaluation points
//   e0  = sum elo*(alo*blo - clo)
//   c3  = sum de*da*db
//   em1 = sum (elo-de)*((alo-da)*(blo-db) - (clo-dc))
// with d* = hi - lo (top-variable split). out = 12 limbs (e0, c3, em1).
void sumcheck_cubic_round(Ctx* C, const u64* E, const u64* A, const u64* B,
                          const u64* Cv, size_t half, u64* out) {
  u64 e0[4] = {0,0,0,0}, c3[4] = {0,0,0,0}, em1[4] = {0,0,0,0};
  for (size_t i = 0; i < half; i++) {
    const u64 *elo = E + 4*i, *ehi = E + 4*(half+i);
    const u64 *alo = A + 4*i, *ahi = A + 4*(half+i);
    const u64 *blo = B + 4*i, *bhi = B + 4*(half+i);
    const u64 *clo = Cv + 4*i, *chi = Cv + 4*(half+i);
    u64 am[4], t[4], ab[4];
    // e0 term
    fp_to_mont(*C, alo, am);
    fp_mul(*C, am, blo, ab);          // alo*blo (normal)
    fp_sub(*C, ab, clo, ab);
    fp_to_mont(*C, elo, am);
    fp_mul(*C, am, ab, t);
    fp_add(*C, e0, t, e0);
    // deltas
    u64 de[4], da[4], db[4], dc[4];
    fp_sub(*C, ehi, elo, de);
    fp_sub(*C, ahi, alo, da);
    fp_sub(*C, bhi, blo, db);
    fp_sub(*C, chi, clo, dc);
    // c3 term
    fp_to_mont(*C, de, am);
    fp_mul(*C, am, da, t);            // de*da normal
    fp_to_mont(*C, t, am);
    fp_mul(*C, am, db, t);
    fp_add(*C, c3, t, c3);
    // em1 term
    u64 a1[4], b1[4], c1[4], e1[4];
    fp_sub(*C, alo, da, a1);
    fp_sub(*C, blo, db, b1);
    fp_sub(*C, clo, dc, c1);
    fp_sub(*C, elo, de, e1);
    fp_to_mont(*C, a1, am);
    fp_mul(*C, am, b1, ab);
    fp_sub(*C, ab, c1, ab);
    fp_to_mont(*C, e1, am);
    fp_mul(*C, am, ab, t);
    fp_add(*C, em1, t, em1);
  }
  memcpy(out, e0, 32);
  memcpy(out + 4, c3, 32);
  memcpy(out + 8, em1, 32);
}

// One Gruen/BDDT eq-factored round (eprint 2024/108 + 2025/1117 §6.2;
// reference src/spartan/sumcheck.rs:580-760): the eq table is NEVER
// bound — callers pass the prefix slice of the full table, which equals
// prod_{i<=j}(1-tau_i) * eq(tau_{>j}, x) — so each round needs only TWO
// N-scaling sums:
//   t0   = sum E[i]*(A_lo*B_lo - C_lo)
//   tinf = sum E[i]*dA*dB
// (t(1) is derived from the running claim by the caller.) out = 8 limbs.
void sumcheck_cubic_gruen_round(Ctx* C, const u64* E, const u64* A,
                                const u64* B, const u64* Cv, size_t half,
                                u64* out) {
  u64 t0[4] = {0,0,0,0}, tinf[4] = {0,0,0,0};
  for (size_t i = 0; i < half; i++) {
    const u64* e = E + 4*i;
    const u64 *alo = A + 4*i, *ahi = A + 4*(half+i);
    const u64 *blo = B + 4*i, *bhi = B + 4*(half+i);
    const u64 *clo = Cv + 4*i;
    u64 em[4], ab[4], t[4];
    fp_to_mont(*C, e, em);
    fp_to_mont(*C, alo, t);
    fp_mul(*C, t, blo, ab);
    fp_sub(*C, ab, clo, ab);
    fp_mul(*C, em, ab, t);
    fp_add(*C, t0, t, t0);
    u64 da[4], db[4];
    fp_sub(*C, ahi, alo, da);
    fp_sub(*C, bhi, blo, db);
    fp_to_mont(*C, da, t);
    fp_mul(*C, t, db, da);
    fp_mul(*C, em, da, t);
    fp_add(*C, tinf, t, tinf);
  }
  memcpy(out, t0, 32);
  memcpy(out + 4, tinf, 32);
}

// One round of the cubic PRODUCT sumcheck (no eq):
//   e0 = sum alo*blo*clo, c3 = sum da*db*dc,
//   em1 = sum (alo-da)*(blo-db)*(clo-dc). out = 12 limbs.
void sumcheck_cubicprod_round(Ctx* C, const u64* A, const u64* B,
                              const u64* Cv, size_t half, u64* out) {
  u64 e0[4] = {0,0,0,0}, c3[4] = {0,0,0,0}, em1[4] = {0,0,0,0};
  for (size_t i = 0; i < half; i++) {
    const u64 *alo = A + 4*i, *ahi = A + 4*(half+i);
    const u64 *blo = B + 4*i, *bhi = B + 4*(half+i);
    const u64 *clo = Cv + 4*i, *chi = Cv + 4*(half+i);
    u64 am[4], t[4];
    fp_to_mont(*C, alo, am);
    fp_mul(*C, am, blo, t);
    fp_to_mont(*C, t, am);
    fp_mul(*C, am, clo, t);
    fp_add(*C, e0, t, e0);
    u64 da[4], db[4], dc[4];
    fp_sub(*C, ahi, alo, da);
    fp_sub(*C, bhi, blo, db);
    fp_sub(*C, chi, clo, dc);
    fp_to_mont(*C, da, am);
    fp_mul(*C, am, db, t);
    fp_to_mont(*C, t, am);
    fp_mul(*C, am, dc, t);
    fp_add(*C, c3, t, c3);
    u64 a1[4], b1[4], c1[4];
    fp_sub(*C, alo, da, a1);
    fp_sub(*C, blo, db, b1);
    fp_sub(*C, clo, dc, c1);
    fp_to_mont(*C, a1, am);
    fp_mul(*C, am, b1, t);
    fp_to_mont(*C, t, am);
    fp_mul(*C, am, c1, t);
    fp_add(*C, em1, t, em1);
  }
  memcpy(out, e0, 32);
  memcpy(out + 4, c3, 32);
  memcpy(out + 8, em1, 32);
}

// Quadratic evaluation pair: e0 = sum alo*blo,
// em1 = sum (2alo-ahi)*(2blo-bhi). out = 8 limbs.
void sumcheck_quadeval_round(Ctx* C, const u64* A, const u64* B, size_t half,
                             u64* out) {
  u64 e0[4] = {0,0,0,0}, em1[4] = {0,0,0,0};
  for (size_t i = 0; i < half; i++) {
    const u64 *alo = A + 4*i, *ahi = A + 4*(half+i);
    const u64 *blo = B + 4*i, *bhi = B + 4*(half+i);
    u64 am[4], t[4];
    fp_to_mont(*C, alo, am);
    fp_mul(*C, am, blo, t);
    fp_add(*C, e0, t, e0);
    u64 a1[4], b1[4];
    fp_add(*C, alo, alo, a1);
    fp_sub(*C, a1, ahi, a1);
    fp_add(*C, blo, blo, b1);
    fp_sub(*C, b1, bhi, b1);
    fp_to_mont(*C, a1, am);
    fp_mul(*C, am, b1, t);
    fp_add(*C, em1, t, em1);
  }
  memcpy(out, e0, 32);
  memcpy(out + 4, em1, 32);
}

// Linear pair: e0 = sum (alo - blo), em1 = sum (2alo-ahi) - (2blo-bhi).
// out = 8 limbs.
void sumcheck_linear_round(Ctx* C, const u64* A, const u64* B, size_t half,
                           u64* out) {
  u64 e0[4] = {0,0,0,0}, em1[4] = {0,0,0,0};
  for (size_t i = 0; i < half; i++) {
    const u64 *alo = A + 4*i, *ahi = A + 4*(half+i);
    const u64 *blo = B + 4*i, *bhi = B + 4*(half+i);
    u64 t[4];
    fp_sub(*C, alo, blo, t);
    fp_add(*C, e0, t, e0);
    u64 a1[4], b1[4];
    fp_add(*C, alo, alo, a1);
    fp_sub(*C, a1, ahi, a1);
    fp_add(*C, blo, blo, b1);
    fp_sub(*C, b1, bhi, b1);
    fp_sub(*C, a1, b1, t);
    fp_add(*C, em1, t, em1);
  }
  memcpy(out, e0, 32);
  memcpy(out + 4, em1, 32);
}

// One round of the quadratic product sumcheck: e0 = sum alo*blo,
// coeff = sum (ahi-alo)*(bhi-blo). out = 8 limbs.
void sumcheck_quad_round(Ctx* C, const u64* A, const u64* B, size_t half,
                         u64* out) {
  u64 e0[4] = {0,0,0,0}, cf[4] = {0,0,0,0};
  for (size_t i = 0; i < half; i++) {
    const u64 *alo = A + 4*i, *ahi = A + 4*(half+i);
    const u64 *blo = B + 4*i, *bhi = B + 4*(half+i);
    u64 am[4], t[4];
    fp_to_mont(*C, alo, am);
    fp_mul(*C, am, blo, t);
    fp_add(*C, e0, t, e0);
    u64 da[4], db[4];
    fp_sub(*C, ahi, alo, da);
    fp_sub(*C, bhi, blo, db);
    fp_to_mont(*C, da, am);
    fp_mul(*C, am, db, t);
    fp_add(*C, cf, t, cf);
  }
  memcpy(out, e0, 32);
  memcpy(out + 4, cf, 32);
}

// keccak-f[1600] permutation on 25 u64 lanes, lanes[x][y] at index
// x*5 + y (FIPS 202; mirrors nova_tpu/provider/keccak.py:keccak_f1600).
static const u64 KECCAK_RC[24] = {
  0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
  0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
  0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
  0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
  0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
  0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
  0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
  0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};
static const int KECCAK_ROT[5][5] = {
  {0, 36, 3, 41, 18},
  {1, 44, 10, 45, 2},
  {62, 6, 43, 15, 61},
  {28, 55, 25, 21, 56},
  {27, 20, 39, 8, 14},
};
static inline u64 rotl64(u64 x, int n) {
  n &= 63;
  return n ? ((x << n) | (x >> (64 - n))) : x;
}

void keccak_f1600(u64* a /* 25 lanes, [x*5+y] */) {
  for (int r = 0; r < 24; r++) {
    u64 c[5], d[5];
    for (int x = 0; x < 5; x++)
      c[x] = a[x*5+0] ^ a[x*5+1] ^ a[x*5+2] ^ a[x*5+3] ^ a[x*5+4];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) a[x*5+y] ^= d[x];
    u64 b[25];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        b[y*5 + (2*x + 3*y) % 5] = rotl64(a[x*5+y], KECCAK_ROT[x][y]);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        a[x*5+y] = b[x*5+y] ^ ((~b[((x+1)%5)*5+y]) & b[((x+2)%5)*5+y]);
    a[0] ^= KECCAK_RC[r];
  }
}

// NeutronNova NIFS round evaluations (src/neutron/nifs.rs:28-186 analog):
// 5 evaluation points {0,2,3,4,5} of the degree-4 zero-fold polynomial,
// with the eq table split into left (e) and right (f) tensor halves.
// e1/e2: left+right entries each; Az/Bz/Cz: left*right entries.
// out = 20 limbs (sums at the 5 points, BEFORE the eq(rho,t) factors).
void neutron_round(Ctx* C, const u64* e1, const u64* e2,
                   const u64* Az1, const u64* Bz1, const u64* Cz1,
                   const u64* Az2, const u64* Bz2, const u64* Cz2,
                   size_t left, size_t right, u64* out) {
  u64 sums[5][4];
  memset(sums, 0, sizeof(sums));
  const u64* f1 = e1 + 4 * left;
  const u64* f2 = e2 + 4 * left;
  for (size_t i = 0; i < right; i++) {
    u64 inner[5][4];
    memset(inner, 0, sizeof(inner));
    size_t base = i * left;
    for (size_t j = 0; j < left; j++) {
      size_t k = base + j;
      u64 ev[4], av[4], bv[4], cv[4], de[4], da[4], db[4], dc[4];
      memcpy(ev, e1 + 4 * j, 32);
      memcpy(av, Az1 + 4 * k, 32);
      memcpy(bv, Bz1 + 4 * k, 32);
      memcpy(cv, Cz1 + 4 * k, 32);
      fp_sub(*C, e2 + 4 * j, ev, de);
      fp_sub(*C, Az2 + 4 * k, av, da);
      fp_sub(*C, Bz2 + 4 * k, bv, db);
      fp_sub(*C, Cz2 + 4 * k, cv, dc);
      u64 am[4], t[4];
      // t = 0
      fp_to_mont(*C, av, am);
      fp_mul(*C, am, bv, t);
      fp_sub(*C, t, cv, t);
      fp_to_mont(*C, ev, am);
      fp_mul(*C, am, t, t);
      fp_add(*C, inner[0], t, inner[0]);
      // walk t = 2 (double step), then 3, 4, 5
      u64 de2[4], da2[4], db2[4], dc2[4];
      fp_add(*C, de, de, de2);
      fp_add(*C, da, da, da2);
      fp_add(*C, db, db, db2);
      fp_add(*C, dc, dc, dc2);
      fp_add(*C, ev, de2, ev);
      fp_add(*C, av, da2, av);
      fp_add(*C, bv, db2, bv);
      fp_add(*C, cv, dc2, cv);
      for (int pt = 1; pt < 5; pt++) {
        fp_to_mont(*C, av, am);
        fp_mul(*C, am, bv, t);
        fp_sub(*C, t, cv, t);
        fp_to_mont(*C, ev, am);
        fp_mul(*C, am, t, t);
        fp_add(*C, inner[pt], t, inner[pt]);
        if (pt < 4) {
          fp_add(*C, ev, de, ev);
          fp_add(*C, av, da, av);
          fp_add(*C, bv, db, bv);
          fp_add(*C, cv, dc, cv);
        }
      }
    }
    // weight by the f (right) half, walked the same way
    u64 fv[4], df[4];
    memcpy(fv, f1 + 4 * i, 32);
    fp_sub(*C, f2 + 4 * i, fv, df);
    u64 am[4], t[4];
    fp_to_mont(*C, fv, am);
    fp_mul(*C, am, inner[0], t);
    fp_add(*C, sums[0], t, sums[0]);
    u64 df2[4];
    fp_add(*C, df, df, df2);
    fp_add(*C, fv, df2, fv);
    for (int pt = 1; pt < 5; pt++) {
      fp_to_mont(*C, fv, am);
      fp_mul(*C, am, inner[pt], t);
      fp_add(*C, sums[pt], t, sums[pt]);
      if (pt < 4) fp_add(*C, fv, df, fv);
    }
  }
  for (int pt = 0; pt < 5; pt++) memcpy(out + 4 * pt, sums[pt], 32);
}

// ---------------------------------------------------------------------------
// Poseidon permutation (hash_optimized_static schedule; the Python
// reference implementation lives in nova_tpu/provider/poseidon.py:412 —
// this kernel replicates it operation-for-operation in Montgomery form).
// ---------------------------------------------------------------------------

struct PoseidonCtx {
  Ctx* C;
  int width, half_full, partial;
  std::vector<u64> crc;       // compressed round constants (Montgomery)
  std::vector<u64> m;         // width x width (Montgomery, row-major)
  std::vector<u64> pre;       // pre-sparse matrix (Montgomery, row-major)
  std::vector<u64> w_hats;    // partial x width
  std::vector<u64> v_rests;   // partial x (width-1)
};

void* poseidon_ctx_new(Ctx* C, int width, int half_full, int partial,
                       const u64* crc, size_t crc_len, const u64* m,
                       const u64* pre, const u64* w_hats, const u64* v_rests) {
  PoseidonCtx* P = new PoseidonCtx();
  P->C = C;
  P->width = width;
  P->half_full = half_full;
  P->partial = partial;
  auto to_mont_vec = [&](const u64* src_v, size_t n, std::vector<u64>& dst) {
    dst.resize(4 * n);
    for (size_t i = 0; i < n; i++) fp_to_mont(*C, src_v + 4 * i, &dst[4 * i]);
  };
  to_mont_vec(crc, crc_len, P->crc);
  to_mont_vec(m, (size_t)width * width, P->m);
  to_mont_vec(pre, (size_t)width * width, P->pre);
  to_mont_vec(w_hats, (size_t)partial * width, P->w_hats);
  to_mont_vec(v_rests, (size_t)partial * (width - 1), P->v_rests);
  return P;
}

void poseidon_ctx_free(void* h) { delete (PoseidonCtx*)h; }

// elements: width x 4 limbs, normal form, in/out
void poseidon_permute(void* h, u64* elements) {
  PoseidonCtx* P = (PoseidonCtx*)h;
  const Ctx& C = *P->C;
  int width = P->width;
  std::vector<u64> el(4 * width), nx(4 * width);
  for (int i = 0; i < width; i++) fp_to_mont(C, elements + 4 * i, &el[4 * i]);
  size_t off = 0;  // crc offset (in elements)
  int cur_round = 0;
  int sparse_offset = P->half_full - 1;

  auto sbox = [&](u64* x) {
    u64 x2[4], x4[4];
    fp_mul(C, x, x, x2);
    fp_mul(C, x2, x2, x4);
    fp_mul(C, x4, x, x);
  };
  auto apply_mds = [&]() {
    if (cur_round == sparse_offset) {
      // out[j] = sum_i pre[i][j] * el[i]
      for (int j = 0; j < width; j++) {
        u64 acc[4] = {0, 0, 0, 0}, t[4];
        for (int i = 0; i < width; i++) {
          fp_mul(C, &P->pre[4 * ((size_t)i * width + j)], &el[4 * i], t);
          fp_add(C, acc, t, acc);
        }
        memcpy(&nx[4 * j], acc, 32);
      }
      std::swap(el, nx);
    } else if (cur_round > sparse_offset &&
               cur_round < P->half_full + P->partial) {
      int k = cur_round - sparse_offset - 1;
      const u64* w_hat = &P->w_hats[4 * (size_t)k * width];
      const u64* v_rest = &P->v_rests[4 * (size_t)k * (width - 1)];
      u64 acc[4] = {0, 0, 0, 0}, t[4];
      for (int i = 0; i < width; i++) {
        fp_mul(C, w_hat + 4 * i, &el[4 * i], t);
        fp_add(C, acc, t, acc);
      }
      memcpy(&nx[0], acc, 32);
      for (int j = 1; j < width; j++) {
        fp_mul(C, v_rest + 4 * (j - 1), &el[0], t);
        fp_add(C, &el[4 * j], t, &nx[4 * j]);
      }
      std::swap(el, nx);
    } else {
      // out[i] = sum_j m[i][j] * el[j]
      for (int i = 0; i < width; i++) {
        u64 acc[4] = {0, 0, 0, 0}, t[4];
        for (int j = 0; j < width; j++) {
          fp_mul(C, &P->m[4 * ((size_t)i * width + j)], &el[4 * j], t);
          fp_add(C, acc, t, acc);
        }
        memcpy(&nx[4 * i], acc, 32);
      }
      std::swap(el, nx);
    }
    cur_round++;
  };

  for (int i = 0; i < width; i++)
    fp_add(C, &el[4 * i], &P->crc[4 * (off + i)], &el[4 * i]);
  off += width;
  for (int r = 0; r < P->half_full; r++) {
    for (int i = 0; i < width; i++) {
      sbox(&el[4 * i]);
      fp_add(C, &el[4 * i], &P->crc[4 * (off + i)], &el[4 * i]);
    }
    off += width;
    apply_mds();
  }
  for (int r = 0; r < P->partial; r++) {
    sbox(&el[0]);
    fp_add(C, &el[0], &P->crc[4 * off], &el[0]);
    off += 1;
    apply_mds();
  }
  for (int r = 1; r < P->half_full; r++) {
    for (int i = 0; i < width; i++) {
      sbox(&el[4 * i]);
      fp_add(C, &el[4 * i], &P->crc[4 * (off + i)], &el[4 * i]);
    }
    off += width;
    apply_mds();
  }
  for (int i = 0; i < width; i++) sbox(&el[4 * i]);
  apply_mds();
  for (int i = 0; i < width; i++) fp_from_mont(C, &el[4 * i], elements + 4 * i);
}

// Poseidon permutation WITH witness capture: same schedule as
// poseidon_permute, additionally appending every quintic-sbox
// intermediate (l2, l4, l5) — and, in compact mode, the post-MDS state
// tail of each partial round — in the gadget's allocation order
// (nova_tpu/gadgets/poseidon_circuit.py:_permutation_witness).
// allocs must hold 4 * n_allocs u64; returns the alloc count.
size_t poseidon_permute_witness(void* h, u64* elements, u64* allocs,
                                int compact) {
  PoseidonCtx* P = (PoseidonCtx*)h;
  const Ctx& C = *P->C;
  int width = P->width;
  std::vector<u64> el(4 * width), nx(4 * width);
  for (int i = 0; i < width; i++) fp_to_mont(C, elements + 4 * i, &el[4 * i]);
  size_t off = 0;
  size_t na = 0;
  int cur_round = 0;
  int sparse_offset = P->half_full - 1;

  auto emit = [&](const u64* v) {
    fp_from_mont(C, v, allocs + 4 * na);
    na++;
  };
  auto sbox_post = [&](u64* x, const u64* post /* Montgomery or NULL */) {
    u64 x2[4], x4[4];
    fp_mul(C, x, x, x2);
    emit(x2);
    fp_mul(C, x2, x2, x4);
    emit(x4);
    fp_mul(C, x4, x, x);
    if (post) fp_add(C, x, post, x);
    emit(x);
  };
  auto sbox_pre_post = [&](u64* x, const u64* pre, const u64* post) {
    u64 t[4], x2[4], x4[4];
    fp_add(C, x, pre, t);
    fp_mul(C, t, t, x2);
    emit(x2);
    fp_mul(C, x2, x2, x4);
    emit(x4);
    fp_mul(C, t, x4, x);
    fp_add(C, x, post, x);
    emit(x);
  };
  auto apply_mds = [&]() {
    if (cur_round == sparse_offset) {
      for (int j = 0; j < width; j++) {
        u64 acc[4] = {0, 0, 0, 0}, t[4];
        for (int i = 0; i < width; i++) {
          fp_mul(C, &P->pre[4 * ((size_t)i * width + j)], &el[4 * i], t);
          fp_add(C, acc, t, acc);
        }
        memcpy(&nx[4 * j], acc, 32);
      }
      std::swap(el, nx);
    } else if (cur_round > sparse_offset &&
               cur_round < P->half_full + P->partial) {
      int k = cur_round - sparse_offset - 1;
      const u64* w_hat = &P->w_hats[4 * (size_t)k * width];
      const u64* v_rest = &P->v_rests[4 * (size_t)k * (width - 1)];
      u64 acc[4] = {0, 0, 0, 0}, t[4];
      for (int i = 0; i < width; i++) {
        fp_mul(C, w_hat + 4 * i, &el[4 * i], t);
        fp_add(C, acc, t, acc);
      }
      memcpy(&nx[0], acc, 32);
      for (int j = 1; j < width; j++) {
        fp_mul(C, v_rest + 4 * (j - 1), &el[0], t);
        fp_add(C, &el[4 * j], t, &nx[4 * j]);
      }
      std::swap(el, nx);
    } else {
      for (int i = 0; i < width; i++) {
        u64 acc[4] = {0, 0, 0, 0}, t[4];
        for (int j = 0; j < width; j++) {
          fp_mul(C, &P->m[4 * ((size_t)i * width + j)], &el[4 * j], t);
          fp_add(C, acc, t, acc);
        }
        memcpy(&nx[4 * i], acc, 32);
      }
      std::swap(el, nx);
    }
    cur_round++;
  };

  // first full round: pre + post keys around each sbox
  for (int i = 0; i < width; i++) {
    sbox_pre_post(&el[4 * i], &P->crc[4 * (off + i)],
                  &P->crc[4 * (off + width + i)]);
  }
  off += 2 * (size_t)width;
  apply_mds();
  for (int r = 1; r < P->half_full; r++) {
    for (int i = 0; i < width; i++)
      sbox_post(&el[4 * i], &P->crc[4 * (off + i)]);
    off += width;
    apply_mds();
  }
  for (int r = 0; r < P->partial; r++) {
    sbox_post(&el[0], &P->crc[4 * off]);
    off += 1;
    apply_mds();
    if (compact) {
      for (int i = 1; i < width; i++) emit(&el[4 * i]);
    }
  }
  for (int r = 1; r < P->half_full; r++) {
    for (int i = 0; i < width; i++)
      sbox_post(&el[4 * i], &P->crc[4 * (off + i)]);
    off += width;
    apply_mds();
  }
  for (int i = 0; i < width; i++) sbox_post(&el[4 * i], NULL);
  apply_mds();
  for (int i = 0; i < width; i++) fp_from_mont(C, &el[4 * i], elements + 4 * i);
  return na;
}

// Batch modular inverse via the Montgomery product trick: ~3 muls per
// element plus ONE Fermat inversion (src/spartan/mod.rs:54-117 analog).
// Zero entries map to zero (callers guarantee nonzero or tolerate 0).
// Scalar modular inverse (normal form in/out), binary extended GCD —
// ~3x faster than the Fermat ladder for one-off inversions.
static inline bool is_even256(const u64 a[4]) { return (a[0] & 1) == 0; }
static inline bool is_one256(const u64 a[4]) {
  return a[0] == 1 && a[1] == 0 && a[2] == 0 && a[3] == 0;
}
static inline void shr1_carry(u64 a[4], u64 carry_in) {
  a[0] = (a[0] >> 1) | (a[1] << 63);
  a[1] = (a[1] >> 1) | (a[2] << 63);
  a[2] = (a[2] >> 1) | (a[3] << 63);
  a[3] = (a[3] >> 1) | (carry_in << 63);
}

void inv_mod(Ctx* C, const u64 a[4], u64 out[4]) {
  u64 u[4], v[4], x1[4], x2[4];
  memcpy(u, a, 32);
  memcpy(v, C->p, 32);
  memset(x1, 0, 32); x1[0] = 1;
  memset(x2, 0, 32);
  if ((u[0] | u[1] | u[2] | u[3]) == 0) { memset(out, 0, 32); return; }
  while (!is_one256(u) && !is_one256(v)) {
    while (is_even256(u)) {
      shr1_carry(u, 0);
      if (is_even256(x1)) shr1_carry(x1, 0);
      else { u64 c = add256(x1, C->p, x1); shr1_carry(x1, c); }
    }
    while (is_even256(v)) {
      shr1_carry(v, 0);
      if (is_even256(x2)) shr1_carry(x2, 0);
      else { u64 c = add256(x2, C->p, x2); shr1_carry(x2, c); }
    }
    if (cmp256(u, v) >= 0) {
      sub256(u, v, u);
      u64 borrow = sub256(x1, x2, x1);
      if (borrow) add256(x1, C->p, x1);
    } else {
      sub256(v, u, v);
      u64 borrow = sub256(x2, x1, x2);
      if (borrow) add256(x2, C->p, x2);
    }
  }
  memcpy(out, is_one256(u) ? x1 : x2, 32);
}

// Montgomery -> normal form, elementwise (one REDC each). Backs the
// FVec device->host boundary: pulling the raw Montgomery limbs and
// reducing here is ~10x cheaper than running the from_mont program
// through the eager XLA:CPU path.
void vec_from_mont(Ctx* C, const u64* a, u64* out, size_t n) {
  for (size_t i = 0; i < n; i++) fp_from_mont(*C, a + 4 * i, out + 4 * i);
}

void vec_batch_inv(Ctx* C, const u64* a, u64* out, size_t n) {
  std::vector<u64> prefix(4 * (n + 1));
  memcpy(&prefix[0], C->r1, 32);
  std::vector<uint8_t> nz(n);
  u64 am[4];
  for (size_t i = 0; i < n; i++) {
    const u64* ai = a + 4 * i;
    nz[i] = !fp_is_zero(ai);
    if (nz[i]) {
      fp_to_mont(*C, ai, am);
      fp_mul(*C, &prefix[4 * i], am, &prefix[4 * (i + 1)]);
    } else {
      memcpy(&prefix[4 * (i + 1)], &prefix[4 * i], 32);
    }
  }
  u64 acc[4];
  fp_inv(*C, &prefix[4 * n], acc);
  for (size_t i = n; i-- > 0;) {
    if (!nz[i]) {
      memset(out + 4 * i, 0, 32);
      continue;
    }
    u64 t[4];
    fp_mul(*C, acc, &prefix[4 * i], t);      // Montgomery form of a_i^{-1}
    fp_from_mont(*C, t, out + 4 * i);
    fp_to_mont(*C, a + 4 * i, am);
    fp_mul(*C, acc, am, acc);
  }
}

// CSR sparse-matrix x vector. data_mont: nnz Montgomery-form coeffs;
// cls: 0 general, 1 (+1), 2 (-1) — the reference's PrecomputedSparseMatrix
// coefficient classes (src/r1cs/sparse.rs:19-107) collapse +-1 to add/sub.
// z: normal form. out: normal canonical.
static void spmv_rows(Ctx* C, const u64* data_mont, const uint8_t* cls,
                      const uint32_t* indices, const uint32_t* indptr,
                      size_t r0, size_t r1, const u64* z, u64* out) {
  for (size_t r = r0; r < r1; r++) {
    u64 acc[4] = {0, 0, 0, 0};
    for (uint32_t k = indptr[r]; k < indptr[r + 1]; k++) {
      const u64* zz = z + 4 * (size_t)indices[k];
      if (cls[k] == 1) {
        fp_add(*C, acc, zz, acc);
      } else if (cls[k] == 2) {
        fp_sub(*C, acc, zz, acc);
      } else {
        u64 t[4];
        fp_mul(*C, data_mont + 4 * (size_t)k, zz, t);  // mont*normal = normal
        fp_add(*C, acc, t, acc);
      }
    }
    memcpy(out + 4 * r, acc, 32);
  }
}

void spmv(Ctx* C, const u64* data_mont, const uint8_t* cls,
          const uint32_t* indices, const uint32_t* indptr, size_t rows,
          const u64* z, u64* out) {
  int T = native_threads();
  if (T > 1 && rows >= 1024) {
    // rows are independent; chunk evenly (nnz skew across R1CS rows is
    // mild for padded shapes)
    size_t chunk = (rows + T - 1) / T;
    std::vector<std::thread> pool;
    for (int t = 0; t < T; t++) {
      size_t r0 = (size_t)t * chunk, r1 = std::min(rows, r0 + chunk);
      if (r0 >= r1) break;
      pool.emplace_back(spmv_rows, C, data_mont, cls, indices, indptr,
                        r0, r1, z, out);
    }
    for (auto& th : pool) th.join();
    return;
  }
  for (size_t r = 0; r < rows; r++) {
    u64 acc[4] = {0, 0, 0, 0};
    for (uint32_t k = indptr[r]; k < indptr[r + 1]; k++) {
      const u64* zz = z + 4 * (size_t)indices[k];
      if (cls[k] == 1) {
        fp_add(*C, acc, zz, acc);
      } else if (cls[k] == 2) {
        fp_sub(*C, acc, zz, acc);
      } else {
        u64 t[4];
        fp_mul(*C, data_mont + 4 * (size_t)k, zz, t);  // mont*normal = normal
        fp_add(*C, acc, t, acc);
      }
    }
    memcpy(out + 4 * r, acc, 32);
  }
}

// Cross-term: out = az*bz - u*cz - e (all normal form), the fold T vector
// (src/r1cs/mod.rs:569-575).
void vec_cross(Ctx* C, const u64* az, const u64* bz, const u64* cz,
               const u64* e, const u64 u[4], u64* out, size_t n) {
  u64 um[4];
  fp_to_mont(*C, u, um);
  for (size_t i = 0; i < n; i++) {
    u64 ab[4], am[4], uc[4];
    fp_to_mont(*C, az + 4 * i, am);
    fp_mul(*C, am, bz + 4 * i, ab);      // az*bz normal
    fp_mul(*C, um, cz + 4 * i, uc);      // u*cz normal
    fp_sub(*C, ab, uc, ab);
    fp_sub(*C, ab, e + 4 * i, ab);
    memcpy(out + 4 * i, ab, 32);
  }
}

// Relaxed cross-term: out = az1*bz2 + az2*bz1 - u1*cz2 - u2*cz1 - e1 - e2
void vec_cross_relaxed(Ctx* C, const u64* az1, const u64* bz1, const u64* cz1,
                       const u64* az2, const u64* bz2, const u64* cz2,
                       const u64* e1, const u64* e2,
                       const u64 u1[4], const u64 u2[4], u64* out, size_t n) {
  u64 u1m[4], u2m[4];
  fp_to_mont(*C, u1, u1m);
  fp_to_mont(*C, u2, u2m);
  for (size_t i = 0; i < n; i++) {
    u64 t1[4], t2[4], m[4];
    fp_to_mont(*C, az1 + 4 * i, m);
    fp_mul(*C, m, bz2 + 4 * i, t1);
    fp_to_mont(*C, az2 + 4 * i, m);
    fp_mul(*C, m, bz1 + 4 * i, t2);
    fp_add(*C, t1, t2, t1);
    fp_mul(*C, u1m, cz2 + 4 * i, t2);
    fp_sub(*C, t1, t2, t1);
    fp_mul(*C, u2m, cz1 + 4 * i, t2);
    fp_sub(*C, t1, t2, t1);
    fp_sub(*C, t1, e1 + 4 * i, t1);
    fp_sub(*C, t1, e2 + 4 * i, t1);
    memcpy(out + 4 * i, t1, 32);
  }
}

// R1CS satisfiability residual: nonzero count of az*bz - u*cz - e
size_t vec_sat_check(Ctx* C, const u64* az, const u64* bz, const u64* cz,
                     const u64* e, const u64 u[4], size_t n) {
  u64 um[4];
  fp_to_mont(*C, u, um);
  size_t bad = 0;
  for (size_t i = 0; i < n; i++) {
    u64 ab[4], am[4], uc[4];
    fp_to_mont(*C, az + 4 * i, am);
    fp_mul(*C, am, bz + 4 * i, ab);
    fp_mul(*C, um, cz + 4 * i, uc);
    fp_sub(*C, ab, uc, ab);
    fp_sub(*C, ab, e + 4 * i, ab);
    if (!fp_is_zero(ab)) bad++;
  }
  return bad;
}

// out = sum_i a_i * b_i mod p
void vec_dot(Ctx* C, const u64* a, const u64* b, u64 out[4], size_t n) {
  u64 acc[4] = {0, 0, 0, 0};
  u64 am[4], bm[4], t[4];
  for (size_t i = 0; i < n; i++) {
    fp_to_mont(*C, a + 4 * i, am);
    fp_mul(*C, am, b + 4 * i, t);  // result in normal form: mont(a)*b = a*b*R*R^-1
    fp_add(*C, acc, t, acc);
  }
  memcpy(out, acc, 32);
}

void vec_invmod(Ctx* C, const u64* a, u64* out, size_t n) {
  // Montgomery trick; caller guarantees nonzero
  std::vector<u64> mont(4 * n), prefix(4 * (n + 1));
  for (size_t i = 0; i < n; i++) fp_to_mont(*C, a + 4 * i, &mont[4 * i]);
  memcpy(&prefix[0], C->r1, 32);
  for (size_t i = 0; i < n; i++)
    fp_mul(*C, &prefix[4 * i], &mont[4 * i], &prefix[4 * (i + 1)]);
  u64 acc[4];
  fp_inv(*C, &prefix[4 * n], acc);
  for (size_t ii = n; ii-- > 0;) {
    u64 r[4];
    fp_mul(*C, acc, &prefix[4 * ii], r);
    fp_mul(*C, acc, &mont[4 * ii], acc);
    fp_from_mont(*C, r, out + 4 * ii);
  }
}

// MSM: xs/ys normal form, scalars 4x64 integers. out = [x, y] + inf flag.
void msm(Ctx* C, const u64* xs, const u64* ys, const uint8_t* inf,
         const u64* scalars, size_t n, u64 out_x[4], u64 out_y[4],
         uint8_t* out_inf) {
  msm_core(C, xs, ys, inf, scalars, NULL, n, out_x, out_y, out_inf);
}

// MSM over an index-selected subset of a cached base array: base i is
// (xs,ys,inf)[idx[i]], scalar i is scalars[4i..]. Lets callers keep one
// marshalled copy of a commitment key and address per-round subsets.
void msm_idx(Ctx* C, const u64* xs, const u64* ys, const uint8_t* inf,
             const u64* scalars, const uint32_t* idx, size_t n,
             u64 out_x[4], u64 out_y[4], uint8_t* out_inf) {
  msm_core(C, xs, ys, inf, scalars, idx, n, out_x, out_y, out_inf);
}

// Segmented batch-add: out[s] = sum of table points order[seg_off[s]..
// seg_off[s+1]) for each of nseg segments, reduced by the shared-inversion
// batched-affine pair scheduler (the reference's batch_add,
// src/provider/msm.rs:689-770, generalized to many segments at once).
// Backs commit_sparse_binary (one segment) and ck_derive_by_address
// (one segment per table slot).
void batch_add_seg(Ctx* C, const u64* xs, const u64* ys, const uint8_t* inf,
                   const uint32_t* order, const uint32_t* seg_off, size_t nseg,
                   u64* out_x, u64* out_y, uint8_t* out_inf) {
  size_t total = seg_off[nseg];
  std::vector<u64> ax(4 * total), ay(4 * total), bxx(4 * total), byy(4 * total);
  std::vector<uint32_t> seg_start(nseg), seg_len(nseg);
  size_t pos = 0;
  for (size_t s = 0; s < nseg; s++) {
    seg_start[s] = (uint32_t)pos;
    uint32_t k = 0;
    for (uint32_t t = seg_off[s]; t < seg_off[s + 1]; t++) {
      uint32_t i = order[t];
      if (inf[i]) continue;  // identity contributes nothing
      fp_to_mont(*C, xs + 4 * i, &ax[4 * pos]);
      fp_to_mont(*C, ys + 4 * i, &ay[4 * pos]);
      pos++; k++;
    }
    seg_len[s] = k;
  }
  PairScratch scratch;
  msm_pair_rounds(*C, nseg, ax, ay, bxx, byy, seg_start, seg_len, scratch);
  for (size_t s = 0; s < nseg; s++) {
    if (seg_len[s] == 0) {
      out_inf[s] = 1;
      memset(out_x + 4 * s, 0, 32);
      memset(out_y + 4 * s, 0, 32);
    } else {
      out_inf[s] = 0;
      fp_from_mont(*C, &ax[4 * seg_start[s]], out_x + 4 * s);
      fp_from_mont(*C, &ay[4 * seg_start[s]], out_y + 4 * s);
    }
  }
}

// Fold commitment key: out[i] = w1*L[i] + w2*R[i] (Strauss dual-scalar mul)
void ec_fold(Ctx* C, const u64* lx, const u64* ly, const uint8_t* linf,
             const u64* rx, const u64* ry, const uint8_t* rinf,
             const u64 w1[4], const u64 w2[4], size_t n,
             u64* ox, u64* oy, uint8_t* oinf) {
  std::vector<Jac> out(n);
  for (size_t i = 0; i < n; i++) {
    u64 lmx[4], lmy[4], rmx[4], rmy[4];
    bool li = linf[i], ri = rinf[i];
    if (!li) { fp_to_mont(*C, lx + 4 * i, lmx); fp_to_mont(*C, ly + 4 * i, lmy); }
    if (!ri) { fp_to_mont(*C, rx + 4 * i, rmx); fp_to_mont(*C, ry + 4 * i, rmy); }
    // precompute L+R
    Jac lr; jac_set_identity(lr);
    if (!li) jac_madd(*C, lr, lmx, lmy, false, lr);
    if (!ri) jac_madd(*C, lr, rmx, rmy, false, lr);
    Jac acc; jac_set_identity(acc);
    int top = 255;
    while (top >= 0) {
      bool b1 = (w1[top / 64] >> (top % 64)) & 1;
      bool b2 = (w2[top / 64] >> (top % 64)) & 1;
      if (b1 || b2) break;
      top--;
    }
    for (int bit = top; bit >= 0; bit--) {
      jac_dbl(*C, acc, acc);
      bool b1 = (w1[bit / 64] >> (bit % 64)) & 1;
      bool b2 = (w2[bit / 64] >> (bit % 64)) & 1;
      if (b1 && b2) jac_add(*C, acc, lr, acc);
      else if (b1 && !li) jac_madd(*C, acc, lmx, lmy, false, acc);
      else if (b2 && !ri) jac_madd(*C, acc, rmx, rmy, false, acc);
    }
    out[i] = acc;
  }
  batch_to_affine(*C, out, ox, oy, oinf);
}

// out[i] = k * P[i] (shared scalar): used by ck.scale
void ec_scale(Ctx* C, const u64* xs, const u64* ys, const uint8_t* inf,
              const u64 k[4], size_t n, u64* ox, u64* oy, uint8_t* oinf) {
  std::vector<Jac> out(n);
  for (size_t i = 0; i < n; i++) {
    u64 mx[4], my[4];
    if (!inf[i]) { fp_to_mont(*C, xs + 4 * i, mx); fp_to_mont(*C, ys + 4 * i, my); }
    jac_scalar_mul(*C, mx, my, inf[i] != 0, k, out[i]);
  }
  batch_to_affine(*C, out, ox, oy, oinf);
}

// out[i] = k[i] * P[i] (per-element scalars)
void ec_mul_many(Ctx* C, const u64* xs, const u64* ys, const uint8_t* inf,
                 const u64* ks, size_t n, u64* ox, u64* oy, uint8_t* oinf) {
  std::vector<Jac> out(n);
  for (size_t i = 0; i < n; i++) {
    u64 mx[4], my[4];
    if (!inf[i]) { fp_to_mont(*C, xs + 4 * i, mx); fp_to_mont(*C, ys + 4 * i, my); }
    jac_scalar_mul(*C, mx, my, inf[i] != 0, ks + 4 * i, out[i]);
  }
  batch_to_affine(*C, out, ox, oy, oinf);
}

// Fixed-base batch exponentiation: out[i] = ks[i] * G for one shared
// base (reference fixed_base_exp_comb_batch, hyperkzg.rs:443 — used by
// powers-of-tau setup). Precomputes 8-bit window tables T[w][d] =
// d*2^(8w)*G once, then each scalar costs 32 mixed adds.
void ec_fixed_mul_many(Ctx* C, const u64 gx[4], const u64 gy[4],
                       const u64* ks, size_t n, u64* ox, u64* oy,
                       uint8_t* oinf) {
  const int W = 32, D = 256;
  u64 mgx[4], mgy[4];
  fp_to_mont(*C, gx, mgx);
  fp_to_mont(*C, gy, mgy);
  // build tables in Jacobian, then batch-normalize to affine Montgomery
  std::vector<Jac> tab((size_t)W * D);
  Jac base;
  jac_set_identity(base);
  jac_madd(*C, base, mgx, mgy, false, base);
  for (int w = 0; w < W; w++) {
    jac_set_identity(tab[(size_t)w * D]);          // d = 0 -> identity
    tab[(size_t)w * D + 1] = base;
    for (int d = 2; d < D; d++)
      jac_add(*C, tab[(size_t)w * D + d - 1], base, tab[(size_t)w * D + d]);
    // base <<= 8 bits
    Jac nb = tab[(size_t)w * D + D - 1];
    jac_add(*C, nb, base, nb);                     // 256 * base
    base = nb;
  }
  std::vector<u64> tx(4 * tab.size()), ty(4 * tab.size());
  std::vector<uint8_t> tinf(tab.size());
  batch_to_affine(*C, tab, tx.data(), ty.data(), tinf.data());
  // jac_madd wants Montgomery affine operands
  for (size_t i = 0; i < tab.size(); i++) {
    if (tinf[i]) continue;
    fp_to_mont(*C, &tx[4 * i], &tx[4 * i]);
    fp_to_mont(*C, &ty[4 * i], &ty[4 * i]);
  }

  std::vector<Jac> out(n);
  for (size_t i = 0; i < n; i++) {
    Jac acc;
    jac_set_identity(acc);
    const u64* k = ks + 4 * i;
    for (int w = 0; w < W; w++) {
      int limb = w / 8, ofs = (w % 8) * 8;
      unsigned d = (unsigned)((k[limb] >> ofs) & 0xFF);
      if (!d) continue;
      size_t idx = (size_t)w * D + d;
      if (!tinf[idx]) jac_madd(*C, acc, &tx[4 * idx], &ty[4 * idx], false, acc);
    }
    out[i] = acc;
  }
  batch_to_affine(*C, out, ox, oy, oinf);
}

}  // extern "C"
