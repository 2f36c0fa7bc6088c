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

typedef unsigned __int128 u128;
typedef uint64_t u64;

struct Ctx {
  u64 p[4];     // modulus
  u64 r1[4];    // 2^256 mod p        (Montgomery ONE)
  u64 r2[4];    // (2^256)^2 mod p
  u64 n0inv;    // -p^{-1} mod 2^64
  u64 b_mont[4];// curve b in Montgomery form (for on-curve checks; unused in group law)
};

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
  int c = 4;
  if (n >= 32) c = 8;
  if (n >= (1u << 13)) c = 12;
  if (n >= (1u << 18)) c = 16;
  int windows = (256 + c - 1) / c;
  size_t nbuckets = ((size_t)1 << c) - 1;

  // Montgomery-convert bases once
  std::vector<u64> mx(4 * n), my(4 * n);
  for (size_t i = 0; i < n; i++) {
    fp_to_mont(*C, xs + 4 * i, &mx[4 * i]);
    fp_to_mont(*C, ys + 4 * i, &my[4 * i]);
  }

  Jac total; jac_set_identity(total);
  std::vector<Jac> buckets(nbuckets);
  for (int w = windows - 1; w >= 0; w--) {
    for (int d = 0; d < c; d++) jac_dbl(*C, total, total);
    for (size_t bkt = 0; bkt < nbuckets; bkt++) jac_set_identity(buckets[bkt]);
    int bit_lo = w * c;
    for (size_t i = 0; i < n; i++) {
      if (inf[i]) continue;
      int limb = bit_lo / 64, ofs = bit_lo % 64;
      u64 d = scalars[4 * i + limb] >> ofs;
      if (ofs + c > 64 && limb + 1 < 4) d |= scalars[4 * i + limb + 1] << (64 - ofs);
      d &= (((u64)1 << c) - 1);
      if (d == 0) continue;
      jac_madd(*C, buckets[d - 1], &mx[4 * i], &my[4 * i], false, buckets[d - 1]);
    }
    Jac running, wsum;
    jac_set_identity(running);
    jac_set_identity(wsum);
    for (size_t bkt = nbuckets; bkt-- > 0;) {
      jac_add(*C, running, buckets[bkt], running);
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
  u64 ox[4], oy[4]; uint8_t oi;
  batch_to_affine(*C, one, ox, oy, &oi);
  memcpy(out_x, ox, 32); memcpy(out_y, oy, 32);
  *out_inf = oi;
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

}  // extern "C"
