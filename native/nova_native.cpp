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
    S.ensure(max_len / 2 * nb + nb);  // upper bound; cheap after first round
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

// Core MSM over selected bases. idx == NULL selects bases 0..n-1.
static void msm_core(Ctx* C, const u64* xs, const u64* ys, const uint8_t* inf,
                     const u64* scalars, const uint32_t* idx, size_t n,
                     u64 out_x[4], u64 out_y[4], uint8_t* out_inf) {
  // gather live (non-infinity, nonzero-scalar) points; Montgomery convert
  std::vector<u64> mx, my, sc;
  mx.reserve(4 * n); my.reserve(4 * n); sc.reserve(4 * n);
  for (size_t i = 0; i < n; i++) {
    size_t src = idx ? idx[i] : i;
    const u64* k = scalars + 4 * i;
    if (inf[src]) continue;
    if ((k[0] | k[1] | k[2] | k[3]) == 0) continue;
    u64 m[4];
    fp_to_mont(*C, xs + 4 * src, m);
    mx.insert(mx.end(), m, m + 4);
    fp_to_mont(*C, ys + 4 * src, m);
    my.insert(my.end(), m, m + 4);
    sc.insert(sc.end(), k, k + 4);
  }
  size_t live = sc.size() / 4;
  if (live == 0) {
    *out_inf = 1;
    memset(out_x, 0, 32); memset(out_y, 0, 32);
    return;
  }

  // pick window size minimizing the mul-count model:
  //   stage1 ~ live*W*6.2, bucket sums ~ 2^(c-1)*W*27
  int c_best = 4;
  double cost_best = 1e300;
  for (int c = 4; c <= 15; c++) {
    int W = (256 + c - 1) / c + 1;
    double cost = 6.2 * (double)live * W + 27.0 * (double)(1 << (c - 1)) * W;
    if (cost < cost_best) { cost_best = cost; c_best = c; }
  }
  int c = c_best;
  int W = (256 + c - 1) / c + 1;
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
