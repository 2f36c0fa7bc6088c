"""Vectorized Montgomery field arithmetic for the TPU.

Representation: a vector of N field elements is a ``(N, 16) uint32`` array of
16-bit little-endian limbs, in Montgomery form (x·R mod p, R = 2^256).

Why 16-bit limbs in 32-bit lanes: the TPU integer datapath is 32-bit (no
64-bit multiplier). A 16x16-bit product fits exactly in a uint32 lane, and
splitting each product into lo/hi 16-bit halves keeps all column sums below
2^22 during schoolbook accumulation — no carries needed until the end. This
replaces halo2curves' x86_64 assembly Montgomery arithmetic (reference
Cargo.toml:35-41; SURVEY.md §2.9 item 1, §7 hard-part 1).

All functions are pure jnp (XLA fuses the elementwise chains); they operate
on arbitrary leading batch dims. Limbs are manipulated as Python lists of
``(...,)`` arrays so XLA sees a flat fused graph with static structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nova_tpu.fields.spec import LIMB_BITS, LIMB_MASK, NUM_LIMBS, FieldSpec

MASK = jnp.uint32(LIMB_MASK)


def _split(x):
    """(..., 16) -> list of 16 (...,) arrays."""
    return [x[..., i] for i in range(NUM_LIMBS)]


def _join(limbs):
    return jnp.stack(limbs, axis=-1)


class JField:
    """Device engine bound to one FieldSpec. All heavy methods are
    jit-friendly pure functions of (N, 16) uint32 arrays."""

    _instances: dict = {}

    def __new__(cls, spec: FieldSpec):
        if spec.p in cls._instances:
            return cls._instances[spec.p]
        self = super().__new__(cls)
        self.spec = spec
        self.p_limbs = np.array(spec.p_limbs, dtype=np.uint32)
        self.n0inv = np.uint32(spec.n0inv)
        from nova_tpu.fields.spec import to_limbs

        self.r_limbs = np.array(to_limbs(spec.r), dtype=np.uint32)  # mont(1)
        self.r2_limbs = np.array(to_limbs(spec.r2), dtype=np.uint32)
        # exponent bits of p-2 (LSB first) for Fermat inversion
        e = spec.p - 2
        self.inv_exp_bits = np.array(
            [(e >> i) & 1 for i in range(spec.num_bits)], dtype=np.uint32
        )
        self._jit_cache = {}
        cls._instances[spec.p] = self
        return self

    def jit(self, name: str):
        """jit-compiled version of a method (cached). Use for any call made
        outside an enclosing jit region — eager limb arithmetic dispatches
        thousands of tiny ops otherwise."""
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(getattr(self, name))
        return self._jit_cache[name]

    # ------------------------------------------------------------------
    # host <-> device marshalling
    # ------------------------------------------------------------------

    def pack(self, values) -> np.ndarray:
        """Python ints (standard form) -> (N, 16) uint32 numpy array of
        16-bit limbs (still standard form; call to_mont for compute)."""
        n = len(values)
        buf = b"".join(int(v).to_bytes(32, "little") for v in values)
        u16 = np.frombuffer(buf, dtype="<u2").reshape(n, NUM_LIMBS)
        return u16.astype(np.uint32)

    def unpack(self, arr) -> list:
        """(N, 16) uint32 -> list of Python ints (standard form)."""
        a = np.asarray(jax.device_get(arr)).astype(np.uint16)
        return [
            int.from_bytes(row.astype("<u2").tobytes(), "little") for row in a
        ]

    # ------------------------------------------------------------------
    # core modular arithmetic on (..., 16) uint32 (Montgomery domain)
    # ------------------------------------------------------------------

    def _cond_sub_p(self, limbs, overflow=None):
        """One conditional subtract of p. `limbs`: 16 exact 16-bit limbs.
        `overflow`: optional (...,) uint32 counting 2^256 overflow (must
        leave value < 2p for a single subtract to fully reduce)."""
        p = self.p_limbs
        borrow = jnp.zeros_like(limbs[0])
        diff = []
        for i in range(NUM_LIMBS):
            d = limbs[i] - jnp.uint32(p[i]) - borrow
            diff.append(d & MASK)
            borrow = (d >> 31) & jnp.uint32(1)
        need = borrow == 0  # value >= p
        if overflow is not None:
            need = need | (overflow > 0)
        return [jnp.where(need, d, l) for d, l in zip(diff, limbs)]

    def _carry_propagate(self, cols):
        """Carry-propagate K redundant uint32 columns (< 2^31 each) into
        K exact 16-bit limbs plus a final carry limb (< 2^16)."""
        out = []
        carry = jnp.zeros_like(cols[0])
        for c in cols:
            v = c + carry
            out.append(v & MASK)
            carry = v >> LIMB_BITS
        out.append(carry)
        return out

    def reduce_wide(self, cols):
        """Reduce a redundant column value (list of K uint32 columns, each
        < 2^31, 16 <= K <= 32) to canonical limbs < p, returned joined.

        Strategy: X = X_lo + 2^256·X_hi; X_hi·2^256 mod p = mont_mul(X_hi,
        R^2) since mont_mul(a, R^2) = a·R = a·2^256 mod p. X_lo < 2^256 < 4p
        for all supported fields, handled by conditional subtracts."""
        assert len(cols) <= 2 * NUM_LIMBS
        limbs = self._carry_propagate(cols)  # K+1 exact limbs
        lo = limbs[:NUM_LIMBS]
        hi = limbs[NUM_LIMBS:]
        # reduce lo (< 2^256 < 4p): up to two conditional subtracts of 2p, p
        lo = self._cond_sub_2p(lo)
        lo = self._cond_sub_p(lo)
        lo = self._cond_sub_p(lo)
        if all(isinstance(h, jnp.ndarray) or True for h in hi) and len(hi) > 0:
            hi_vec = _join(hi + [jnp.zeros_like(limbs[0])] * (NUM_LIMBS - len(hi)))
            r2 = jnp.broadcast_to(jnp.asarray(self.r2_limbs), hi_vec.shape).astype(
                jnp.uint32
            )
            hi_red = self.mont_mul(hi_vec, r2)  # = X_hi · 2^256 mod p
            return self.add(_join(lo), hi_red)
        return _join(lo)

    def _cond_sub_2p(self, limbs):
        """Conditional subtract of 2p (2p < 2^257 requires p < 2^255: true
        for pasta/bn254; for secp-like p ~ 2^256, 2p > value always so the
        subtract never triggers — handled by the borrow check)."""
        two_p = 2 * self.spec.p
        if two_p >= 1 << (16 * NUM_LIMBS):
            return limbs  # 2p >= 2^256 > value: nothing to do
        from nova_tpu.fields.spec import to_limbs

        tp = to_limbs(two_p)
        borrow = jnp.zeros_like(limbs[0])
        diff = []
        for i in range(NUM_LIMBS):
            d = limbs[i] - jnp.uint32(tp[i]) - borrow
            diff.append(d & MASK)
            borrow = (d >> 31) & jnp.uint32(1)
        need = borrow == 0
        return [jnp.where(need, d, l) for d, l in zip(diff, limbs)]

    def add(self, a, b):
        al, bl = _split(a), _split(b)
        cols = [x + y for x, y in zip(al, bl)]
        limbs = []
        carry = jnp.zeros_like(cols[0])
        for c in cols:
            v = c + carry
            limbs.append(v & MASK)
            carry = v >> LIMB_BITS
        limbs = self._cond_sub_p(limbs, overflow=carry)
        return _join(limbs)

    def sub(self, a, b):
        al, bl = _split(a), _split(b)
        p = self.p_limbs
        borrow = jnp.zeros_like(al[0])
        diff = []
        for i in range(NUM_LIMBS):
            d = al[i] - bl[i] - borrow
            diff.append(d & MASK)
            borrow = (d >> 31) & jnp.uint32(1)
        # if borrow, add p back
        carry = jnp.zeros_like(borrow)
        out = []
        for i in range(NUM_LIMBS):
            v = diff[i] + jnp.where(borrow > 0, jnp.uint32(p[i]), jnp.uint32(0)) + carry
            out.append(v & MASK)
            carry = v >> LIMB_BITS
        return _join(out)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    def double(self, a):
        return self.add(a, a)

    @staticmethod
    def _diag_sums(m2d):
        """Anti-diagonal sums of a (..., 16, 16) tensor: out[..., k] =
        sum_{i+j=k} m2d[..., i, j], k = 0..30, returned as (..., 32).

        Uses the pad-flatten-reshape trick: padding rows to width 33 and
        re-chunking the flat buffer with stride 32 aligns index 33i+j with
        32i+(i+j), so a sum over the stride-32 chunks groups equal i+j."""
        batch = m2d.shape[:-2]
        f = jnp.pad(m2d, [(0, 0)] * len(batch) + [(0, 0), (0, 17)])
        flat = f.reshape(batch + (16 * 33,))[..., : 16 * 32]
        return flat.reshape(batch + (16, 32)).sum(axis=-2, dtype=jnp.uint32)

    def mont_mul(self, a, b):
        """Montgomery product: a·b·R^{-1} mod p on (..., 16) uint32.

        Layout: limbs move to a LEADING axis so the batch axis stays in the
        TPU lane dimension throughout — the outer product is (16, 16, ...)
        and columns are a (33, ...) array indexed/updated with static
        leading-axis slices. This keeps the compiled graph small (~200 HLO
        ops; a fully unrolled per-column form was ~1800 and took minutes to
        compile per kernel) while avoiding the degenerate T(8,128) tiling
        of limb-minor intermediates.

        Phase 1 (schoolbook product): outer product + anti-diagonal sums
        via the pad-flatten-reshape trick on leading axes. Column sums stay
        < 2^21, no carries needed.
        Phase 2 (Montgomery reduction): 16 sequential limb steps, each a
        few vector ops. Result < 2p, fixed by conditional subtract.

        On TPU backends the whole routine runs as a single Pallas kernel
        with all intermediates in registers (~7x the fused-XLA form).
        """
        from nova_tpu.fields.pallas_kernels import mont_mul_pallas, pallas_available

        if pallas_available():
            shape = jnp.broadcast_shapes(a.shape, b.shape)
            return mont_mul_pallas(
                self, jnp.broadcast_to(a, shape), jnp.broadcast_to(b, shape)
            )

        n = NUM_LIMBS
        at = jnp.moveaxis(a, -1, 0)  # (16, ...)
        bt = jnp.moveaxis(b, -1, 0)
        batch = at.shape[1:]

        prod = at[:, None] * bt[None, :]  # (16, 16, ...), exact in uint32
        lo = prod & MASK
        hi = prod >> LIMB_BITS

        def diag_sums(m2d):
            # out[k] = sum_{i+j=k} m2d[i, j], k = 0..30, as (32, ...):
            # pad rows to width 33 so flat index 33*i + j aligns with
            # 32*i + (i+j); summing stride-32 chunks groups equal i+j.
            f = jnp.pad(m2d, [(0, 0), (0, 17)] + [(0, 0)] * len(batch))
            flat = f.reshape((16 * 33,) + batch)[: 16 * 32]
            return flat.reshape((16, 32) + batch).sum(axis=0, dtype=jnp.uint32)

        lo_sums = diag_sums(lo)  # (32, ...)
        hi_sums = diag_sums(hi)
        zero_col = jnp.zeros((1,) + batch, jnp.uint32)
        cols = (
            jnp.concatenate([lo_sums, zero_col], axis=0)
            + jnp.concatenate([zero_col, hi_sums], axis=0)
        )  # (33, ...)

        p_l = jnp.asarray(self.p_limbs, jnp.uint32).reshape((n,) + (1,) * len(batch))
        n0 = self.n0inv
        carry = jnp.zeros(batch, jnp.uint32)
        for i in range(n):
            t = cols[i] + carry
            m = (t * n0) & MASK
            pm = m[None] * p_l  # (16, ...)
            pm_lo = pm & MASK
            pm_hi = pm >> LIMB_BITS
            tmp = t + pm_lo[0]
            carry = (tmp >> LIMB_BITS) + pm_hi[0]
            cols = cols.at[i + 1 : i + n].add(pm_lo[1:])
            cols = cols.at[i + 2 : i + n + 1].add(pm_hi[1:])
        # result = cols[n..2n] + carry chain; total value < 2p
        limbs = []
        c = carry
        for k in range(n, 2 * n):
            v = cols[k] + c
            limbs.append(v & MASK)
            c = v >> LIMB_BITS
        overflow = c  # 0 or 1 since value < 2p < 2^258
        limbs = self._cond_sub_p(limbs, overflow=overflow)
        return _join(limbs)

    def square(self, a):
        return self.mont_mul(a, a)

    def mul_small(self, a, k_arr):
        """a · k for small uint32 k < 2^15 (k_arr shape (...,)), staying in
        the same (Montgomery) domain. Cost: 16 lane muls + reduce."""
        al = _split(a)
        cols = []
        zero = jnp.zeros_like(al[0])
        acc = [zero] * (NUM_LIMBS + 1)
        for i in range(NUM_LIMBS):
            prod = al[i] * k_arr
            acc[i] = acc[i] + (prod & MASK)
            acc[i + 1] = acc[i + 1] + (prod >> LIMB_BITS)
        return self.reduce_wide(acc)

    def to_mont(self, a):
        r2 = jnp.broadcast_to(jnp.asarray(self.r2_limbs), a.shape).astype(jnp.uint32)
        return self.mont_mul(a, r2)

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mont_mul(a, one)

    def one_mont(self, shape_like):
        """Montgomery 1 (= R mod p) broadcast to `shape_like`'s shape."""
        return jnp.broadcast_to(jnp.asarray(self.r_limbs), shape_like.shape).astype(
            jnp.uint32
        )

    def const_mont(self, value: int, shape_like):
        """A constant field element (standard form int) broadcast in
        Montgomery form."""
        from nova_tpu.fields.spec import to_limbs

        m = to_limbs(self.spec.to_mont(value % self.spec.p))
        return jnp.broadcast_to(
            jnp.asarray(np.array(m, dtype=np.uint32)), shape_like.shape
        ).astype(jnp.uint32)

    def zero(self, shape_like):
        return jnp.zeros_like(shape_like)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, cond, a, b):
        """where(cond, a, b) with cond (...,) broadcast over limbs."""
        return jnp.where(cond[..., None], a, b)

    def pow_fixed(self, a, exp_bits):
        """a^e via scan over static exponent bits (LSB first), Montgomery
        in/out."""
        one = self.one_mont(a)

        def body(carry, bit):
            result, base = carry
            mult = self.mont_mul(result, base)
            result = self.select(
                jnp.broadcast_to(bit > 0, result.shape[:-1]), mult, result
            )
            base = self.mont_mul(base, base)
            return (result, base), None

        (result, _), _ = jax.lax.scan(body, (one, a), jnp.asarray(exp_bits))
        return result

    def inv(self, a):
        """Fermat inversion a^{p-2} (maps 0 -> 0)."""
        return self.pow_fixed(a, self.inv_exp_bits)

    def batch_inv_tree(self, a):
        """Batch inversion via product tree: ~3 muls/element + one Fermat
        inversion. `a` is (N, 16) with N a power of two; zeros map to zero."""
        n = a.shape[0]
        assert n & (n - 1) == 0, "batch_inv_tree needs power-of-two N"
        one = self.one_mont(a)
        is_z = self.is_zero(a)
        a_safe = self.select(is_z, one, a)
        levels = [a_safe]
        cur = a_safe
        while cur.shape[0] > 1:
            cur = self.mont_mul(cur[0::2], cur[1::2])
            levels.append(cur)
        inv = self.inv(levels[-1])
        for lvl in reversed(levels[:-1]):
            left, right = lvl[0::2], lvl[1::2]
            inv_left = self.mont_mul(inv, right)
            inv_right = self.mont_mul(inv, left)
            inv = jnp.stack([inv_left, inv_right], axis=1).reshape(-1, NUM_LIMBS)
        return self.select(is_z, jnp.zeros_like(a), inv)
