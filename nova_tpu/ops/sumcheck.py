"""Device sumcheck kernels (SURVEY.md §3.5 hot loop 3).

Each sumcheck round is two device dispatches:
  1. round-sums kernel: the three interpolation sums (P(0), leading coeff,
     P(-1)) over the bottom/top halves of the tables — elementwise
     Montgomery muls fused into a log-tree field reduction;
  2. bind kernel: Z' = lo + r*(hi - lo) for every table, halving them.
The tables stay resident on device between rounds (Montgomery (N, 16)
uint32); only 3 scalars/round cross to the host for the transcript, and
the challenge r crosses back.

Sharding: tables partition on N across a mesh; the round sums are
per-device partials reduced by gather + field add (see nova_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nova_tpu.fields.jfield import JField
from nova_tpu.fields.spec import FieldSpec, NUM_LIMBS


def _field_tree_sum(jf, arr):
    """(N, 16) Montgomery -> (1, 16) field sum via halving adds."""
    v = arr
    while v.shape[0] > 1:
        n = v.shape[0]
        if n % 2 == 1:
            v = jnp.concatenate([v, jnp.zeros((1, NUM_LIMBS), v.dtype)], axis=0)
            n += 1
        v = jf.add(v[: n // 2], v[n // 2:])
    return v


@functools.partial(jax.jit, static_argnums=(0,))
def _cubic_eq_round_kernel(field_p: int, eqZ, AZ, BZ, CZ):
    """Round sums for sum eq * (A*B - C): returns (P(0), lead, P(-1)) as
    (16,) Montgomery limb vectors."""
    jf = JField._instances[field_p]
    half = AZ.shape[0] // 2

    def split(Z):
        return Z[:half], Z[half:]

    elo, ehi = split(eqZ)
    alo, ahi = split(AZ)
    blo, bhi = split(BZ)
    clo, chi = split(CZ)
    de, da = jf.sub(ehi, elo), jf.sub(ahi, alo)
    db, dc = jf.sub(bhi, blo), jf.sub(chi, clo)

    e0 = jf.mont_mul(elo, jf.sub(jf.mont_mul(alo, blo), clo))
    c3 = jf.mont_mul(de, jf.mont_mul(da, db))
    am, bm, cm = jf.sub(alo, da), jf.sub(blo, db), jf.sub(clo, dc)
    em1 = jf.mont_mul(jf.sub(elo, de), jf.sub(jf.mont_mul(am, bm), cm))

    return (
        _field_tree_sum(jf, e0)[0],
        _field_tree_sum(jf, c3)[0],
        _field_tree_sum(jf, em1)[0],
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _quad_round_kernel(field_p: int, AZ, BZ):
    """Round sums for sum A*B: returns (P(0), quad coeff)."""
    jf = JField._instances[field_p]
    half = AZ.shape[0] // 2
    alo, ahi = AZ[:half], AZ[half:]
    blo, bhi = BZ[:half], BZ[half:]
    e0 = jf.mont_mul(alo, blo)
    coeff = jf.mont_mul(jf.sub(ahi, alo), jf.sub(bhi, blo))
    return _field_tree_sum(jf, e0)[0], _field_tree_sum(jf, coeff)[0]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _bind_kernel(field_p: int, k: int, r_mont, *polys):
    """Bind the top variable of k tables: Z' = lo + r*(hi - lo)."""
    jf = JField._instances[field_p]
    out = []
    for Z in polys:
        half = Z.shape[0] // 2
        lo, hi = Z[:half], Z[half:]
        rb = jnp.broadcast_to(r_mont, lo.shape)
        out.append(jf.add(lo, jf.mont_mul(rb, jf.sub(hi, lo))))
    return tuple(out)


class DevicePoly:
    """A multilinear evaluation table resident on device (Montgomery)."""

    __slots__ = ("jf", "Z", "n")

    def __init__(self, field: FieldSpec, values: Sequence[int] = None, _dev=None):
        self.jf = JField(field)
        if _dev is not None:
            self.Z = _dev
        else:
            to_mont = self.jf.jit("to_mont")
            self.Z = to_mont(jnp.asarray(self.jf.pack(list(values))))
        self.n = int(self.Z.shape[0])

    def to_host(self) -> List[int]:
        return self.jf.unpack(self.jf.from_mont(self.Z))

    def final_value(self) -> int:
        assert self.n == 1
        return self.to_host()[0]


class DeviceSumcheck:
    """Drives device-resident sumcheck rounds; transcript stays on host."""

    def __init__(self, field: FieldSpec):
        self.field = field
        self.jf = JField(field)

    def _scalar_mont(self, x: int):
        return self.jf.const_mont(x % self.field.p, jnp.zeros((1, NUM_LIMBS), jnp.uint32))[0]

    def _out(self, v) -> int:
        return self.jf.unpack(self.jf.from_mont(v.reshape(1, NUM_LIMBS)))[0]

    def cubic_eq_round(self, eq: DevicePoly, A: DevicePoly, B: DevicePoly, C: DevicePoly):
        e0, c3, em1 = _cubic_eq_round_kernel(self.field.p, eq.Z, A.Z, B.Z, C.Z)
        return self._out(e0), self._out(c3), self._out(em1)

    def quad_round(self, A: DevicePoly, B: DevicePoly):
        e0, coeff = _quad_round_kernel(self.field.p, A.Z, B.Z)
        return self._out(e0), self._out(coeff)

    def bind(self, r: int, polys: List[DevicePoly]):
        r_mont = self._scalar_mont(r)
        outs = _bind_kernel(self.field.p, len(polys), r_mont, *(pl.Z for pl in polys))
        for pl, z in zip(polys, outs):
            pl.Z = z
            pl.n = int(z.shape[0])


def prove_cubic_with_three_inputs_device(
    field: FieldSpec, claim: int, taus: Sequence[int], Az, Bz, Cz, transcript
) -> Tuple[object, List[int], List[int]]:
    """Device-resident variant of SumcheckProof.prove_cubic_with_three_inputs
    (same transcript/proof format; used above DEVICE_THRESHOLD)."""
    from nova_tpu.spartan.polys import EqPolynomial, UniPoly
    from nova_tpu.spartan.sumcheck import SumcheckProof

    p = field.p
    num_rounds = len(taus)
    sc = DeviceSumcheck(field)
    eq = DevicePoly(field, EqPolynomial.evals_from_points(field, list(taus)))
    A = DevicePoly(field, Az)
    B = DevicePoly(field, Bz)
    C = DevicePoly(field, Cz)

    r_out: List[int] = []
    polys = []
    claim_per_round = claim % p
    for _ in range(num_rounds):
        e0, c3, em1 = sc.cubic_eq_round(eq, A, B, C)
        poly = UniPoly.from_evals_deg3(field, [e0, (claim_per_round - e0) % p, c3, em1])
        transcript.absorb(b"p", poly)
        r_i = transcript.squeeze(b"c")
        r_out.append(r_i)
        polys.append(poly.compress())
        claim_per_round = poly.evaluate(r_i)
        sc.bind(r_i, [eq, A, B, C])

    return (
        SumcheckProof(polys),
        r_out,
        [A.final_value(), B.final_value(), C.final_value()],
    )
