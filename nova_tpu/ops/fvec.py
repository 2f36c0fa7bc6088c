"""FVec: device-resident field vectors — the canonical prover state.

Round-1 kept every witness/error/cross-term vector as a Python ``int``
list, paying bigint pack/unpack marshalling on every kernel call (the
reference keeps contiguous in-memory vectors throughout,
src/r1cs/mod.rs:533-580). An ``FVec`` holds the vector as a Montgomery
``(n, 16) uint32`` device array and quacks like an immutable
``Sequence[int]``: any legacy call site that iterates or indexes gets
lazily-materialized (cached) host ints, while hot paths dispatch on
``isinstance(v, FVec)`` and stay on device end to end. Host conversion
then happens only at transcript and serialization boundaries.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from nova_tpu.fields.jfield import JField
from nova_tpu.fields.spec import NUM_LIMBS, FieldSpec


@functools.partial(jax.jit, static_argnums=(0,))
def _axpy_k(pkey: int, am, bm, rm):
    jf = JField._instances[pkey]
    return jf.add(am, jf.mont_mul(rm, bm))


@functools.partial(jax.jit, static_argnums=(0,))
def _axpy2_k(pkey: int, am, bm, rm, cm, r2m):
    jf = JField._instances[pkey]
    s = jf.add(am, jf.mont_mul(rm, bm))
    return jf.add(s, jf.mont_mul(r2m, cm))


@functools.partial(jax.jit, static_argnums=(0,))
def _add_k(pkey: int, am, bm):
    return JField._instances[pkey].add(am, bm)


@functools.partial(jax.jit, static_argnums=(0,))
def _sub_k(pkey: int, am, bm):
    return JField._instances[pkey].sub(am, bm)


@functools.partial(jax.jit, static_argnums=(0,))
def _mul_k(pkey: int, am, bm):
    return JField._instances[pkey].mont_mul(am, bm)


@functools.partial(jax.jit, static_argnums=(0,))
def _scale_k(pkey: int, am, rm):
    return JField._instances[pkey].mont_mul(rm, am)


@functools.partial(jax.jit, static_argnums=(0,))
def _to_mont_k(pkey: int, a):
    return JField._instances[pkey].to_mont(a)


@functools.partial(jax.jit, static_argnums=(0,))
def _from_mont_k(pkey: int, am):
    return JField._instances[pkey].from_mont(am)


class FVec:
    """An immutable field vector resident on device (Montgomery limbs).

    ``m``: (n, NUM_LIMBS) uint32 Montgomery-form device array.
    Sequence protocol materializes standard-form host ints lazily.
    """

    __slots__ = ("jf", "m", "_ints", "_limbs64")

    def __init__(self, jf: JField, m, ints=None):
        self.jf = jf
        self.m = m
        self._ints = ints

    # -- construction ---------------------------------------------------

    @staticmethod
    def from_ints(field: Union[FieldSpec, JField], ints: Sequence[int]) -> "FVec":
        jf = field if isinstance(field, JField) else JField(field)
        ints = list(ints)
        m = _to_mont_k(jf.spec.p, jnp.asarray(jf.pack(ints)))
        return FVec(jf, m, ints)

    @staticmethod
    def zeros(field: Union[FieldSpec, JField], n: int) -> "FVec":
        jf = field if isinstance(field, JField) else JField(field)
        return FVec(jf, jnp.zeros((n, NUM_LIMBS), jnp.uint32), [0] * n)

    @staticmethod
    def coerce(field: Union[FieldSpec, JField], v) -> "FVec":
        if isinstance(v, FVec):
            return v
        return FVec.from_ints(field, v)

    # -- host materialization ------------------------------------------

    def to_ints(self) -> List[int]:
        if self._ints is None:
            from nova_tpu import native

            if native.available():
                self._ints = native.limbs_to_ints(self.limbs64())
            else:
                self._ints = self.jf.unpack(
                    _from_mont_k(self.jf.spec.p, self.m)
                )
        return self._ints

    def limbs64(self) -> "np.ndarray":
        """(n, 4) uint64 little-endian normal-form limbs (the host-native
        kernels' boundary format), cached. Pulls the RAW Montgomery limbs
        off device (pure copy) and REDCs in C — ~10x cheaper than running
        the from_mont program through eager XLA:CPU on the fold path."""
        l64 = getattr(self, "_limbs64", None)
        if l64 is None:
            from nova_tpu import native

            if native.available():
                a = np.asarray(jax.device_get(self.m)).astype(np.uint64)
                mont64 = np.ascontiguousarray(
                    a[:, 0::4] | (a[:, 1::4] << 16)
                    | (a[:, 2::4] << 32) | (a[:, 3::4] << 48)
                )
                l64 = native.vec_from_mont_l(self.jf.spec.p, mont64)
            else:
                a = np.asarray(
                    jax.device_get(_from_mont_k(self.jf.spec.p, self.m))
                ).astype(np.uint64)
                l64 = np.ascontiguousarray(
                    a[:, 0::4] | (a[:, 1::4] << 16)
                    | (a[:, 2::4] << 32) | (a[:, 3::4] << 48)
                )
            object.__setattr__(self, "_limbs64", l64)
        return l64

    # -- Sequence protocol ---------------------------------------------

    def __len__(self) -> int:
        return int(self.m.shape[0])

    def __getitem__(self, i):
        ints = self.to_ints()
        if isinstance(i, slice):
            return ints[i]
        return ints[i]

    def __iter__(self):
        return iter(self.to_ints())

    def __eq__(self, other):
        if isinstance(other, FVec):
            other = other.to_ints()
        if isinstance(other, (list, tuple)):
            return self.to_ints() == list(other)
        return NotImplemented

    def __repr__(self):
        return f"FVec(n={len(self)}, field={self.jf.spec.name})"

    # -- device ops (all return FVec, no host sync) ---------------------

    def _const(self, r: int):
        return self.jf.const_mont(int(r) % self.jf.spec.p, self.m)

    def axpy(self, r: int, other: "FVec") -> "FVec":
        """self + r*other."""
        return FVec(
            self.jf, _axpy_k(self.jf.spec.p, self.m, other.m, self._const(r))
        )

    def axpy2(self, r: int, o1: "FVec", r2: int, o2: "FVec") -> "FVec":
        """self + r*o1 + r2*o2."""
        return FVec(
            self.jf,
            _axpy2_k(
                self.jf.spec.p, self.m, o1.m, self._const(r), o2.m,
                self._const(r2),
            ),
        )

    def add(self, other: "FVec") -> "FVec":
        return FVec(self.jf, _add_k(self.jf.spec.p, self.m, other.m))

    def sub(self, other: "FVec") -> "FVec":
        return FVec(self.jf, _sub_k(self.jf.spec.p, self.m, other.m))

    def mul(self, other: "FVec") -> "FVec":
        return FVec(self.jf, _mul_k(self.jf.spec.p, self.m, other.m))

    def scale(self, r: int) -> "FVec":
        return FVec(self.jf, _scale_k(self.jf.spec.p, self.m, self._const(r)))

    def pad_to(self, n: int) -> "FVec":
        cur = len(self)
        if cur == n:
            return self
        assert n > cur
        m = jnp.concatenate(
            [self.m, jnp.zeros((n - cur, NUM_LIMBS), jnp.uint32)]
        )
        ints = None if self._ints is None else self._ints + [0] * (n - cur)
        return FVec(self.jf, m, ints)

    def concat_ints(self, tail: Sequence[int]) -> "FVec":
        """Append a short host-side tail (u, X io values) on device."""
        tail = [int(t) % self.jf.spec.p for t in tail]
        tm = _to_mont_k(self.jf.spec.p, jnp.asarray(self.jf.pack(tail)))
        ints = None if self._ints is None else self._ints + tail
        return FVec(self.jf, jnp.concatenate([self.m, tm]), ints)


def as_list(v) -> list:
    """Materialize host ints from an FVec/HVec or pass a list through."""
    if isinstance(v, FVec):
        return v.to_ints()
    if isinstance(v, HVec):
        return v.to_ints()
    return list(v)


class HVec:
    """Host-side analog of FVec: a field vector held as (n,4) uint64
    normal-form limbs (the native kernels' boundary format) with lazily
    materialized Python ints. The host fold path keeps witness/error/T
    vectors in this form so per-step kernels pay no int round trips."""

    __slots__ = ("p", "_l", "_ints")

    def __init__(self, p: int, limbs=None, ints=None):
        assert limbs is not None or ints is not None
        self.p = p
        self._l = limbs
        self._ints = list(ints) if ints is not None else None

    def limbs64(self) -> "np.ndarray":
        if self._l is None:
            from nova_tpu import native

            self._l = native.ints_to_limbs([x % self.p for x in self._ints])
        return self._l

    def to_ints(self) -> List[int]:
        if self._ints is None:
            from nova_tpu import native

            self._ints = native.limbs_to_ints(self._l)
        return self._ints

    def __len__(self):
        return self._l.shape[0] if self._l is not None else len(self._ints)

    def __iter__(self):
        return iter(self.to_ints())

    def __getitem__(self, i):
        return self.to_ints()[i]

    def __eq__(self, other):
        if isinstance(other, HVec):
            return self.to_ints() == other.to_ints()
        if isinstance(other, (list, tuple)):
            return self.to_ints() == list(other)
        return NotImplemented
