"""Field arithmetic: host exactness + device engine vs host oracle."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from nova_tpu.fields.jfield import JField
from nova_tpu.fields.spec import (
    bn254_scalar,
    pallas_base,
    pallas_scalar,
    secp_base,
)

FIELDS = [pallas_base, pallas_scalar, bn254_scalar, secp_base]


@pytest.mark.parametrize("spec", FIELDS, ids=lambda f: f.name)
def test_host_field_basics(spec):
    rng = random.Random(7)
    for _ in range(50):
        a = rng.randrange(spec.p)
        b = rng.randrange(spec.p)
        assert spec.add(a, b) == (a + b) % spec.p
        assert spec.sub(a, b) == (a - b) % spec.p
        assert spec.mul(a, b) == a * b % spec.p
        if a:
            assert spec.mul(a, spec.inv(a)) == 1
    # sqrt roundtrip
    for _ in range(10):
        a = rng.randrange(spec.p)
        s = spec.mul(a, a)
        r = spec.sqrt(s)
        assert r is not None and spec.mul(r, r) == s


@pytest.mark.parametrize("spec", FIELDS, ids=lambda f: f.name)
def test_repr_roundtrip(spec):
    rng = random.Random(3)
    for _ in range(20):
        a = rng.randrange(spec.p)
        assert spec.from_repr(spec.to_repr(a)) == a
    assert spec.from_repr((spec.p).to_bytes(32, "little")) is None


@pytest.mark.parametrize("spec", FIELDS, ids=lambda f: f.name)
def test_batch_inv_host(spec):
    rng = random.Random(5)
    xs = [rng.randrange(1, spec.p) for _ in range(33)] + [0]
    out = spec.batch_inv(xs)
    for x, ix in zip(xs, out):
        assert ix == (spec.inv(x) if x else 0)


@pytest.mark.parametrize("spec", FIELDS, ids=lambda f: f.name)
def test_device_field_vs_host(spec):
    jf = JField(spec)
    rng = random.Random(42)
    N = 32
    a_int = [rng.randrange(spec.p) for _ in range(N - 4)] + [0, 1, spec.p - 1, 2]
    b_int = [rng.randrange(spec.p) for _ in range(N - 4)] + [spec.p - 1, 0, 1, 2]
    a = jnp.asarray(jf.pack(a_int))
    b = jnp.asarray(jf.pack(b_int))
    to_mont = jf.jit("to_mont")
    am, bm = to_mont(a), to_mont(b)

    assert jf.unpack(jf.jit("from_mont")(jf.jit("mont_mul")(am, bm))) == [
        spec.mul(x, y) for x, y in zip(a_int, b_int)
    ]
    assert jf.unpack(jf.jit("add")(a, b)) == [spec.add(x, y) for x, y in zip(a_int, b_int)]
    assert jf.unpack(jf.jit("sub")(a, b)) == [spec.sub(x, y) for x, y in zip(a_int, b_int)]
    assert jf.unpack(jf.jit("neg")(a)) == [spec.neg(x) for x in a_int]


@pytest.mark.parametrize("spec", [pallas_base, bn254_scalar], ids=lambda f: f.name)
def test_device_inv(spec):
    jf = JField(spec)
    rng = random.Random(1)
    a_int = [rng.randrange(1, spec.p) for _ in range(8)]
    am = jf.jit("to_mont")(jnp.asarray(jf.pack(a_int)))
    got = jf.unpack(jf.jit("from_mont")(jf.jit("inv")(am)))
    assert got == [spec.inv(x) for x in a_int]
    got2 = jf.unpack(jf.jit("from_mont")(jf.jit("batch_inv_tree")(am)))
    assert got2 == [spec.inv(x) for x in a_int]


@pytest.mark.parametrize("spec", [pallas_base], ids=lambda f: f.name)
def test_device_mul_small(spec):
    jf = JField(spec)
    rng = random.Random(9)
    N = 16
    a_int = [rng.randrange(spec.p) for _ in range(N)]
    ks = [rng.randrange(1, 1 << 15) for _ in range(N)]
    am = jf.jit("to_mont")(jnp.asarray(jf.pack(a_int)))
    got = jf.unpack(
        jf.jit("from_mont")(jf.jit("mul_small")(am, jnp.asarray(np.array(ks, dtype=np.uint32))))
    )
    assert got == [spec.mul(x, k) for x, k in zip(a_int, ks)]
