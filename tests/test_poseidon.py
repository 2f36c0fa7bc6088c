"""Poseidon: round numbers, IOPattern tags (reference embedded vectors),
permutation equivalence with the classic formulation, RO semantics."""

import random

import pytest

from nova_tpu.fields.spec import bn254_base, pallas_base, pallas_scalar
from nova_tpu.provider import poseidon as P


def test_round_numbers():
    # t=3 (arity 2) must give neptune's canonical (8, 55)
    assert P.calc_round_numbers(3) == (8, 55)
    assert P.calc_round_numbers(6) == (8, 56)
    assert P.calc_round_numbers(25) == (8, 59)


def test_io_pattern_tags():
    # vectors from src/frontend/gadgets/poseidon/sponge/api.rs:270-316
    assert P.io_pattern_value([], 0) == 0
    assert P.io_pattern_value([], 123) == 340282366920938463463374607431768191899
    v = 340282366920938463463374607090318361668
    assert P.io_pattern_value([("absorb", 2), ("squeeze", 2)], 0) == v
    assert (
        P.io_pattern_value([("absorb", 2), ("squeeze", 2)], 1)
        == 340282366920938463463374607090314341989
    )
    assert P.io_pattern_value([("absorb", 1), ("absorb", 1), ("squeeze", 2)], 0) == v
    assert (
        P.io_pattern_value(
            [("absorb", 1), ("absorb", 1), ("squeeze", 1), ("squeeze", 1)], 0
        )
        == v
    )


@pytest.mark.parametrize("field", [pallas_base, bn254_base], ids=lambda f: f.name)
@pytest.mark.parametrize("arity", [5, 24])
def test_permutation_matches_classic(field, arity):
    """Optimized-static (sparse-factored) permutation == the classic
    ARK->sbox->MDS formulation with raw Grain constants."""
    c = P.api_constants(field, arity)
    p = field.p
    width = c.width

    def sbox(x):
        x2 = x * x % p
        return x2 * x2 % p * x % p

    def classic(state):
        el = list(state)
        half = c.full_rounds // 2
        for r in range(c.full_rounds + c.partial_rounds):
            K = c.round_constants[r * width : (r + 1) * width]
            el = [(x + k) % p for x, k in zip(el, K)]
            if r < half or r >= half + c.partial_rounds:
                el = [sbox(x) for x in el]
            else:
                el[0] = sbox(el[0])
            el = [
                sum(c.m[i][j] * el[j] for j in range(width)) % p for i in range(width)
            ]
        return el

    rng = random.Random(13)
    state = [rng.randrange(p) for _ in range(width)]
    assert P.permute(c, state) == classic(state)


def test_ro_absorb_squeeze():
    consts = P.PoseidonROConstants(pallas_base)
    rng = random.Random(99)
    ro = P.PoseidonRO(consts)
    vals = [rng.randrange(pallas_base.p) for _ in range(32)]
    for v in vals:
        ro.absorb(v)
    out = ro.squeeze(128)
    assert 0 <= out < (1 << 128)
    # state resets to [hash]; a second squeeze differs
    out2 = ro.squeeze(128)
    assert out != out2
    # forced MSB
    ro2 = P.PoseidonRO(consts)
    ro2.absorb(5)
    v = ro2.squeeze(128, start_with_one=True)
    assert (v >> 127) & 1 == 1


def test_ro_narrow_mode():
    consts = P.PoseidonROConstants(pallas_scalar)
    ro_w = P.PoseidonRO(consts, "wide")
    ro_n = P.PoseidonRO(consts, "narrow")
    for v in [1, 2, 3]:
        ro_w.absorb(v)
        ro_n.absorb(v)
    assert ro_w.squeeze(128) != ro_n.squeeze(128)


def test_sponge_multi_rate_absorb():
    """Absorbing more than `rate` elements forces mid-absorb permutations."""
    consts = P.api_constants(pallas_base, 5)
    rng = random.Random(1)
    inputs = [rng.randrange(pallas_base.p) for _ in range(13)]  # > 2 rates
    h1 = P.sponge_hash(consts, inputs)
    h2 = P.sponge_hash(consts, inputs)
    assert h1 == h2
    h3 = P.sponge_hash(consts, inputs[:-1] + [(inputs[-1] + 1) % pallas_base.p])
    assert h1 != h3
