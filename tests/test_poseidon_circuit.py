"""In-circuit Poseidon RO must agree with the native RO and satisfy its own
constraints (reference pattern: src/provider/poseidon.rs:286-353)."""

import random

import pytest

from nova_tpu.frontend import AllocatedNum, TestConstraintSystem
from nova_tpu.gadgets.poseidon_circuit import PoseidonROCircuit
from nova_tpu.provider.engines import Bn256EngineIPA, PallasEngine, Secp256k1Engine
from nova_tpu.provider.poseidon import PoseidonRO

ENGINES = [PallasEngine, Bn256EngineIPA, Secp256k1Engine]


@pytest.mark.parametrize("engine", ENGINES, ids=lambda e: e.name)
@pytest.mark.parametrize("mode,num_absorbs", [("wide", 32), ("narrow", 4)])
def test_poseidon_ro_native_vs_circuit(engine, mode, num_absorbs):
    rng = random.Random(17)
    constants = engine.ro_constants()
    ro = PoseidonRO(constants, mode)
    ro_gadget = PoseidonROCircuit(constants, mode)
    cs = TestConstraintSystem(engine.base)
    for _ in range(num_absorbs):
        num = rng.randrange(engine.base.p)
        ro.absorb(num)
        gadget_num = AllocatedNum.alloc(cs, num)
        ro_gadget.absorb(gadget_num)
    native = ro.squeeze(128)
    bits = ro_gadget.squeeze(cs, 128)
    circuit_val = sum((1 << i) for i, b in enumerate(bits) if b.get_value())
    assert native == circuit_val
    assert cs.is_satisfied(), f"unsat at {cs.which_is_unsatisfied()}"


def test_poseidon_ro_circuit_start_with_one():
    engine = PallasEngine
    constants = engine.ro_constants()
    ro = PoseidonRO(constants)
    ro_gadget = PoseidonROCircuit(constants)
    cs = TestConstraintSystem(engine.base)
    ro.absorb(7)
    num = AllocatedNum.alloc(cs, 7)
    ro_gadget.absorb(num)
    native = ro.squeeze(128, start_with_one=True)
    bits = ro_gadget.squeeze(cs, 128, start_with_one=True)
    circuit_val = sum((1 << i) for i, b in enumerate(bits) if b.get_value())
    assert native == circuit_val
    assert (circuit_val >> 127) & 1 == 1
    assert cs.is_satisfied()


def test_squeeze_scalar_matches_native():
    engine = PallasEngine
    constants = engine.ro_constants()
    ro = PoseidonRO(constants)
    ro_gadget = PoseidonROCircuit(constants)
    cs = TestConstraintSystem(engine.base)
    for v in [3, 5, 9]:
        ro.absorb(v)
        ro_gadget.absorb(AllocatedNum.alloc(cs, v))
    assert ro.squeeze_scalar() == ro_gadget.squeeze_scalar(cs).get_value()
    assert cs.is_satisfied()


def test_compact_mode_same_value_more_constraints():
    engine = PallasEngine
    constants = engine.ro_constants()
    vals = [11, 22, 33]

    def run(compact):
        cs = TestConstraintSystem(engine.base)
        g = PoseidonROCircuit(constants, compact=compact)
        for v in vals:
            g.absorb(AllocatedNum.alloc(cs, v))
        out = g.squeeze_scalar(cs)
        assert cs.is_satisfied()
        return out.get_value(), cs.num_constraints()

    v1, c1 = run(False)
    v2, c2 = run(True)
    assert v1 == v2
    assert c2 > c1


def test_fast_witness_path_matches_gadget_path():
    """The flat per-permutation witness evaluator must fill exactly the
    same aux slots with the same values as the closure-chain gadget path
    (both sponge modes, compact and non-compact)."""
    import os

    from nova_tpu.frontend.tape import TapeCS, trace_mode
    from nova_tpu.frontend.num import AllocatedNum
    from nova_tpu.gadgets.poseidon_circuit import PoseidonROCircuit
    from nova_tpu.provider.engines import PallasEngine
    from nova_tpu.provider.poseidon import PoseidonROConstants

    f = PallasEngine.scalar

    def run(mode, compact):
        consts = PoseidonROConstants(f)
        cs = TapeCS(f)
        with trace_mode():
            ro = PoseidonROCircuit(consts, mode=mode, compact=compact)
            vals = [123456789 + i for i in range(7)]
            for v in vals:
                ro.absorb(AllocatedNum.alloc(cs, (lambda v=v: v)))
            ro.squeeze(cs, 128)
        return list(cs.aux_assignment)

    for mode in ("wide", "narrow"):
        for compact in (False, True):
            os.environ["NOVA_NO_POSEIDON_FAST"] = "1"
            try:
                slow = run(mode, compact)
            finally:
                del os.environ["NOVA_NO_POSEIDON_FAST"]
            fast = run(mode, compact)
            assert slow == fast, (mode, compact)
