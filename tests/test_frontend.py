"""Frontend DSL: the bellpepper-style tiny circuit builds a shape/witness
that folds correctly (mirrors test_tiny_r1cs_bellpepper,
src/nova/nifs.rs:222-297)."""

import pytest

from nova_tpu.frontend import (
    AllocatedNum,
    SatisfyingAssignment,
    ShapeCS,
    TestConstraintSystem,
)
from nova_tpu.frontend.constraint_system import LinearCombination, ONE
from nova_tpu.nova.nifs import NIFS
from nova_tpu.provider.engines import Bn256EngineIPA, PallasEngine
from nova_tpu.r1cs import RelaxedR1CSInstance, RelaxedR1CSWitness

ENGINES = [PallasEngine, Bn256EngineIPA]


def synthesize_tiny(cs, x_val):
    """x^3 + x + 5 = y (src/nova/nifs.rs:222-253)."""
    f = cs.field
    x = AllocatedNum.alloc(cs, x_val)
    x.inputize(cs)
    x_sq = x.square(cs)
    x_cu = x_sq.mul(cs, x)
    y_val = None if x_val is None else f.add(f.add(x_cu.value, x.value), 5)
    y = AllocatedNum.alloc(cs, y_val)
    y.inputize(cs)
    cs.enforce(
        LinearCombination.from_variable(x_cu.get_variable())
        + x.get_variable()
        + ONE + ONE + ONE + ONE + ONE,
        LinearCombination.from_variable(ONE),
        LinearCombination.from_variable(y.get_variable()),
    )


@pytest.mark.parametrize("engine", ENGINES, ids=lambda e: e.name)
def test_tiny_bellpepper_fold(engine):
    shape_cs = ShapeCS(engine.scalar)
    synthesize_tiny(shape_cs, None)
    shape = shape_cs.r1cs_shape()
    ck = shape.commitment_key()

    cs1 = SatisfyingAssignment(engine.scalar)
    synthesize_tiny(cs1, 5)
    U1, W1 = cs1.r1cs_instance_and_witness(shape, ck)
    shape.is_sat(ck, U1, W1)

    cs2 = SatisfyingAssignment(engine.scalar)
    synthesize_tiny(cs2, 135)
    U2, W2 = cs2.r1cs_instance_and_witness(shape, ck)
    shape.is_sat(ck, U2, W2)

    running_W = RelaxedR1CSWitness.default(shape)
    running_U = RelaxedR1CSInstance.default(engine.curve, shape)
    for (Ui, Wi) in [(U1, W1), (U2, W2)]:
        nifs, (U, W) = NIFS.prove(ck, engine, 0, shape, running_U, running_W, Ui, Wi)
        assert nifs.verify(engine, 0, running_U, Ui) == U
        running_U, running_W = U, W
    shape.is_sat_relaxed(ck, running_U, running_W)


def test_testcs_satisfied():
    cs = TestConstraintSystem(PallasEngine.scalar)
    synthesize_tiny(cs, 5)
    assert cs.is_satisfied()


def test_bits_roundtrip():
    f = PallasEngine.scalar
    cs = TestConstraintSystem(f)
    v = f.p - 2  # near the modulus: exercises strict decomposition
    num = AllocatedNum.alloc(cs, v)
    bits = num.to_bits_le_strict(cs)
    assert cs.is_satisfied()
    got = sum((1 << i) for i, b in enumerate(bits) if b.get_value())
    assert got == v

    cs2 = TestConstraintSystem(f)
    num2 = AllocatedNum.alloc(cs2, 12345)
    bits2 = num2.to_bits_le(cs2)
    assert cs2.is_satisfied()
    got2 = sum((1 << i) for i, b in enumerate(bits2) if b.get_value())
    assert got2 == 12345
