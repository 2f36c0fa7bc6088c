"""Compiled witness-tape tests (frontend/tape.py): replayed assignments
must equal interpreted synthesis bit-for-bit, across multiple steps and
with per-step nondeterministic advice (SURVEY.md §7 hard-part 5)."""

from nova_tpu.frontend.constraint_system import SatisfyingAssignment
from nova_tpu.frontend.num import AllocatedNum
from nova_tpu.nova.circuit import (
    NovaAugmentedCircuit,
    StepCircuit,
    TrivialCircuit,
)
from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK, _CompiledAugmented
from nova_tpu.provider.engines import PallasEngine, VestaEngine


class AdviceCircuit(StepCircuit):
    """y such that y^2 = x, with y supplied as per-step nondeterministic
    advice (tape-disciplined: advice read through `self` in a closure,
    constraint structure independent of it — minroot-style)."""

    def __init__(self, advice):
        self.advice = advice  # the claimed square root of z[0]

    def arity(self):
        return 1

    def synthesize(self, cs, z):
        from nova_tpu.frontend.constraint_system import lc

        y = AllocatedNum.alloc(cs, lambda: self.advice)
        cs.enforce(
            lc((1, y.get_variable())),
            lc((1, y.get_variable())),
            lc((1, z[0].get_variable())),
        )
        return [y]


def test_tape_matches_interpreted_synthesis():
    """Replay both augmented circuits for several steps and compare every
    input/aux slot against a fresh interpreted synthesis."""
    c = TrivialCircuit()
    pp = PublicParams.setup(PallasEngine, VestaEngine, c)
    rs = RecursiveSNARK.new(pp, c, [3])
    rs.prove_step(pp, c)

    orig_run = _CompiledAugmented.run
    mismatches = []
    checked = {"n": 0}

    def checked_run(self, inputs, step_circuit=None):
        cs, z = orig_run(self, inputs, step_circuit)
        slow = SatisfyingAssignment(cs.field)
        circ = NovaAugmentedCircuit(
            self.circuit.engine,
            self.circuit.is_primary_circuit,
            inputs,
            self.circuit.step_circuit,
            self.circuit.ro_consts,
        )
        circ.synthesize(slow)
        if slow.aux_assignment != cs.aux_assignment:
            mismatches.append("aux")
        if slow.input_assignment != cs.input_assignment:
            mismatches.append("input")
        checked["n"] += 1
        return cs, z

    _CompiledAugmented.run = checked_run
    try:
        rs.prove_step(pp, c)  # traces
        rs.prove_step(pp, c)  # replays + checks
        rs.prove_step(pp, c)
    finally:
        _CompiledAugmented.run = orig_run
    assert checked["n"] >= 4
    assert not mismatches
    assert rs.verify(pp, rs.i, [3]) == [3]


def test_tape_per_step_advice_rebinds():
    """Each step passes a circuit object with fresh advice; replays must
    observe it (square-root chain: z_{i+1}^2 = z_i)."""
    f = PallasEngine.scalar
    # build a chain x0 -> x1 -> ... with x_{k+1}^2 = x_k (pick x_k squares)
    r = 5
    chain = [r]
    for _ in range(6):
        chain.append(chain[-1] * chain[-1] % f.p)
    chain.reverse()  # chain[k+1] = sqrt(chain[k])
    pp = PublicParams.setup(PallasEngine, VestaEngine, AdviceCircuit(0))
    rs = RecursiveSNARK.new(pp, AdviceCircuit(chain[1]), [chain[0]])
    for k in range(1, 5):
        rs.prove_step(pp, AdviceCircuit(chain[k]))
    assert rs.verify(pp, 4, [chain[0]]) == [chain[4]]


class EagerSquareCircuit(StepCircuit):
    """Deliberately tape-UNSAFE: the witness for y = z^2 is computed
    eagerly in the synthesize body, so replays bake in the tracing
    step's value while the in-circuit z moves on."""

    def __init__(self, x=0):
        self.x = x

    def arity(self):
        return 1

    def synthesize(self, cs, z):
        from nova_tpu.frontend.constraint_system import lc

        sq = self.x * self.x  # EAGER: breaks the closure discipline
        y = AllocatedNum.alloc(cs, lambda: sq % cs.field.p)
        cs.enforce(
            lc((1, z[0].get_variable())),
            lc((1, z[0].get_variable())),
            lc((1, y.get_variable())),
        )
        return [y]


def test_tape_unsafe_circuit_diagnosed_at_prove_step():
    """A tape-discipline violation must raise TapeReplayError at the
    first replayed prove_step (post-replay SpMV validation) instead of a
    late, uninformative verify failure."""
    import pytest

    from nova_tpu.errors import TapeReplayError

    pp = PublicParams.setup(PallasEngine, VestaEngine, EagerSquareCircuit(0))
    rs = RecursiveSNARK.new(pp, EagerSquareCircuit(3), [3])
    rs.prove_step(pp, EagerSquareCircuit(int(rs.zi[0])))  # base bump
    rs.prove_step(pp, EagerSquareCircuit(int(rs.zi[0])))  # traces the tape
    with pytest.raises(TapeReplayError):
        # first replay: the stale eager value no longer satisfies z*z=y
        rs.prove_step(pp, EagerSquareCircuit(int(rs.zi[0])))

    # the documented opt-out takes the interpreted path and stays sound
    rs2 = RecursiveSNARK.new(pp, EagerSquareCircuit(3), [3])
    for _ in range(3):
        c = EagerSquareCircuit(int(rs2.zi[0]))
        c.tape_safe = False
        rs2.prove_step(pp, c)
    assert rs2.verify(pp, 3, [3])


def test_tape_ivc_verifies_multiple_steps():
    c = TrivialCircuit()
    pp = PublicParams.setup(PallasEngine, VestaEngine, c)
    rs = RecursiveSNARK.new(pp, c, [7])
    for _ in range(5):
        rs.prove_step(pp, c)
    assert rs.verify(pp, 5, [7]) == [7]
