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


def test_tape_ivc_verifies_multiple_steps():
    c = TrivialCircuit()
    pp = PublicParams.setup(PallasEngine, VestaEngine, c)
    rs = RecursiveSNARK.new(pp, c, [7])
    for _ in range(5):
        rs.prove_step(pp, c)
    assert rs.verify(pp, 5, [7]) == [7]
