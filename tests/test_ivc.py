"""End-to-end IVC tests (reference: src/nova/mod.rs:1142-1630 test matrix;
kept to the Pallas/Vesta cycle and few steps for runtime)."""

import pytest

from nova_tpu.errors import NovaError
from nova_tpu.frontend.constraint_system import LinearCombination, lc
from nova_tpu.frontend.num import AllocatedNum
from nova_tpu.nova.circuit import StepCircuit, TrivialCircuit
from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK
from nova_tpu.provider.engines import PallasEngine, VestaEngine


class CubicCircuit(StepCircuit):
    """y = x^3 + x + 5 per step (reference NonTrivialCircuit-style)."""

    def arity(self):
        return 1

    def synthesize(self, cs, z):
        x = z[0]
        x_sq = x.square(cs)
        x_cu = x_sq.mul(cs, x)
        f = cs.field

        def val():
            if x_cu.get_value() is None:
                return None
            return (x_cu.get_value() + x.get_value() + 5) % f.p

        y = AllocatedNum.alloc(cs, val)
        from nova_tpu.frontend.constraint_system import ONE

        cs.enforce(
            lc((1, x_cu.get_variable()), (1, x.get_variable()), (5, ONE)),
            lc((1, ONE)),
            lc((1, y.get_variable())),
        )
        return [y]


@pytest.fixture(scope="module")
def pp_trivial():
    return PublicParams.setup(PallasEngine, VestaEngine, TrivialCircuit())


def test_pp_shapes_match_reference_goldens(pp_trivial):
    # src/nova/circuit/mod.rs:454: 9818 primary / 10349 secondary
    assert pp_trivial.num_constraints() == (9818, 10349)


def test_ivc_base_case(pp_trivial):
    c = TrivialCircuit()
    rs = RecursiveSNARK.new(pp_trivial, c, [1])
    rs.prove_step(pp_trivial, c)
    assert rs.verify(pp_trivial, 1, [1]) == [1]


def test_ivc_nontrivial():
    c = CubicCircuit()
    pp = PublicParams.setup(PallasEngine, VestaEngine, c)
    f = PallasEngine.scalar
    rs = RecursiveSNARK.new(pp, c, [2])
    n_steps = 3
    for _ in range(n_steps):
        rs.prove_step(pp, c)
    zn = rs.verify(pp, n_steps, [2])
    # recompute expected
    z = 2
    for _ in range(n_steps):
        z = (z * z % f.p * z + z + 5) % f.p
    assert zn == [z]
    # wrong step count fails
    with pytest.raises(NovaError):
        rs.verify(pp, n_steps + 1, [2])
    # wrong z0 fails
    with pytest.raises(NovaError):
        rs.verify(pp, n_steps, [3])
