"""NeutronNova tests (reference: src/neutron/ tests; experimental
feature)."""

import pytest

from nova_tpu.errors import NovaError
from nova_tpu.neutron import FoldedInstance, FoldedWitness, NIFS, Structure
from nova_tpu.nova.circuit import TrivialCircuit
from nova_tpu.provider.engines import (
    Bn256EngineKZG,
    PallasEngine,
    Secp256k1Engine,
    VestaEngine,
)

from test_nifs import satisfying_pair, tiny_r1cs


def test_neutron_circuit_constraint_goldens():
    """src/neutron/circuit/mod.rs:436-440."""
    from nova_tpu.frontend.constraint_system import ShapeCS
    from nova_tpu.neutron.circuit import NeutronAugmentedCircuit
    from nova_tpu.provider.poseidon import PoseidonROConstants

    for E, want in ((PallasEngine, 7047), (Bn256EngineKZG, 7327), (Secp256k1Engine, 7792)):
        cs = ShapeCS(E.scalar)
        NeutronAugmentedCircuit(
            None, TrivialCircuit(), PoseidonROConstants(E.scalar)
        ).synthesize(cs)
        assert cs.num_constraints() == want, E.name


@pytest.mark.parametrize("engine", [PallasEngine, Bn256EngineKZG], ids=lambda e: e.name)
def test_neutron_fold_sequence(engine):
    S0 = tiny_r1cs(engine)
    struct = Structure(S0)
    ck = struct.S.commitment_key(b"ck", 0)
    U = FoldedInstance.default(engine.curve, struct)
    W = FoldedWitness.default(struct)
    struct.is_sat(ck, U, W)
    digest = 0xD16E57
    for x in (3, 5, 7):
        u2, w2 = satisfying_pair(engine, struct.S, ck, x)
        nifs, (U_p, W_p) = NIFS.prove(ck, engine, digest, struct, U, W, u2, w2)
        U_v = nifs.verify(engine, digest, U, u2)
        assert U_v.T == U_p.T and U_v.u == U_p.u and U_v.X == U_p.X
        assert U_v.comm_W == U_p.comm_W and U_v.comm_E == U_p.comm_E
        U, W = U_p, W_p
        struct.is_sat(ck, U, W)
    # tampered instance fails is_sat
    bad = FoldedInstance(U.comm_W, U.comm_E, (U.T + 1) % engine.scalar.p, U.u, U.X)
    with pytest.raises(NovaError):
        struct.is_sat(ck, bad, W)


def test_neutron_ivc_e2e():
    from nova_tpu.neutron.ivc import PublicParams, RecursiveSNARK

    pp = PublicParams.setup(PallasEngine, VestaEngine, TrivialCircuit())
    rs = RecursiveSNARK.new(pp, TrivialCircuit(), [1])
    for _ in range(3):
        rs.prove_step(pp, TrivialCircuit())
    assert rs.verify(pp, 3, [1]) == [1]
    with pytest.raises(NovaError):
        rs.verify(pp, 4, [1])


def test_neutron_round_kernel_matches_python():
    """The native 5-point round kernel must match the pure-Python helper."""
    import random

    from nova_tpu import native
    from nova_tpu.neutron import NIFS
    from nova_tpu.provider.engines import PallasEngine

    import pytest

    if not native.available():
        pytest.skip("native library unavailable; both paths identical")
    f = PallasEngine.scalar
    p = f.p
    rng = random.Random(7)
    left, right = 16, 8
    n = left * right
    mk = lambda m: [rng.randrange(p) for _ in range(m)]
    e1, e2 = mk(left + right), mk(left + right)
    Az1, Bz1, Cz1 = mk(n), mk(n), mk(n)
    Az2, Bz2, Cz2 = mk(n), mk(n), mk(n)
    rho = rng.randrange(p)
    got = NIFS._prove_helper(f, rho, left, right, e1, Az1, Bz1, Cz1,
                             e2, Az2, Bz2, Cz2)
    orig = native.available
    native.available = lambda: False
    try:
        ref = NIFS._prove_helper(f, rho, left, right, e1, Az1, Bz1, Cz1,
                                 e2, Az2, Bz2, Cz2)
    finally:
        native.available = orig
    assert got == ref
