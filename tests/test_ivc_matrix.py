"""Cross-cycle IVC x compression matrix (reference: src/nova/mod.rs
test_ivc_nontrivial_with_some_compression / 1142-1630, which instantiates
every e2e test for PallasEngine, Bn256Engine, and Secp256k1Engine cycles).

Round 1 only exercised Pallas/Vesta end to end; this module runs the
nontrivial-circuit IVC and both compression flavours across all three
curve cycles, and pins the reference's augmented-circuit constraint-count
goldens per cycle (src/nova/circuit/mod.rs:453-457).
"""

import pytest

from nova_tpu.errors import NovaError
from nova_tpu.frontend.constraint_system import ONE, lc
from nova_tpu.frontend.num import AllocatedNum
from nova_tpu.nova.circuit import StepCircuit, TrivialCircuit
from nova_tpu.nova.compressed import CompressedSNARK
from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK
from nova_tpu.provider.engines import (
    Bn256EngineIPA,
    GrumpkinEngine,
    PallasEngine,
    Secp256k1Engine,
    Secq256k1Engine,
    VestaEngine,
)


class CubicCircuit(StepCircuit):
    """y = x^3 + x + 5 per step."""

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
        cs.enforce(
            lc((1, x_cu.get_variable()), (1, x.get_variable()), (5, ONE)),
            lc((1, ONE)),
            lc((1, y.get_variable())),
        )
        return [y]


CYCLES = [
    pytest.param(PallasEngine, VestaEngine, (9818, 10349), id="pallas-vesta"),
    pytest.param(Bn256EngineIPA, GrumpkinEngine, (9986, 10538), id="bn254-grumpkin"),
    pytest.param(Secp256k1Engine, Secq256k1Engine, (10265, 10961), id="secp-secq"),
]


@pytest.fixture(scope="module")
def pps():
    cache = {}

    def get(e1, e2):
        if e1.name not in cache:
            cache[e1.name] = PublicParams.setup(e1, e2, CubicCircuit())
        return cache[e1.name]

    return get


@pytest.mark.parametrize("e1,e2,goldens", CYCLES)
def test_constraint_goldens(pps, e1, e2, goldens):
    # reference goldens are for TrivialCircuit; CubicCircuit adds exactly
    # 3 constraints (square, mul, output enforce) to the primary side
    pp = pps(e1, e2)
    assert pp.num_constraints() == (goldens[0] + 3, goldens[1])


@pytest.mark.parametrize("e1,e2,goldens", CYCLES)
def test_ivc_nontrivial_cycle(pps, e1, e2, goldens):
    c = CubicCircuit()
    pp = pps(e1, e2)
    f = e1.scalar
    rs = RecursiveSNARK.new(pp, c, [2])
    n_steps = 2
    for _ in range(n_steps):
        rs.prove_step(pp, c)
    zn = rs.verify(pp, n_steps, [2])
    z = 2
    for _ in range(n_steps):
        z = (z * z % f.p * z + z + 5) % f.p
    assert zn == [z]
    with pytest.raises(NovaError):
        rs.verify(pp, n_steps, [3])


@pytest.mark.parametrize("e1,e2,goldens", CYCLES)
def test_ivc_with_snark_compression(pps, e1, e2, goldens):
    c = CubicCircuit()
    pp = pps(e1, e2)
    rs = RecursiveSNARK.new(pp, c, [2])
    for _ in range(2):
        rs.prove_step(pp, c)
    pk, vk = CompressedSNARK.setup(pp)
    proof = CompressedSNARK.prove(pp, pk, rs)
    zn = proof.verify(vk, 2, [2])
    assert zn == rs.zi


def test_ivc_with_ppsnark_compression(pps):
    # spark compression on the primary cycle only (slowest config; the
    # reference's test_ivc_nontrivial_with_spark_compression analog)
    from nova_tpu.spartan.ppsnark import RelaxedR1CSSNARK as PP

    c = CubicCircuit()
    pp = PublicParams.setup(
        PallasEngine, VestaEngine, c, ck_hint1=PP.ck_floor, ck_hint2=PP.ck_floor
    )
    rs = RecursiveSNARK.new(pp, c, [2])
    for _ in range(2):
        rs.prove_step(pp, c)
    pk, vk = CompressedSNARK.setup(pp, S1=PP, S2=PP)
    proof = CompressedSNARK.prove(pp, pk, rs)
    zn = proof.verify(vk, 2, [2])
    assert zn == rs.zi


def test_ivc_with_hyperkzg_compression(tmp_path):
    """BN254/Grumpkin IVC compressed with HyperKZG on the pairing-friendly
    primary (the reference's headline compressed-snark config,
    benches/compressed-snark.rs + src/nova/mod.rs setup_with_ptau_dir):
    test ptau file -> KZG commitment key -> snark(S1 with HyperKZG EE) +
    snark(S2 with IPA)."""
    import secrets

    from nova_tpu.curves.spec import bn254
    from nova_tpu.provider import ptau
    from nova_tpu.provider.hyperkzg import EvaluationEngine as KZG

    power = 15
    path = tmp_path / f"ppot_pruned_{power:02d}.ptau"
    tau = secrets.randbelow(bn254.scalar.p)
    ptau.write_test_ptau(str(path), tau, power)

    c = CubicCircuit()
    pp = PublicParams.setup_with_ptau_dir(
        Bn256EngineIPA, GrumpkinEngine, c, str(tmp_path)
    )
    rs = RecursiveSNARK.new(pp, c, [2])
    for _ in range(2):
        rs.prove_step(pp, c)
    assert rs.verify(pp, 2, [2]) == rs.zi
    pk, vk = CompressedSNARK.setup(pp, ee1=KZG)
    proof = CompressedSNARK.prove(pp, pk, rs)
    assert proof.verify(vk, 2, [2]) == rs.zi


def test_ivc_with_mercury_compression(tmp_path):
    """Same pipeline with the Mercury constant-size evaluation engine on
    the primary (eprint 2025/385; reference provider/mercury.rs)."""
    import secrets

    from nova_tpu.curves.spec import bn254
    from nova_tpu.provider import ptau
    from nova_tpu.provider.mercury import EvaluationEngine as Mercury

    power = 15
    path = tmp_path / f"ppot_pruned_{power:02d}.ptau"
    tau = secrets.randbelow(bn254.scalar.p)
    ptau.write_test_ptau(str(path), tau, power)

    c = CubicCircuit()
    pp = PublicParams.setup_with_ptau_dir(
        Bn256EngineIPA, GrumpkinEngine, c, str(tmp_path)
    )
    rs = RecursiveSNARK.new(pp, c, [2])
    for _ in range(2):
        rs.prove_step(pp, c)
    pk, vk = CompressedSNARK.setup(pp, ee1=Mercury)
    proof = CompressedSNARK.prove(pp, pk, rs)
    assert proof.verify(vk, 2, [2]) == rs.zi
