"""NIFS folding end-to-end on the canonical tiny R1CS (x^3 + x + 5 = y),
mirroring the reference's execute_sequence tests (src/nova/nifs.rs:299-455)."""

import pytest

from nova_tpu.errors import UnSatError
from nova_tpu.nova.nifs import NIFS, NIFSRelaxed
from nova_tpu.provider.engines import (
    Bn256EngineIPA,
    PallasEngine,
    Secp256k1Engine,
)
from nova_tpu.provider.pedersen import CommitmentEngine
from nova_tpu.r1cs import (
    R1CSInstance,
    R1CSShape,
    R1CSWitness,
    RelaxedR1CSInstance,
    RelaxedR1CSWitness,
    SparseMatrix,
)

ENGINES = [PallasEngine, Bn256EngineIPA, Secp256k1Engine]


def tiny_r1cs(engine, num_vars=4):
    """The cubic fixture (src/r1cs/mod.rs:1294-1358): x^3 + x + 5 = y with
    z = (vars, u, IO=[x, y])."""
    f = engine.scalar
    one = 1
    num_cons, num_io = 4, 2
    A, B, C = [], [], []
    A.append((0, num_vars + 1, one))
    B.append((0, num_vars + 1, one))
    C.append((0, 0, one))
    A.append((1, 0, one))
    B.append((1, num_vars + 1, one))
    C.append((1, 1, one))
    A.append((2, 1, one))
    A.append((2, num_vars + 1, one))
    B.append((2, num_vars, one))
    C.append((2, 2, one))
    A.append((3, 2, one))
    A.append((3, num_vars, 5))
    B.append((3, num_vars, one))
    C.append((3, num_vars + 2, one))
    rows, cols = num_cons, num_vars + num_io + 1
    return R1CSShape.new(
        f,
        num_cons,
        num_vars,
        num_io,
        SparseMatrix.new(f, A, rows, cols),
        SparseMatrix.new(f, B, rows, cols),
        SparseMatrix.new(f, C, rows, cols),
    )


def satisfying_pair(engine, shape, ck, x):
    """witness (Z0,Z1,Z2) = (x^2, x^3, x^3+x), IO = (x, y)."""
    f = engine.scalar
    z0 = f.mul(x, x)
    z1 = f.mul(z0, x)
    z2 = f.add(z1, x)
    y = f.add(z2, 5)
    W = R1CSWitness.new(shape, [z0, z1, z2, 0])
    U = R1CSInstance.new(shape, W.commit(ck), [x, y])
    return U, W


@pytest.mark.parametrize("engine", ENGINES, ids=lambda e: e.name)
def test_tiny_r1cs_sat(engine):
    S = tiny_r1cs(engine)
    ck = S.commitment_key()
    U1, W1 = satisfying_pair(engine, S, ck, 5)
    S.is_sat(ck, U1, W1)
    # perturbed witness fails
    W_bad = R1CSWitness(list(W1.W), W1.r_W)
    W_bad.W[0] = (W_bad.W[0] + 1) % engine.scalar.p
    with pytest.raises(UnSatError):
        S.is_sat(ck, U1, W_bad)


@pytest.mark.parametrize("engine", ENGINES, ids=lambda e: e.name)
def test_execute_sequence(engine):
    """Fold two satisfying instances into a running relaxed instance;
    prover/verifier agree; the final pair is relaxed-satisfiable."""
    S = tiny_r1cs(engine)
    ck = S.commitment_key()
    pp_digest = 0

    U1, W1 = satisfying_pair(engine, S, ck, 5)
    U2, W2 = satisfying_pair(engine, S, ck, 135)
    S.is_sat(ck, U1, W1)
    S.is_sat(ck, U2, W2)

    running_W = RelaxedR1CSWitness.default(S)
    running_U = RelaxedR1CSInstance.default(engine.curve, S)

    for (Ui, Wi) in [(U1, W1), (U2, W2)]:
        nifs, (U, W) = NIFS.prove(ck, engine, pp_digest, S, running_U, running_W, Ui, Wi)
        U_v = nifs.verify(engine, pp_digest, running_U, Ui)
        assert U_v == U
        running_U, running_W = U, W

    S.is_sat_relaxed(ck, running_U, running_W)


@pytest.mark.parametrize("engine", [PallasEngine], ids=lambda e: e.name)
def test_execute_sequence_relaxed_and_derandomize(engine):
    S = tiny_r1cs(engine)
    ck = S.commitment_key()
    pp_digest = 0

    U1, W1r = satisfying_pair(engine, S, ck, 5)
    U2, W2r = satisfying_pair(engine, S, ck, 135)
    R1 = RelaxedR1CSInstance.from_r1cs_instance(engine.curve, S, U1)
    RW1 = RelaxedR1CSWitness.from_r1cs_witness(S, W1r)
    R2 = RelaxedR1CSInstance.from_r1cs_instance(engine.curve, S, U2)
    RW2 = RelaxedR1CSWitness.from_r1cs_witness(S, W2r)

    running_W = RelaxedR1CSWitness.default(S)
    running_U = RelaxedR1CSInstance.default(engine.curve, S)
    for (Ui, Wi) in [(R1, RW1), (R2, RW2)]:
        nifs, (U, W) = NIFSRelaxed.prove(
            ck, engine, pp_digest, S, running_U, running_W, Ui, Wi
        )
        U_v = nifs.verify(engine, pp_digest, running_U, Ui)
        assert U_v == U
        running_U, running_W = U, W
    S.is_sat_relaxed(ck, running_U, running_W)

    # derandomize (src/nova/nifs.rs:409-427)
    dk = CommitmentEngine.derand_key(ck)
    dW, bW, bE = running_W.derandomize()
    dU = running_U.derandomize(dk, bW, bE)
    S.is_sat_relaxed(ck, dU, dW)


@pytest.mark.parametrize("engine", [PallasEngine], ids=lambda e: e.name)
def test_sample_random_instance(engine):
    S = tiny_r1cs(engine)
    ck = S.commitment_key()
    inst, wit = S.sample_random_instance_witness(ck)
    S.is_sat_relaxed(ck, inst, wit)


@pytest.mark.parametrize("engine", [PallasEngine], ids=lambda e: e.name)
def test_pad(engine):
    S = tiny_r1cs(engine, num_vars=3)
    padded = S.pad()
    assert padded.is_regular_shape()
    expected = tiny_r1cs(engine, num_vars=4)
    assert padded.num_cons == expected.num_cons
    assert padded.num_vars == expected.num_vars
    assert padded.A == expected.A
    assert padded.B == expected.B
    assert padded.C == expected.C

    S2 = tiny_r1cs(engine, num_vars=8)
    p2 = S2.pad_nonsquare()
    assert p2.is_regular_shape()
    assert p2.num_cons == 4 and p2.num_vars == 8
