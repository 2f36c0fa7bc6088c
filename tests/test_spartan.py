"""Spartan layer tests: polys, sumcheck, IPA, snark on the tiny cubic R1CS
(reference test strategy: src/spartan/snark.rs tests, src/spartan/direct.rs:259+,
src/provider/ipa_pc.rs tests)."""

import random

import pytest

from nova_tpu.provider.engines import PallasEngine, Bn256EngineIPA, Secp256k1Engine
from nova_tpu.provider.ipa import EvaluationEngine as IPA
from nova_tpu.provider.pedersen import CommitmentEngine as CE
from nova_tpu.r1cs import RelaxedR1CSInstance, RelaxedR1CSWitness
from nova_tpu.spartan import (
    PolyEvalInstance,
    PolyEvalWitness,
    batch_eval_reduce,
    batch_eval_verify,
    batch_invert,
    powers,
)
from nova_tpu.spartan.polys import (
    EqPolynomial,
    MultilinearPolynomial,
    SparsePolynomial,
    UniPoly,
)
from nova_tpu.spartan.snark import RelaxedR1CSSNARK
from nova_tpu.spartan.sumcheck import SumcheckProof

from test_nifs import satisfying_pair, tiny_r1cs

ENGINES = [PallasEngine, Bn256EngineIPA, Secp256k1Engine]
rng = random.Random(0x5EED)


def rand(f):
    return rng.randrange(f.p)


@pytest.mark.parametrize("engine", ENGINES, ids=lambda e: e.name)
def test_eq_poly_table_matches_pointwise(engine):
    f = engine.scalar
    r = [rand(f) for _ in range(4)]
    tab = EqPolynomial.evals_from_points(f, r)
    for x in range(16):
        xv = [(x >> (3 - i)) & 1 for i in range(4)]
        assert tab[x] == EqPolynomial(f, r).evaluate(xv)


def test_multilinear_bind_evaluate_consistency():
    f = PallasEngine.scalar
    Z = [rand(f) for _ in range(16)]
    point = [rand(f) for _ in range(4)]
    direct = MultilinearPolynomial.evaluate_with(f, Z, point)
    poly = MultilinearPolynomial(f, Z)
    for r in point:
        poly.bind_poly_var_top(r)
    assert poly.Z[0] == direct


def test_sparse_polynomial_matches_dense():
    f = PallasEngine.scalar
    vals = [rand(f) for _ in range(3)]
    dense = vals + [0] * 13
    point = [rand(f) for _ in range(4)]
    assert SparsePolynomial(f, 4, vals).evaluate(point) == (
        MultilinearPolynomial.evaluate_with(f, dense, point)
    )


def test_unipoly_compress_roundtrip():
    f = PallasEngine.scalar
    poly = UniPoly(f, [rand(f) for _ in range(4)])
    hint = (poly.eval_at_zero() + poly.eval_at_one()) % f.p
    back = poly.compress().decompress(hint)
    assert back.coeffs == poly.coeffs


def test_batch_invert():
    f = PallasEngine.scalar
    v = [rand(f) for _ in range(33)]
    inv = batch_invert(f, v)
    for a, b in zip(v, inv):
        assert a * b % f.p == 1


def test_sumcheck_quad_prod():
    f = PallasEngine.scalar
    n = 3
    A = [rand(f) for _ in range(8)]
    B = [rand(f) for _ in range(8)]
    claim = sum(a * b for a, b in zip(A, B)) % f.p
    t = PallasEngine.new_transcript(b"t")
    proof, r, finals = SumcheckProof.prove_quad_prod(
        f, claim, n, MultilinearPolynomial(f, A), MultilinearPolynomial(f, B), t
    )
    t2 = PallasEngine.new_transcript(b"t")
    e, r2 = proof.verify(f, claim, n, 2, t2)
    assert r == r2
    assert e == finals[0] * finals[1] % f.p
    assert finals[0] == MultilinearPolynomial.evaluate_with(f, A, r)


def test_sumcheck_cubic_three_inputs():
    f = PallasEngine.scalar
    taus = [rand(f) for _ in range(3)]
    A = [rand(f) for _ in range(8)]
    B = [rand(f) for _ in range(8)]
    # choose C so that the claim is zero: C = A*B pointwise
    C = [a * b % f.p for a, b in zip(A, B)]
    t = PallasEngine.new_transcript(b"t")
    proof, r, finals = SumcheckProof.prove_cubic_with_three_inputs(
        f, 0, taus,
        MultilinearPolynomial(f, A),
        MultilinearPolynomial(f, B),
        MultilinearPolynomial(f, C),
        t,
    )
    t2 = PallasEngine.new_transcript(b"t")
    e, r2 = proof.verify(f, 0, 3, 3, t2)
    assert r == r2
    eq_r = EqPolynomial(f, taus).evaluate(r)
    assert e == eq_r * ((finals[0] * finals[1] - finals[2]) % f.p) % f.p


def test_batch_eval_reduce_and_verify():
    engine = PallasEngine
    f = engine.scalar
    ck = CE.setup(engine.curve, b"batch", 16)
    P1 = [rand(f) for _ in range(16)]
    P2 = [rand(f) for _ in range(4)]
    x1 = [rand(f) for _ in range(4)]
    x2 = [rand(f) for _ in range(2)]
    e1 = MultilinearPolynomial.evaluate_with(f, P1, x1)
    e2 = MultilinearPolynomial.evaluate_with(f, P2, x2)
    c1 = CE.commit(ck, P1, 0)
    c2 = CE.commit(ck, P2, 0)
    u_vec = [PolyEvalInstance(c1, x1, e1), PolyEvalInstance(c2, x2, e2)]
    w_vec = [PolyEvalWitness(P1), PolyEvalWitness(P2)]
    t = engine.new_transcript(b"b")
    bu, bw, _c, scp, evals = batch_eval_reduce(f, u_vec, w_vec, t)
    # prover-side consistency
    assert MultilinearPolynomial.evaluate_with(f, bw.p, bu.x) == bu.e
    assert CE.commit(ck, bw.p, 0).point == bu.c.point
    # verifier side replays to the same joint instance
    t2 = engine.new_transcript(b"b")
    u_vec2 = [PolyEvalInstance(c1, x1, e1), PolyEvalInstance(c2, x2, e2)]
    bu2, _ = batch_eval_verify(f, u_vec2, t2, scp, evals)
    assert bu2.e == bu.e and bu2.x == bu.x and bu2.c.point == bu.c.point


@pytest.mark.parametrize("engine", ENGINES, ids=lambda e: e.name)
def test_ipa_prove_verify(engine):
    f = engine.scalar
    ck = CE.setup(engine.curve, b"ipa-test", 16)
    poly = [rand(f) for _ in range(16)]
    point = [rand(f) for _ in range(4)]
    ev = MultilinearPolynomial.evaluate_with(f, poly, point)
    comm = CE.commit(ck, poly, 0)
    pk, vk = IPA.setup(engine, ck)
    t1 = engine.new_transcript(b"ipa")
    arg = IPA.prove(engine, ck, pk, t1, comm, poly, point, ev)
    t2 = engine.new_transcript(b"ipa")
    IPA.verify(engine, vk, t2, comm, point, ev, arg)
    # wrong eval must fail
    t3 = engine.new_transcript(b"ipa")
    with pytest.raises(Exception):
        IPA.verify(engine, vk, t3, comm, point, (ev + 1) % f.p, arg)


@pytest.mark.parametrize("engine", ENGINES, ids=lambda e: e.name)
def test_spartan_snark_tiny(engine):
    S = tiny_r1cs(engine)
    ck = S.commitment_key(b"ck", 0)
    U, W = satisfying_pair(engine, S, ck, 3)
    rU = RelaxedR1CSInstance.from_r1cs_instance(engine.curve, S, U)
    rW = RelaxedR1CSWitness.from_r1cs_witness(S, W)
    drW, bW, bE = rW.derandomize()
    drU = rU.derandomize(CE.derand_key(ck), bW, bE)
    pk, vk = RelaxedR1CSSNARK.setup(engine, ck, S)
    proof = RelaxedR1CSSNARK.prove(engine, ck, pk, S, drU, drW)
    proof.verify(vk, drU)
    # tampered instance must fail
    bad = RelaxedR1CSInstance(drU.comm_W, drU.comm_E, list(drU.X), (drU.u + 1) % engine.scalar.p)
    with pytest.raises(Exception):
        proof.verify(vk, bad)


@pytest.mark.parametrize("engine", ENGINES, ids=lambda e: e.name)
def test_ppsnark_tiny(engine):
    from nova_tpu.spartan.ppsnark import RelaxedR1CSSNARK as PP

    S = tiny_r1cs(engine)
    ck = S.commitment_key(b"ck", PP.ck_floor(S))
    U, W = satisfying_pair(engine, S, ck, 3)
    rU = RelaxedR1CSInstance.from_r1cs_instance(engine.curve, S, U)
    rW = RelaxedR1CSWitness.from_r1cs_witness(S, W)
    drW, bW, bE = rW.derandomize()
    drU = rU.derandomize(CE.derand_key(ck), bW, bE)
    pk, vk = PP.setup(engine, ck, S)
    proof = PP.prove(engine, ck, pk, S, drU, drW)
    proof.verify(vk, drU)
    # tampering any published eval must fail
    proof.eval_L_row = (proof.eval_L_row + 1) % engine.scalar.p
    with pytest.raises(Exception):
        proof.verify(vk, drU)


def test_direct_snark_cubic():
    from nova_tpu.spartan.direct import DirectSNARK

    class Cubic:
        def arity(self):
            return 1

        def synthesize(self, cs, z):
            from nova_tpu.frontend.constraint_system import ONE, lc
            from nova_tpu.frontend.num import AllocatedNum

            x = z[0]
            x_sq = x.square(cs)
            x_cu = x_sq.mul(cs, x)
            f = cs.field
            val = None
            if x_cu.get_value() is not None:
                val = (x_cu.get_value() + x.get_value() + 5) % f.p
            y = AllocatedNum.alloc(cs, val)
            cs.enforce(
                lc((1, x_cu.get_variable()), (1, x.get_variable()), (5, ONE)),
                lc((1, ONE)),
                lc((1, y.get_variable())),
            )
            return [y]

    engine = PallasEngine
    pk, vk = DirectSNARK.setup(engine, Cubic())
    snark = DirectSNARK.prove(engine, pk, Cubic(), [2])
    f = engine.scalar
    y = (2 ** 3 + 2 + 5) % f.p
    snark.verify(engine, vk, [2, y])
    with pytest.raises(Exception):
        snark.verify(engine, vk, [2, (y + 1) % f.p])


def test_device_sumcheck_matches_host():
    """The device-resident sumcheck must produce an identical transcript
    (same round polynomials, challenges, final claims) as the host path.
    Runs in a subprocess: fresh XLA:CPU compiles segfault in large host
    processes (same pathology as the shard_map tests)."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import os; os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import random\n"
        "from nova_tpu.provider.engines import PallasEngine\n"
        "from nova_tpu.spartan.polys import MultilinearPolynomial\n"
        "from nova_tpu.spartan.sumcheck import SumcheckProof\n"
        "from nova_tpu.ops.sumcheck import prove_cubic_with_three_inputs_device\n"
        "rng = random.Random(0x5EED)\n"
        "f = PallasEngine.scalar\n"
        "n = 16\n"
        "taus = [rng.randrange(f.p) for _ in range(4)]\n"
        "A = [rng.randrange(f.p) for _ in range(n)]\n"
        "B = [rng.randrange(f.p) for _ in range(n)]\n"
        "C = [a * b %% f.p for a, b in zip(A, B)]\n"
        "t1 = PallasEngine.new_transcript(b'x')\n"
        "p1, r1, c1 = SumcheckProof.prove_cubic_with_three_inputs(f, 0, taus, MultilinearPolynomial(f, A), MultilinearPolynomial(f, B), MultilinearPolynomial(f, C), t1)\n"
        "t2 = PallasEngine.new_transcript(b'x')\n"
        "p2, r2, c2 = prove_cubic_with_three_inputs_device(f, 0, taus, A, B, C, t2)\n"
        "assert r1 == r2 and c1 == c2\n"
        "for x, y in zip(p1.compressed_polys, p2.compressed_polys):\n"
        "    assert x.coeffs_except_linear_term == y.coeffs_except_linear_term\n"
        "print('DEVICE_SUMCHECK_OK')\n"
    ) % (root,)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "DEVICE_SUMCHECK_OK" in res.stdout


def test_masked_eq_table_matches_pointwise():
    """Regression: the mask must zero the first 2^m entries (split at
    n - m), not 2^(n-m) (src/spartan/polys/masked_eq.rs)."""
    from nova_tpu.spartan.polys import MaskedEqPolynomial

    f = PallasEngine.scalar
    r = [rand(f) for _ in range(5)]
    me = MaskedEqPolynomial(EqPolynomial(f, r), 3)
    tab = me.evals()
    assert all(v == 0 for v in tab[:8]) and any(v != 0 for v in tab[8:])
    for x in range(32):
        xv = [(x >> (4 - i)) & 1 for i in range(5)]
        assert tab[x] == me.evaluate(xv)


@pytest.mark.parametrize("num_vars", [16, 32])
def test_ppsnark_relaxed_wide_shapes(num_vars):
    """ppsnark on genuinely relaxed instances (nonzero E, u != 1) in the
    N = 2*num_vars regime — the augmented-circuit configuration."""
    from nova_tpu.nova.nifs import NIFS
    from nova_tpu.spartan.ppsnark import RelaxedR1CSSNARK as PP

    engine = PallasEngine
    S = tiny_r1cs(engine, num_vars=num_vars)
    ck = S.commitment_key(b"ck", max(PP.ck_floor(S), 4 * num_vars))
    U1, W1 = satisfying_pair(engine, S, ck, 3)
    U2, W2 = satisfying_pair(engine, S, ck, 5)
    rU = RelaxedR1CSInstance.from_r1cs_instance(engine.curve, S, U1)
    rW = RelaxedR1CSWitness.from_r1cs_witness(S, W1)
    _, (rU, rW) = NIFS.prove(ck, engine, 99, S, rU, rW, U2, W2)
    drW, bW, bE = rW.derandomize()
    drU = rU.derandomize(CE.derand_key(ck), bW, bE)
    pk, vk = PP.setup(engine, ck, S)
    proof = PP.prove(engine, ck, pk, S, drU, drW)
    proof.verify(vk, drU)


def test_gruen_eq_factored_sumcheck_matches_materialized():
    """The Gruen/BDDT eq-factored prover (sumcheck.rs:580-760 analog) must
    produce bit-identical round polynomials, challenges, and final claims
    to the materialized-eq prover."""
    import copy
    import os
    import random

    from nova_tpu.provider.engines import PallasEngine
    from nova_tpu.provider.keccak import Keccak256Transcript
    from nova_tpu.spartan.polys import EqPolynomial, MultilinearPolynomial
    from nova_tpu.spartan.sumcheck import SumcheckProof

    f = PallasEngine.scalar
    rng = random.Random(0x5EED)
    n = 1 << 7
    A = MultilinearPolynomial(f, [rng.randrange(f.p) for _ in range(n)])
    B = MultilinearPolynomial(f, [rng.randrange(f.p) for _ in range(n)])
    C = MultilinearPolynomial(f, [rng.randrange(f.p) for _ in range(n)])
    taus = [rng.randrange(1, f.p) for _ in range(7)]
    eq = EqPolynomial.evals_from_points(f, taus)
    claim = sum(e * (a * b - c) for e, a, b, c in zip(eq, A.Z, B.Z, C.Z)) % f.p

    tr1 = Keccak256Transcript(b"t", f)
    A1, B1, C1 = copy.deepcopy((A, B, C))
    pf1, r1, cl1 = SumcheckProof.prove_cubic_with_three_inputs(
        f, claim, taus, A1, B1, C1, tr1
    )

    os.environ["NOVA_NO_GRUEN"] = "1"
    try:
        tr2 = Keccak256Transcript(b"t", f)
        A2, B2, C2 = copy.deepcopy((A, B, C))
        pf2, r2, cl2 = SumcheckProof.prove_cubic_with_three_inputs(
            f, claim, taus, A2, B2, C2, tr2
        )
    finally:
        del os.environ["NOVA_NO_GRUEN"]

    assert r1 == r2 and cl1 == cl2
    assert all(
        p1.coeffs_except_linear_term == p2.coeffs_except_linear_term
        for p1, p2 in zip(pf1.compressed_polys, pf2.compressed_polys)
    )
    tr3 = Keccak256Transcript(b"t", f)
    _, rv = pf1.verify(f, claim, 7, 3, tr3)
    assert rv == r1
