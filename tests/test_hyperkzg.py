"""HyperKZG + pairing + ptau tests (reference: src/provider/hyperkzg.rs
tests, src/provider/ptau.rs tests, curve property tests for pairings)."""

import os
import random
import tempfile

import pytest

from nova_tpu.curves.pairing import (
    F12_ONE,
    G2Point,
    f12_pow,
    multi_pairing_is_one,
    pairing,
)
from nova_tpu.curves.spec import AffinePoint, bn254
from nova_tpu.provider import ptau
from nova_tpu.provider.engines import Bn256EngineKZG
from nova_tpu.provider.hyperkzg import EvaluationEngine as KZG, setup_insecure
from nova_tpu.provider.pedersen import CommitmentEngine as CE
from nova_tpu.spartan.polys import MultilinearPolynomial

rng = random.Random(0x5EED_C0DE)
E = Bn256EngineKZG


def test_pairing_bilinearity():
    g1 = AffinePoint.generator(bn254)
    g2 = G2Point.generator()
    e = pairing(g1, g2)
    assert e != F12_ONE
    assert pairing(g1.double(), g2) == f12_pow(e, 2)
    assert pairing(g1, g2.double()) == f12_pow(e, 2)
    a, b = 1234, 5678
    assert pairing(g1.mul(a), g2.mul(b)) == f12_pow(e, a * b)
    assert f12_pow(e, bn254.scalar.p) == F12_ONE
    assert multi_pairing_is_one([(g1, g2), (g1.neg(), g2)])


def test_hyperkzg_prove_verify():
    f = E.scalar
    ck, tau_H = setup_insecure(32)
    poly = [rng.randrange(f.p) for _ in range(32)]
    point = [rng.randrange(f.p) for _ in range(5)]
    ev = MultilinearPolynomial.evaluate_with(f, poly, point)
    comm = CE.commit(ck, poly, 0)
    pk, vk = KZG.setup(E, ck)
    t1 = E.new_transcript(b"hkzg")
    arg = KZG.prove(E, ck, pk, t1, comm, poly, point, ev)
    t2 = E.new_transcript(b"hkzg")
    KZG.verify(E, vk, t2, comm, point, ev, arg)
    t3 = E.new_transcript(b"hkzg")
    with pytest.raises(Exception):
        KZG.verify(E, vk, t3, comm, point, (ev + 1) % f.p, arg)


def test_ptau_roundtrip_and_load():
    d = tempfile.mkdtemp()
    path = os.path.join(d, "ppot_pruned_04.ptau")
    ptau.write_test_ptau(path, rng.randrange(E.scalar.p), 4)
    ptau.check_sanity_of_ptau_file(path, 16, 2)
    with pytest.raises(Exception):
        ptau.check_sanity_of_ptau_file(path, 1 << 10, 2)  # too many G1
    ck = ptau.load_ck_from_ptau(path, 16)
    assert len(ck.ck) == 16
    # key is usable end-to-end
    f = E.scalar
    poly = [rng.randrange(f.p) for _ in range(16)]
    point = [rng.randrange(f.p) for _ in range(4)]
    ev = MultilinearPolynomial.evaluate_with(f, poly, point)
    comm = CE.commit(ck, poly, 0)
    pk, vk = KZG.setup(E, ck)
    t1 = E.new_transcript(b"x")
    arg = KZG.prove(E, ck, pk, t1, comm, poly, point, ev)
    t2 = E.new_transcript(b"x")
    KZG.verify(E, vk, t2, comm, point, ev, arg)
    assert ptau.find_ptau_file(d, 10) == path
    assert ptau.find_ptau_file(d, 1 << 10) is None


def test_spartan_snark_with_hyperkzg():
    """Spartan non-preprocessing SNARK over BN254 with the KZG engine."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_nifs import satisfying_pair, tiny_r1cs

    from nova_tpu.r1cs import RelaxedR1CSInstance, RelaxedR1CSWitness
    from nova_tpu.spartan.snark import RelaxedR1CSSNARK

    S = tiny_r1cs(E)
    ck, tau_H = setup_insecure(16)
    U, W = satisfying_pair(E, S, ck, 3)
    rU = RelaxedR1CSInstance.from_r1cs_instance(E.curve, S, U)
    rW = RelaxedR1CSWitness.from_r1cs_witness(S, W)
    drW, bW, bE = rW.derandomize()
    drU = rU.derandomize(CE.derand_key(ck), bW, bE)
    pk, vk = RelaxedR1CSSNARK.setup(E, ck, S, ee=KZG)
    proof = RelaxedR1CSSNARK.prove(E, ck, pk, S, drU, drW, ee=KZG)
    proof.verify(vk, drU, ee=KZG)


def test_mercury_prove_verify():
    from nova_tpu.provider.mercury import EvaluationEngine as Mercury

    f = E.scalar
    for ell in (4, 5):
        n = 1 << ell
        ck, tau_H = setup_insecure(2 * n)
        poly = [rng.randrange(f.p) for _ in range(n)]
        point = [rng.randrange(f.p) for _ in range(ell)]
        ev = MultilinearPolynomial.evaluate_with(f, poly, point)
        comm = CE.commit(ck, poly, 0)
        pk, vk = Mercury.setup(E, ck)
        t1 = E.new_transcript(b"m")
        arg = Mercury.prove(E, ck, pk, t1, comm, poly, point, ev)
        t2 = E.new_transcript(b"m")
        Mercury.verify(E, vk, t2, comm, point, ev, arg)
        t3 = E.new_transcript(b"m")
        with pytest.raises(Exception):
            Mercury.verify(E, vk, t3, comm, point, (ev + 1) % f.p, arg)


def test_mercury_ntt_roundtrip():
    from nova_tpu.provider.mercury import ntt, omega

    p = E.scalar.p
    a = [rng.randrange(p) for _ in range(16)]
    w = omega(p, 4)
    fwd = list(a)
    ntt(fwd, w, 4, p)
    back = list(fwd)
    ntt(back, pow(w, -1, p), 4, p)
    ninv = pow(16, -1, p)
    assert [x * ninv % p for x in back] == a


def test_ivc_with_ptau_setup_constraints():
    """setup_with_ptau_dir builds a KZG-keyed primary (BN254/Grumpkin
    golden constraint counts 9,986/10,538; full compressed e2e covered by
    the slower pipeline drives)."""
    import tempfile

    from nova_tpu.nova.circuit import TrivialCircuit
    from nova_tpu.nova.ivc import PublicParams
    from nova_tpu.provider.engines import GrumpkinEngine

    d = tempfile.mkdtemp()
    path = os.path.join(d, "ppot_pruned_15.ptau")
    ptau.write_test_ptau(path, rng.randrange(E.scalar.p), 15)
    pp = PublicParams.setup_with_ptau_dir(E, GrumpkinEngine, TrivialCircuit(), d)
    assert pp.num_constraints() == (9986, 10538)
    assert getattr(pp.ck_primary, "_tau_H", None) is not None
