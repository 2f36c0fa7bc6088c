"""Checkpoint/resume + key save/load tests (SURVEY.md §5: serde on
everything is the reference's checkpointing story)."""

import os
import tempfile

import pytest

from nova_tpu import checkpoint
from nova_tpu.errors import NovaError
from nova_tpu.nova.circuit import NonTrivialCircuit, TrivialCircuit
from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK
from nova_tpu.provider.engines import PallasEngine, VestaEngine
from nova_tpu.provider.pedersen import CommitmentEngine as CE


@pytest.fixture(scope="module")
def pp():
    return PublicParams.setup(PallasEngine, VestaEngine, TrivialCircuit())


def test_checkpoint_resume_roundtrip(pp, tmp_path):
    c = TrivialCircuit()
    rs = RecursiveSNARK.new(pp, c, [1])
    rs.prove_step(pp, c)
    rs.prove_step(pp, c)

    path = os.path.join(tmp_path, "ivc.ckpt")
    checkpoint.save_recursive_snark(path, pp, rs)

    rs2 = checkpoint.load_recursive_snark(path, pp)
    assert rs2.i == rs.i and rs2.zi == rs.zi

    # resumed state continues proving and verifies
    rs2.prove_step(pp, c)
    assert rs2.verify(pp, 3, [1]) == [1]


def test_checkpoint_digest_binding(pp, tmp_path):
    c = TrivialCircuit()
    rs = RecursiveSNARK.new(pp, c, [1])
    rs.prove_step(pp, c)
    path = os.path.join(tmp_path, "ivc.ckpt")
    checkpoint.save_recursive_snark(path, pp, rs)

    class FakePP:
        def digest(self):
            return 42

    with pytest.raises(NovaError):
        checkpoint.load_recursive_snark(path, FakePP())


def test_ck_save_load(tmp_path):
    ck = CE.setup(PallasEngine.curve, b"ckpt-test", 8)
    path = os.path.join(tmp_path, "key.bin")
    checkpoint.save_ck(path, ck)
    ck2 = checkpoint.load_ck(path, PallasEngine.curve)
    assert ck2.ck == ck.ck and ck2.h == ck.h
    v = list(range(1, 9))
    assert CE.commit(ck, v, 7).point == CE.commit(ck2, v, 7).point


def test_proof_bytes_roundtrip(pp):
    c = TrivialCircuit()
    rs = RecursiveSNARK.new(pp, c, [1])
    rs.prove_step(pp, c)
    from nova_tpu.nova.compressed import CompressedSNARK

    pk, vk = CompressedSNARK.setup(pp)
    proof = CompressedSNARK.prove(pp, pk, rs)
    data = checkpoint.proof_to_bytes(proof)
    proof2 = checkpoint.proof_from_bytes(data)
    assert proof2.verify(vk, 1, [1]) == proof.verify(vk, 1, [1])


def test_checkpoint_device_resident_witness(tmp_path):
    """FVec/HVec witness vectors must serialize (the device prover path
    keeps W/E device-resident; checkpoints encode them as int lists)."""
    from nova_tpu import serde
    from nova_tpu.fields.jfield import JField
    from nova_tpu.ops.fvec import FVec, HVec
    from nova_tpu.provider.engines import PallasEngine

    f = PallasEngine.scalar
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    fv = FVec.from_ints(JField(f), vals)
    hv = HVec(f.p, ints=vals)
    raw = serde.dumps({"fv": fv, "hv": hv})
    back = serde.loads(raw)
    assert back["fv"] == vals and back["hv"] == vals


def test_profiling_phase_collector():
    import os

    from nova_tpu import profiling

    with profiling.phases() as ph:
        with ph("a"):
            pass
        with ph("a"):
            pass
    assert ph.counts["a"] == 2 and "a" in ph.report()
    os.environ["NOVA_PROFILE"] = "1"
    try:
        profiling.global_reset()
        with profiling.phase("x"):
            pass
        assert "x" in profiling.global_report()
    finally:
        del os.environ["NOVA_PROFILE"]
        profiling.global_reset()
