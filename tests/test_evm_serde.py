"""EVM big-endian proof serialization (reference `evm` feature:
src/traits/evm_serde.rs + per-curve CustomSerdeTrait: 32-byte big-endian
words, uncompressed validated points)."""

import pytest

from nova_tpu import serde
from nova_tpu.curves.spec import AffinePoint, pallas
from nova_tpu.errors import NovaError


def test_evm_roundtrip_and_validation():
    g = AffinePoint.generator(pallas)
    obj = {"pt": g, "vals": [0, 7, pallas.base.p - 1],
           "inf": AffinePoint.identity(pallas)}
    raw = serde.dumps_evm(obj)
    back = serde.loads_evm(raw)
    assert back["pt"].x == g.x and back["pt"].y == g.y
    assert back["inf"].infinity
    assert back["vals"] == obj["vals"]
    # every field element is a fixed 32-byte big-endian word
    assert g.x.to_bytes(32, "big") in raw
    # off-curve tampering is rejected
    bad = bytearray(raw)
    idx = raw.find(g.x.to_bytes(32, "big"))
    bad[idx + 31] ^= 1
    with pytest.raises(NovaError):
        serde.loads_evm(bytes(bad))
    # oversized ints are refused at encode time
    with pytest.raises(NovaError):
        serde.dumps_evm({"v": 1 << 256})


def test_evm_compressed_snark_proof_roundtrip():
    from nova_tpu.nova.circuit import TrivialCircuit
    from nova_tpu.nova.compressed import CompressedSNARK
    from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK
    from nova_tpu.provider.engines import PallasEngine, VestaEngine

    c = TrivialCircuit()
    pp = PublicParams.setup(PallasEngine, VestaEngine, c)
    rs = RecursiveSNARK.new(pp, c, [0])
    rs.prove_step(pp, c)
    rs.prove_step(pp, c)
    pk, vk = CompressedSNARK.setup(pp)
    proof = CompressedSNARK.prove(pp, pk, rs)
    raw = serde.dumps_evm(proof)
    back = serde.loads_evm(raw)
    assert back.verify(vk, rs.i, [0]) == rs.zi
