"""Provider layer: engines, hashes, transcripts, commitments.

Mirrors the reference's `src/provider/` (SURVEY.md §2.2): concrete Engine
bundles over three curve cycles, the Poseidon random oracle, the Keccak256
Fiat-Shamir transcript, and the Pedersen / HyperKZG commitment engines,
backed by the TPU MSM in :mod:`nova_tpu.ops.msm`.
"""

from nova_tpu.provider.engines import (
    Engine,
    PallasEngine,
    VestaEngine,
    Bn256EngineIPA,
    Bn256EngineKZG,
    GrumpkinEngine,
    Secp256k1Engine,
    Secq256k1Engine,
)

__all__ = [
    "Engine",
    "PallasEngine",
    "VestaEngine",
    "Bn256EngineIPA",
    "Bn256EngineKZG",
    "GrumpkinEngine",
    "Secp256k1Engine",
    "Secq256k1Engine",
]
