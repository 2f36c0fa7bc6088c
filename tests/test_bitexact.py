"""Bit-exactness pins against Rust-reference-generated vectors
(VERDICT round-1 item 4: generator derivation, Poseidon RO squeezes,
NIFS challenges, IVC instance hashes).

The vectors CANNOT be generated inside this environment (no Rust
toolchain, zero network egress; the halo2curves sources the reference
links against are not on disk). tools/gen_golden_vectors.rs documents
exactly what to run against a reference checkout; drop its output at
tests/vectors/golden_vectors.json and these tests go live. Until then
they skip — loudly, so the gap stays visible.

What IS pinned today without Rust-generated vectors (see the other test
modules): Keccak transcripts byte-for-byte against the reference's
embedded golden vectors (both byte orders), Poseidon round counts and
IO patterns, and every augmented-circuit constraint count.
"""

import json
import os

import pytest

_VECTORS = os.path.join(os.path.dirname(__file__), "vectors", "golden_vectors.json")

# The reference's own expect-test snapshots (the acceptance targets for a
# bincode-exact PublicParams digest; /root/reference/src/nova/mod.rs:1128-1139
# and src/neutron/mod.rs:547-557). Matching these requires replicating the
# serde+bincode(legacy) byte layout of the reference's third-party structs
# (neptune PoseidonConstants, halo2curves derive_serde points) whose sources
# are not on disk here; nova_tpu uses its own canonical digest serialization
# instead (nova/ivc.py). Recorded so the gap is explicit and testable the
# moment those layouts can be verified against a Rust toolchain.
REFERENCE_PP_DIGESTS = {
    ("PallasEngine", "VestaEngine"): "5e8f9428786cf553693b71f43bbc810f4140a55891d63e50f764b299467b5800",
    ("Bn256EngineIPA", "GrumpkinEngine"): "05d7396a6d9d795b73d60e26cd5738ed103951ff8da4b75c322f03d1c3097702",
    ("Secp256k1Engine", "Secq256k1Engine"): "489310e7fe179a1e6908e2d89bd4b2089fa116ff0050993c8d8a3997ccabb000",
}
REFERENCE_NEUTRON_DIGESTS = {
    "PallasEngine": "1eace7bdd6adcc1693b7a32410df94cc87ec67554bc775df7132425d7c377a01",
    "Bn256EngineKZG": "543d44307cb6808e3b4be6ce67333f1b5bf4416a869d6c4cef93bceda0f55e01",
    "Secp256k1Engine": "d354ec02cf4004b1c91d96fbe1b494059c96cfbac56579bc4784dc92dc0ffe03",
}


def _load():
    if not os.path.exists(_VECTORS):
        pytest.skip(
            "golden_vectors.json absent: generate with tools/gen_golden_vectors.rs "
            "against a nova-snark checkout (needs a Rust toolchain)"
        )
    with open(_VECTORS) as fh:
        return json.load(fh)


def test_from_label_generators_match_reference():
    vecs = _load()["from_label"]
    from nova_tpu.curves.spec import bn254, pallas, vesta
    from nova_tpu.provider.pedersen import from_label

    curves = {"pallas": pallas, "vesta": vesta, "bn254": bn254}
    for name, expected in vecs.items():
        gens = from_label(curves[name], b"ck", len(expected))
        for g, (ex, ey) in zip(gens, expected):
            assert (g.x, g.y) == (int(ex, 16), int(ey, 16)), name


def test_poseidon_ro_squeezes_match_reference():
    vecs = _load()["poseidon_ro"]
    from nova_tpu.constants import NUM_HASH_BITS
    from nova_tpu.provider.engines import Engine
    from nova_tpu.provider.poseidon import PoseidonRO, PoseidonROConstants

    for case in vecs:
        eng = Engine._registry[case["engine"]]
        ro = PoseidonRO(PoseidonROConstants(eng.base), case.get("mode", "wide"))
        for i in range(case["absorb_count"]):
            ro.absorb(i)
        assert ro.squeeze(NUM_HASH_BITS) == int(case["squeeze"], 16)


def test_nifs_challenge_sequence_matches_reference():
    vecs = _load()["nifs"]
    # fixed-blind fold of the tiny cubic R1CS; compare comm_T and r
    from nova_tpu.nova.nifs import NIFS
    from nova_tpu.provider.engines import PallasEngine
    from nova_tpu.r1cs import (
        R1CSInstance,
        R1CSWitness,
        RelaxedR1CSInstance,
        RelaxedR1CSWitness,
    )
    from tests.test_nifs import satisfying_pair, tiny_r1cs

    S = tiny_r1cs(PallasEngine)
    ck = S.commitment_key()
    U1, W1 = satisfying_pair(PallasEngine, S, ck, 5)
    U2, W2 = satisfying_pair(PallasEngine, S, ck, 9)
    rU = RelaxedR1CSInstance.from_r1cs_instance(PallasEngine.curve, S, U1)
    rW = RelaxedR1CSWitness.from_r1cs_witness(S, W1)
    nifs, (Uf, Wf) = NIFS.prove(
        ck, PallasEngine, int(vecs["pp_digest"], 16), S, rU, rW, U2, W2,
        r_T=int(vecs["r_T"], 16),
    )
    x, y, _ = nifs.comm_T.to_coordinates()
    assert (x, y) == (int(vecs["comm_T_x"], 16), int(vecs["comm_T_y"], 16))
