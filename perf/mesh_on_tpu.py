"""Real-hardware mesh evidence (SURVEY §2.10): run the sharded MSM and
the sharded Spartan outer sumcheck on a REAL jax.sharding.Mesh over the
live TPU (axis size 1 — the only real-chip mesh this environment can
build) and check both against the host reference bit-for-bit.

The CPU suite runs the same code paths on an 8-device virtual mesh
(tests/test_parallel.py); this script is the proof that the shard_map
programs compile and execute on real TPU hardware, and it produces the
single-chip timings that anchor PERFORMANCE.md's communication model for
the N-host scaling estimate.

Run: python perf/mesh_on_tpu.py   (needs the axon TPU; minutes of
first-compile, cached afterwards)
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax

    assert jax.default_backend() == "tpu", (
        "mesh_on_tpu needs the real chip; backend=" + jax.default_backend()
    )
    from nova_tpu import native
    from nova_tpu import parallel as par
    from nova_tpu.curves.spec import pallas
    from nova_tpu.provider.pedersen import CommitmentEngine

    rc = 0
    rng = random.Random(0x0E5)
    mesh = par.make_mesh(1)
    print(f"mesh: {mesh.devices.size} real device(s) "
          f"({mesh.devices.flat[0].platform})", flush=True)

    # --- sharded outer sumcheck vs host prover (bit-identical) ---------
    from nova_tpu.provider.engines import PallasEngine
    from nova_tpu.spartan.polys import MultilinearPolynomial
    from nova_tpu.spartan.sumcheck import SumcheckProof

    field = PallasEngine.scalar
    p = field.p
    m = 1 << 10
    Az = [rng.randrange(p) for _ in range(m)]
    Bz = [rng.randrange(p) for _ in range(m)]
    # claim 0 must be TRUE (outer-sumcheck shape): with a false claim the
    # claim-derived linear coefficient (BDDT) makes different provers
    # emit different-but-equally-meaningless transcripts
    Cz = [a * b % p for a, b in zip(Az, Bz)]
    taus = [rng.randrange(p) for _ in range(10)]

    tr1 = PallasEngine.new_transcript(b"mesh-sc")
    t0 = time.perf_counter()
    proof_s, r_s, claims_s = par.prove_cubic_with_three_inputs_sharded(
        field, 0, taus, Az, Bz, Cz, tr1, mesh
    )
    sc_wall = time.perf_counter() - t0
    tr2 = PallasEngine.new_transcript(b"mesh-sc")
    proof_h, r_h, claims_h = SumcheckProof.prove_cubic_with_three_inputs(
        field, 0, taus,
        MultilinearPolynomial(field, list(Az)),
        MultilinearPolynomial(field, list(Bz)),
        MultilinearPolynomial(field, list(Cz)),
        tr2,
    )
    coeffs = lambda pr: [
        cp.coeffs_except_linear_term for cp in pr.compressed_polys
    ]
    if (
        coeffs(proof_s) == coeffs(proof_h)
        and list(r_s) == list(r_h)
        and list(claims_s) == list(claims_h)
    ):
        print(f"OK sharded_sumcheck m={m} rounds={len(taus)} "
              f"wall={sc_wall:.1f}s (bit-identical to host)", flush=True)
    else:
        print("FAIL sharded_sumcheck: proof diverges from host prover",
              flush=True)
        rc = 1
    # --- sharded MSM on the real mesh vs host-native reference ---------
    n = 1 << 12
    ck = CommitmentEngine.setup(pallas, b"bench-msm", n - 1)
    bases = ck.ck[:n]
    scalars = [rng.randrange(pallas.scalar.p) for _ in range(n)]
    want = native.msm_cached(
        pallas, ck.host_arrays(n), native.ints_to_limbs(scalars)
    )
    from nova_tpu.ops.msm3 import DeviceBases2

    db = DeviceBases2(pallas, bases)
    t0 = time.perf_counter()
    got = par.msm_sharded(scalars, mesh=mesh, device_bases=db)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    got2 = par.msm_sharded(scalars, mesh=mesh, device_bases=db)
    warm = time.perf_counter() - t0
    if got == want and got2 == want:
        print(f"OK msm_sharded n={n} cold={cold:.1f}s warm={warm:.3f}s",
              flush=True)
    else:
        print("FAIL msm_sharded: mismatch vs host MSM", flush=True)
        rc = 1

    return rc


if __name__ == "__main__":
    sys.exit(main())
