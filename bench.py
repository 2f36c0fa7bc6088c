"""Headline benchmark. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Primary metric: MSM throughput (points/sec/chip), 2^16 points, Pallas
curve, full 255-bit scalars, through the fixed-base engine the Pedersen
commitment path uses (ops/msm2). Baseline: the only MSM timing the
reference pins down in-repo is halo2curves `msm_best` at 192 ms for 2^20
points (64-bit scalars) on the reference dev machine
(/root/reference/src/provider/msm.rs:493-495), i.e. 5.46M points/sec.
vs_baseline = ours / 5.46e6.

`extra` carries the other BASELINE.json metrics measured on this chip:
  - fold_step_ms: RecursiveSNARK.prove_step wall time (trivial step
    circuit, Pallas/Vesta augmented pair, ~10k constraints each)
  - compressed_snark_prove_s: CompressedSNARK.prove (snark/snark + IPA)
    at the augmented-circuit size
Set NOVA_BENCH_FAST=1 to emit only the MSM metric (used while iterating).
"""

from __future__ import annotations

import json
import os
import random
import time


def bench_msm():
    from nova_tpu.curves.spec import pallas
    from nova_tpu.ops.msm2 import DeviceBases2, msm_device2
    from nova_tpu.provider.pedersen import CommitmentEngine

    n = 1 << 16
    rng = random.Random(0xBE2C)
    # via the engine so the hash-to-curve generators disk-cache across runs
    bases = CommitmentEngine.setup(pallas, b"bench-msm", n - 1).ck[:n]
    db = DeviceBases2(pallas, bases)
    scalars = [rng.randrange(pallas.scalar.p) for _ in range(n)]

    msm_device2(scalars, device_bases=db, reuse=True)  # compile + precompute
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        msm_device2(scalars, device_bases=db, reuse=True)
    dt = (time.perf_counter() - t0) / iters
    return n / dt


def bench_fold_and_compress():
    from nova_tpu.provider.engines import PallasEngine, VestaEngine
    from nova_tpu.nova.circuit import TrivialCircuit
    from nova_tpu.nova.compressed import CompressedSNARK
    from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK

    c = TrivialCircuit()
    pp = PublicParams.setup(PallasEngine, VestaEngine, c)
    rs = RecursiveSNARK.new(pp, c, [0])
    rs.prove_step(pp, c)  # base-case bump
    rs.prove_step(pp, c)  # warm (compiles)
    t0 = time.perf_counter()
    rs.prove_step(pp, c)
    fold_ms = (time.perf_counter() - t0) * 1e3

    pk, vk = CompressedSNARK.setup(pp)
    t0 = time.perf_counter()
    proof = CompressedSNARK.prove(pp, pk, rs)
    compress_s = time.perf_counter() - t0
    proof.verify(vk, rs.i, [0])
    return fold_ms, compress_s


def _device_available() -> bool:
    """Probe the accelerator in a subprocess so a wedged tunnel can't hang
    the whole bench run."""
    from nova_tpu._env import accelerator_available

    return accelerator_available(timeout_s=180)


def bench_msm_host():
    """Host-native MSM fallback when no accelerator responds."""
    from nova_tpu.curves.spec import pallas
    from nova_tpu.provider.pedersen import CommitmentEngine
    from nova_tpu import native

    n = 1 << 16
    rng = random.Random(0xBE2C)
    ck = CommitmentEngine.setup(pallas, b"bench-msm", n - 1)
    arrays = ck.host_arrays(n)
    scalars = [rng.randrange(pallas.scalar.p) for _ in range(n)]
    sl = native.ints_to_limbs(scalars)
    native.msm_cached(pallas, arrays, sl)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        native.msm_cached(pallas, arrays, sl)
    return n / ((time.perf_counter() - t0) / iters)


def main() -> None:
    device_ok = _device_available()
    if device_ok:
        pts_per_sec = bench_msm()
        backend = "tpu"
    else:
        # env var alone does not beat the axon plugin; pin the config too
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        pts_per_sec = bench_msm_host()
        backend = "host-fallback (accelerator unavailable)"
    baseline = (1 << 20) / 0.192  # reference msm_best datum
    extra = {"backend": backend}
    if not os.environ.get("NOVA_BENCH_FAST"):
        try:
            fold_ms, compress_s = bench_fold_and_compress()
            extra.update(
                fold_step_ms=round(fold_ms, 1),
                compressed_snark_prove_s=round(compress_s, 2),
            )
        except Exception as e:  # pragma: no cover
            extra["error"] = f"{type(e).__name__}: {e}"[:200]
    print(
        json.dumps(
            {
                "metric": "msm_points_per_sec_per_chip_2e16",
                "value": round(pts_per_sec, 1),
                "unit": "points/sec",
                "vs_baseline": round(pts_per_sec / baseline, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
