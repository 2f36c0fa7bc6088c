"""Round-5 probe 2: remote-execution latency floor vs device compute.

Measures (a) trivial-program dispatch+fetch round trip, (b) warm msm2
per-call wall at 2^12/2^16 (slope = real device time), (c) warm msm3
per-call wall at 2^16 (first recorded msm3 number).
Run: python perf/probe_r5_floor.py [engines...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import random

import numpy as np


def timeit(f, iters=5):
    f()  # warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts), sum(ts) / len(ts)


def main(which):
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    from nova_tpu.curves.spec import pallas
    from nova_tpu.provider.pedersen import CommitmentEngine
    from nova_tpu.ops import msm2

    # (a) round-trip floor
    @jax.jit
    def triv(x):
        return x + 1

    x = jnp.ones((8, 128), jnp.uint32)
    lo, avg = timeit(lambda: jax.device_get(triv(x)))
    print(f"[floor] trivial dispatch+get: min {lo*1e3:.1f} ms avg {avg*1e3:.1f} ms",
          flush=True)

    # medium-size result fetch (what msm2 fetches: W rows x 16 limbs x 4)
    y = jnp.ones((1 << 16,), jnp.uint32)

    @jax.jit
    def red(y):
        return jnp.sum(y)

    lo, avg = timeit(lambda: jax.device_get(red(y)))
    print(f"[floor] 2^16-sum dispatch+get: min {lo*1e3:.1f} ms avg {avg*1e3:.1f} ms",
          flush=True)

    rng = random.Random(0xBE2C)
    nmax = 1 << 16
    ck = CommitmentEngine.setup(pallas, b"bench-msm", nmax - 1)
    bases = ck.ck[:nmax]
    db = msm2.DeviceBases2(pallas, bases)
    scal = [rng.randrange(pallas.scalar.p) for _ in range(nmax)]

    if "msm2" in which:
        for lg in (12, 16):
            n = 1 << lg
            s = scal[:n]
            t0 = time.perf_counter()
            r = msm2.msm_device2(s, device_bases=db, reuse=True)
            print(f"[msm2] 2^{lg} first: {time.perf_counter()-t0:.1f}s", flush=True)
            lo, avg = timeit(
                lambda: msm2.msm_device2(s, device_bases=db, reuse=True), 5
            )
            print(f"[msm2] 2^{lg} warm: min {lo*1e3:.1f} avg {avg*1e3:.1f} ms"
                  f" = {n/avg/1e3:.0f}k pts/s", flush=True)

    if "msm3" in which:
        from nova_tpu.ops import msm3

        for lg in (16,):
            n = 1 << lg
            s = scal[:n]
            t0 = time.perf_counter()
            r3 = msm3.msm_device3(s, device_bases=db)
            print(f"[msm3] 2^{lg} first: {time.perf_counter()-t0:.1f}s", flush=True)
            lo, avg = timeit(
                lambda: msm3.msm_device3(s, device_bases=db), 5
            )
            print(f"[msm3] 2^{lg} warm: min {lo*1e3:.1f} avg {avg*1e3:.1f} ms"
                  f" = {n/avg/1e3:.0f}k pts/s", flush=True)
        # cross-check engines agree
        r2 = msm2.msm_device2(scal, device_bases=db, reuse=True)
        print("engines agree:", r2 == r3, flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["msm2", "msm3"])
