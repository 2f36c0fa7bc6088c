"""msm3 mont-path (production commit path) throughput sweep on the live
chip: BASELINE grid sizes 2^16..2^20+. Correctness cross-check vs the
host-native MSM at every size.

Run: python perf/bench_msm3m_sweep.py [lg ...]   (default 16 18 20)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import random

import numpy as np


def main(sizes):
    import jax

    assert jax.default_backend() == "tpu"
    from nova_tpu import native
    from nova_tpu.curves.spec import pallas as CURVE, AffinePoint
    from nova_tpu.fields.jfield import JField
    from nova_tpu.ops.fvec import FVec
    from nova_tpu.ops import msm2, msm3

    rng = random.Random(42)
    max_n = 1 << max(sizes)
    t0 = time.perf_counter()
    g = AffinePoint.generator(CURVE)
    distinct, acc = [], g
    for _ in range(4096):
        distinct.append(acc)
        acc = acc.add(g)
    bases_all = (distinct * ((max_n // 4096) + 1))[:max_n]
    print(f"bases built {time.perf_counter()-t0:.1f}s", flush=True)

    sf = JField(CURVE.scalar)
    for lg in sizes:
        n = 1 << lg
        bases = bases_all[:n]
        scalars = [rng.randrange(CURVE.scalar.p) for _ in range(n)]
        t0 = time.perf_counter()
        db = msm2.DeviceBases2(CURVE, bases)
        marr = FVec.from_ints(sf, scalars).m
        jax.block_until_ready(marr)
        print(f"2^{lg}: marshal {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        r = msm3.msm_device3_mont(marr, db)
        print(f"2^{lg}: first call {time.perf_counter()-t0:.1f}s", flush=True)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            r = msm3.msm_device3_mont(marr, db)
        dt = (time.perf_counter() - t0) / iters
        print(
            f"2^{lg}: steady {dt*1e3:.1f} ms = {n/dt/1e6:.3f} M pts/s",
            flush=True,
        )
        if native.available():
            t0 = time.perf_counter()
            want = native.msm_cached(
                CURVE,
                native.marshal_points(bases),
                native.ints_to_limbs(scalars),
            )
            ok = r == want
            print(
                f"2^{lg}: {'MATCH' if ok else 'MISMATCH'} "
                f"(host check {time.perf_counter()-t0:.1f}s)",
                flush=True,
            )
            if not ok:
                sys.exit(1)


if __name__ == "__main__":
    main([int(x) for x in (sys.argv[1:] or ["16", "18", "20"])])
