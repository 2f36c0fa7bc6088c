"""Round-5 msm3 stage-by-stage compile/run probe.

Prints a line before and after each phase (precompute, sortpack, accum,
finish, warm calls) so a stalled tunnel compile is attributable to ONE
program. Usage: python perf/probe_r5_msm3.py <lg> <window>
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import random

import numpy as np


def main(lg: int, window: int) -> None:
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    from nova_tpu.curves.spec import pallas
    CURVE = pallas
    from nova_tpu.fields.jfield import JField
    from nova_tpu.provider.pedersen import CommitmentEngine
    from nova_tpu.ops import msm2, msm3

    n = 1 << lg
    rng = random.Random(0xBE2C)
    ck = CommitmentEngine.setup(pallas, b"bench-msm", n - 1)
    bases = ck.ck[:n]
    scalars = [rng.randrange(pallas.scalar.p) for _ in range(n)]
    db = msm2.DeviceBases2(pallas, bases)
    jf = JField(pallas.base)
    n_pad = max(512, msm2._next_pow2(n))

    W = msm3._windows_for(window, CURVE.scalar.p, None)
    t0 = time.perf_counter()
    print(f"PHASE fixed3 c={window} W={W} start", flush=True)
    xP, yP, ynegP, finf = msm3._fixed3_packed(db, window, n_pad, W)
    jax.block_until_ready(xP)
    print(f"PHASE fixed3 done {time.perf_counter()-t0:.1f}s", flush=True)

    sabs, negs_n = msm3._sym_reduce_host(scalars, CURVE.scalar.p)
    negs = np.zeros(n_pad, dtype=bool)
    negs[: len(scalars)] = negs_n
    ulimbs = msm3._scalar_ulimbs(sabs, n_pad, window, W)
    t0 = time.perf_counter()
    print("PHASE sortpack start", flush=True)
    sorted_d, st = msm3._sortpack_split(
        window, W, n_pad, ulimbs, negs, xP, yP, ynegP, finf
    )
    sd, sth = jax.device_get((sorted_d[:8], st[:, :8]))
    print(f"PHASE sortpack done {time.perf_counter()-t0:.1f}s", flush=True)

    n_s = W * n_pad
    R, C = msm3._grid_shape(n_s)
    fkey = msm3._field_key(jf)
    t0 = time.perf_counter()
    print(f"PHASE accum start R={R} C={C}", flush=True)
    flush_, colend, flag = msm3._p3_accum(fkey, R, C, "fast")(sorted_d, st)
    jax.device_get(flag)
    print(f"PHASE accum done {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    print("PHASE finish start", flush=True)
    out = msm3._p3_finish(jf.spec.p, window, R, C, "fast")(
        sorted_d, flush_, colend
    )
    jax.device_get(out)
    print(f"PHASE finish done {time.perf_counter()-t0:.1f}s", flush=True)

    # warm per-phase timing (device_get after each phase forces sync)
    for it in range(3):
        t0 = time.perf_counter()
        sorted_d, st = msm3._sortpack_split(
            window, W, n_pad, ulimbs, negs, xP, yP, ynegP, finf
        )
        jax.device_get(st[:1, :1])
        t1 = time.perf_counter()
        flush_, colend, flag = msm3._p3_accum(fkey, R, C, "fast")(sorted_d, st)
        jax.device_get(flag)
        t2 = time.perf_counter()
        out = msm3._p3_finish(jf.spec.p, window, R, C, "fast")(
            sorted_d, flush_, colend
        )
        jax.device_get(out)
        t3 = time.perf_counter()
        print(
            f"warm phases: sortpack {1e3*(t1-t0):.1f} accum {1e3*(t2-t1):.1f}"
            f" finish {1e3*(t3-t2):.1f} ms",
            flush=True,
        )

    # warm full calls
    for it in range(4):
        t0 = time.perf_counter()
        r = msm3.msm_device3(scalars, device_bases=db, window=window)
        dt = time.perf_counter() - t0
        print(f"warm full: {dt*1e3:.1f} ms = {n/dt/1e3:.0f}k pts/s", flush=True)

    r2 = msm2.msm_device2(scalars, device_bases=db, reuse=True)
    print("agree vs msm2:", r == r2, flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
