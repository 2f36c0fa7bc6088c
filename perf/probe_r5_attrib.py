"""Round-5 attribution probe: where do the ~250 ms of a 'steady state'
msm_device2 call at 2^16 actually go?

Splits one call into: host int->limb conversion, H2D transfer of the
scalar limbs, the device program itself (device-resident operands,
block_until_ready), D2H of the result row, and the affine finish.
Run on the live chip:  python perf/probe_r5_attrib.py [lg] [engine]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import random

import numpy as np


def main(lg: int = 16, engine: str = "msm2") -> None:
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()
    from nova_tpu.curves.spec import pallas
    from nova_tpu.provider.pedersen import CommitmentEngine
    from nova_tpu.fields.jfield import JField
    from nova_tpu.ops import msm2

    n = 1 << lg
    rng = random.Random(0xBE2C)
    t0 = time.perf_counter()
    ck = CommitmentEngine.setup(pallas, b"bench-msm", n - 1)
    bases = ck.ck[:n]
    scalars = [rng.randrange(pallas.scalar.p) for _ in range(n)]
    print(f"setup+scalars: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    db = msm2.DeviceBases2(pallas, bases)
    print(f"DeviceBases2 marshal: {time.perf_counter()-t0:.1f}s", flush=True)

    jf = JField(pallas.base)
    n_pad = max(512, msm2._next_pow2(n))
    window = 16 if n_pad >= (1 << 18) else (14 if n_pad >= (1 << 14) else 12)
    chunk = min(msm2.GRAIN, n_pad)

    t0 = time.perf_counter()
    fx, fy, finf = db.fixed(window, n_pad)
    jax.block_until_ready(fx)
    print(f"fixed-base precompute (c={window}): {time.perf_counter()-t0:.1f}s",
          flush=True)

    if engine == "msm3":
        from nova_tpu.ops import msm3

        # full-call timing only (msm3 internals differ)
        t0 = time.perf_counter()
        r = msm3.msm_device3(scalars, device_bases=db)
        print(f"msm3 first call: {time.perf_counter()-t0:.1f}s", flush=True)
        for it in range(4):
            t0 = time.perf_counter()
            r = msm3.msm_device3(scalars, device_bases=db)
            dt = time.perf_counter() - t0
            print(f"msm3 full call: {dt*1e3:.1f} ms = {n/dt/1e3:.0f}k pts/s",
                  flush=True)
        return

    # ---- stage attribution for msm2 fixed path ----
    # 1. host conversion
    for _ in range(2):
        t0 = time.perf_counter()
        limbs = msm2._scalar_limbs(scalars, n_pad)
        t_conv = time.perf_counter() - t0
    print(f"[1] _scalar_limbs host conv: {t_conv*1e3:.1f} ms", flush=True)

    # 2. H2D
    for _ in range(3):
        t0 = time.perf_counter()
        dlimbs = jnp.asarray(limbs)
        jax.block_until_ready(dlimbs)
        t_h2d = time.perf_counter() - t0
    mb = limbs.nbytes / 1e6
    print(f"[2] H2D {mb:.1f} MB: {t_h2d*1e3:.1f} ms = {mb/t_h2d:.1f} MB/s",
          flush=True)

    # 3. device program, operands resident
    prog = msm2._msm2_fixed_program
    t0 = time.perf_counter()
    out = prog(jf.spec.p, window, chunk, dlimbs, fx, fy, finf)
    jax.block_until_ready(out)
    print(f"[3] program first (compile?): {time.perf_counter()-t0:.1f}s",
          flush=True)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = prog(jf.spec.p, window, chunk, dlimbs, fx, fy, finf)
        jax.block_until_ready(out)
    t_prog = (time.perf_counter() - t0) / iters
    print(f"[3] program steady: {t_prog*1e3:.1f} ms = {n/t_prog/1e3:.0f}k pts/s",
          flush=True)

    # 4. D2H + finish
    t0 = time.perf_counter()
    o, flag = jax.device_get(out)
    t_d2h = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = msm2._xyzz_row_to_affine(pallas, o)
    t_fin = time.perf_counter() - t0
    print(f"[4] D2H: {t_d2h*1e3:.1f} ms; affine finish: {t_fin*1e3:.1f} ms",
          flush=True)

    # 5. whole-call comparison
    for it in range(3):
        t0 = time.perf_counter()
        r = msm2.msm_device2(scalars, device_bases=db, reuse=True)
        dt = time.perf_counter() - t0
        print(f"[5] msm_device2 full call: {dt*1e3:.1f} ms = "
              f"{n/dt/1e3:.0f}k pts/s", flush=True)
    # sanity vs host
    from nova_tpu import native
    arrays = ck.host_arrays(n)
    want = native.msm_cached(pallas, arrays, native.ints_to_limbs(scalars))
    print("MATCH" if r == want else "MISMATCH", flush=True)


if __name__ == "__main__":
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    eng = sys.argv[2] if len(sys.argv) > 2 else "msm2"
    main(lg, eng)
