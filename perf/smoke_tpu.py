"""On-TPU smoke: run the device MSM engines on the REAL chip at a small
size and compare bit-for-bit against the host-native reference MSM.

This is the only place the Pallas kernels (ops/msm2 bucket-reduce,
ops/msm3 column-serial accumulation) execute on real hardware outside the
headline bench — the CPU suite exercises their XLA fallbacks only
(tests/conftest.py pins JAX_PLATFORMS=cpu). Wired into the suite as
tests/test_on_tpu.py behind NOVA_TEST_ON_TPU=1.

Run directly:  python perf/smoke_tpu.py [n]
Prints one OK/FAIL line per engine and exits non-zero on mismatch.
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, "/root/repo")


def main(n: int = 512) -> int:
    import jax

    assert jax.default_backend() == "tpu", (
        "smoke_tpu needs the real chip; backend=" + jax.default_backend()
    )
    from nova_tpu import native
    from nova_tpu.curves.spec import pallas
    from nova_tpu.provider.pedersen import CommitmentEngine

    rng = random.Random(0x5310)
    ck = CommitmentEngine.setup(pallas, b"bench-msm", n - 1)
    bases = ck.ck[:n]
    scalars = [rng.randrange(pallas.scalar.p) for _ in range(n)]

    arrays = ck.host_arrays(n)
    want = native.msm_cached(pallas, arrays, native.ints_to_limbs(scalars))

    rc = 0
    from nova_tpu.ops.msm import DeviceBases, msm_device
    from nova_tpu.ops.msm2 import DeviceBases2, msm_device2
    from nova_tpu.ops.msm3 import msm_device3

    db2 = DeviceBases2(pallas, bases)
    runs = [
        ("msm1", lambda: msm_device(scalars, device_bases=DeviceBases(pallas, bases))),
        ("msm2", lambda: msm_device2(scalars, device_bases=db2, reuse=True)),
        ("msm3", lambda: msm_device3(scalars, device_bases=db2)),
    ]
    for name, run in runs:
        t0 = time.perf_counter()
        try:
            got = run()
        except Exception as e:  # noqa: BLE001 - report, keep smoking
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
            rc = 1
            continue
        wall = time.perf_counter() - t0
        if got == want:
            print(f"OK {name} n={n} wall={wall:.1f}s", flush=True)
        else:
            print(f"FAIL {name}: result mismatch (n={n})", flush=True)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 512))
