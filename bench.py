"""Headline benchmark: MSM throughput (points/sec/chip), 2^16 points,
Pallas curve, full 255-bit scalars.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the only MSM timing the reference pins down in-repo is
halo2curves `msm_best` at 192 ms for 2^20 points (64-bit scalars) on the
reference dev machine (/root/reference/src/provider/msm.rs:493-495), i.e.
5.46M points/sec. vs_baseline = ours / 5.46e6.
"""

from __future__ import annotations

import json
import random
import time


def main() -> None:
    from nova_tpu.curves.spec import pallas
    from nova_tpu.ops.msm import DeviceBases, msm_device
    from nova_tpu.provider.pedersen import from_label

    n = 1 << 16
    rng = random.Random(0xBE2C)

    bases = from_label(pallas, b"bench-msm", n)
    db = DeviceBases(pallas, bases)
    scalars = [rng.randrange(pallas.scalar.p) for _ in range(n)]

    # warmup (compile)
    msm_device(scalars, device_bases=db)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        msm_device(scalars, device_bases=db)
    dt = (time.perf_counter() - t0) / iters

    pts_per_sec = n / dt
    baseline = (1 << 20) / 0.192  # reference msm_best datum
    print(
        json.dumps(
            {
                "metric": "msm_points_per_sec_per_chip_2e16",
                "value": round(pts_per_sec, 1),
                "unit": "points/sec",
                "vs_baseline": round(pts_per_sec / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
