"""MSM v2 sweep on TPU: correctness check at 2^12, perf at 2^16..2^20."""

import os

import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np

from nova_tpu.curves.spec import pallas as CURVE, AffinePoint
from nova_tpu.curves.msm_host import msm as host_msm
from nova_tpu.ops import msm2

sizes = [int(x) for x in (sys.argv[1:] or ["12", "16", "18", "20"])]
rng = np.random.default_rng(42)
order = CURVE.scalar.p

g = AffinePoint.generator(CURVE)
max_n = 1 << max(sizes)
print(f"building {max_n} bases (cyclic fill from 4096 distinct)...", flush=True)
distinct = []
acc = g
for i in range(4096):
    distinct.append(acc)
    acc = acc.add(g)
bases_all = (distinct * ((max_n // 4096) + 1))[:max_n]

for lg in sizes:
    n = 1 << lg
    bases = bases_all[:n]
    scalars = [
        (int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
         * int(rng.integers(0, 1 << 62))) % order
        for _ in range(n)
    ]
    db = msm2.DeviceBases2(CURVE, bases)
    t0 = time.perf_counter()
    r1 = msm2.msm_device2(scalars, device_bases=db)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        r2 = msm2.msm_device2(scalars, device_bases=db)
    t_avg = (time.perf_counter() - t0) / iters
    print(
        f"2^{lg}: compile+run {t_compile:.1f}s; steady {t_avg*1e3:.1f} ms "
        f"= {n/t_avg/1e6:.3f} M pts/s",
        flush=True,
    )
    if lg <= 13:
        want = host_msm(scalars, bases)
        print(f"2^{lg} check: {'MATCH' if r1 == want else 'MISMATCH'}", flush=True)
