"""MSM v3 sweep on TPU: correctness at 2^12, perf at 2^16..2^20.

Bases are distinct multiples of G (k*G, k=1..n) so the fast-add path
never hits degenerate same-point additions, matching real commitment
keys (from_label generators are distinct)."""

import os

import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import sys
import time

import numpy as np

from nova_tpu.curves.spec import pallas as CURVE, AffinePoint
from nova_tpu.curves.msm_host import msm as host_msm
from nova_tpu.ops import msm3
from nova_tpu.ops.msm2 import DeviceBases2

sizes = [int(x) for x in (sys.argv[1:] or ["12", "16", "18", "20"])]
rng = np.random.default_rng(42)
order = CURVE.scalar.p

g = AffinePoint.generator(CURVE)
max_n = 1 << max(sizes)
print(f"building {max_n} distinct bases...", flush=True)
t0 = time.perf_counter()
bases_all = []
acc = g
for i in range(max_n):
    bases_all.append(acc)
    acc = acc.add(g)
print(f"bases built in {time.perf_counter()-t0:.1f}s", flush=True)

for lg in sizes:
    n = 1 << lg
    bases = bases_all[:n]
    scalars = [
        (int(rng.integers(0, 1 << 62)) * int(rng.integers(1, 1 << 62))
         * int(rng.integers(1, 1 << 62))) % order
        for _ in range(n)
    ]
    db = DeviceBases2(CURVE, bases)
    t0 = time.perf_counter()
    r1 = msm3.msm_device3(scalars, device_bases=db)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        r2 = msm3.msm_device3(scalars, device_bases=db)
    t_avg = (time.perf_counter() - t0) / iters
    print(
        f"2^{lg}: compile+run {t_compile:.1f}s; steady {t_avg*1e3:.1f} ms "
        f"= {n/t_avg/1e6:.3f} M pts/s",
        flush=True,
    )
    if lg <= 13:
        want = host_msm(scalars, bases)
        print(f"2^{lg} check: {'MATCH' if r1 == want else 'MISMATCH'}", flush=True)
