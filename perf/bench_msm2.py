"""Correctness + perf harness for ops/msm2 on the TPU.

Usage: python perf/bench_msm2.py [log2_n] [window] [check]
"""

import sys
import time

import numpy as np

import jax

from nova_tpu.curves.spec import pallas as CURVE
from nova_tpu.curves.msm_host import msm as host_msm
from nova_tpu.ops import msm2

lg = int(sys.argv[1]) if len(sys.argv) > 1 else 14
window = int(sys.argv[2]) if len(sys.argv) > 2 else None
check = (sys.argv[3] if len(sys.argv) > 3 else "check") == "check"
n = 1 << lg

rng = np.random.default_rng(42)
order = CURVE.scalar.p
G = CURVE.generator() if hasattr(CURVE, "generator") else None

from nova_tpu.curves.spec import AffinePoint

g = AffinePoint.generator(CURVE)
print(f"building {n} bases...", flush=True)
# distinct pseudorandom points: g * k for small k (host, fast doubling chain)
bases = []
acc = g
for i in range(min(n, 4096)):
    bases.append(acc)
    acc = acc.add(g)
while len(bases) < n:
    bases.extend(bases[: n - len(bases)])

scalars = [int(rng.integers(0, 1 << 62)) << 192 | int(rng.integers(0, 1 << 62))
           for _ in range(n)]
scalars = [s % order for s in scalars]

print("marshalling bases...", flush=True)
db = msm2.DeviceBases2(CURVE, bases)

print("first call (compile)...", flush=True)
t0 = time.perf_counter()
r1 = msm2.msm_device2(scalars, device_bases=db, window=window)
t_compile = time.perf_counter() - t0
print(f"compile+run: {t_compile:.1f}s", flush=True)

t0 = time.perf_counter()
r2 = msm2.msm_device2(scalars, device_bases=db, window=window)
t_warm = time.perf_counter() - t0
print(f"warm: {t_warm*1e3:.1f} ms  -> {n/t_warm/1e3:.1f}k pts/s", flush=True)

t0 = time.perf_counter()
for _ in range(3):
    r3 = msm2.msm_device2(scalars, device_bases=db, window=window)
t_avg = (time.perf_counter() - t0) / 3
print(f"steady: {t_avg*1e3:.1f} ms -> {n/t_avg/1e3:.1f}k pts/s", flush=True)

if check:
    print("host check (sampled dot)...", flush=True)
    # full host MSM is slow beyond 2^14; use it up to that size
    if n <= (1 << 14):
        expect = host_msm(scalars, bases)
        ok = (r1 == expect)
        print("MATCH" if ok else f"MISMATCH: got {r1}, want {expect}")
        sys.exit(0 if ok else 1)
    else:
        print("skipped full host check at this size")
