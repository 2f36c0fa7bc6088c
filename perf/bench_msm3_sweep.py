"""MSM v3 sweep on TPU: correctness at 2^12, perf at 2^16..2^20.

Bases are distinct multiples of G (k*G, k=1..n) so the fast-add path
never hits degenerate same-point additions, matching real commitment
keys (from_label generators are distinct)."""

import os

import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
_cache = f"/root/.cache/nova_sweep_bases_{CURVE.name}_{max_n}.npy"
if os.path.exists(_cache):
    rows = np.load(_cache, allow_pickle=False)
    bases_all = [AffinePoint(CURVE, int.from_bytes(r[:32].tobytes(), "little"),
                             int.from_bytes(r[32:].tobytes(), "little"))
                 for r in rows]
else:
    # chunked arithmetic-progression build with one batch-inverse per chunk
    F = CURVE.base
    p = F.p
    m = 1024
    small = []
    acc = g
    for _ in range(m):
        small.append((acc.x, acc.y))
        acc = acc.add(g)  # acc = (i+2)*G
    bases_xy = list(small)
    step = acc.add(g.neg())  # m*G
    off = step
    for j in range(1, (max_n + m - 1) // m):
        ox, oy = off.x, off.y
        dx = [(x - ox) % p for x, _ in small]
        dxi = F.batch_inv(dx)
        chunk = []
        for (x, y), di in zip(small, dxi):
            lam = (y - oy) * di % p
            x3 = (lam * lam - ox - x) % p
            y3 = (lam * (ox - x3) - oy) % p
            chunk.append((x3, y3))
        bases_xy.extend(chunk)
        off = off.add(step) if j + 1 < (max_n + m - 1) // m else off
    bases_xy = bases_xy[:max_n]
    bases_all = [AffinePoint(CURVE, x, y) for x, y in bases_xy]
    os.makedirs("/root/.cache", exist_ok=True)
    rows = np.zeros((max_n, 64), dtype=np.uint8)
    for i, (x, y) in enumerate(bases_xy):
        rows[i, :32] = np.frombuffer(x.to_bytes(32, "little"), np.uint8)
        rows[i, 32:] = np.frombuffer(y.to_bytes(32, "little"), np.uint8)
    np.save(_cache, rows, allow_pickle=False)
print(f"bases built in {time.perf_counter()-t0:.1f}s", flush=True)
_k = min(1337, max_n - 1)
assert bases_all[-1].is_on_curve()
assert bases_all[_k] == g.mul(_k + 1), "base progression broken"

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
