"""Separate trace/lower (local) from backend compile (tunnel server) for
the msm3 program, to pin where the on-TPU first-run stalls (round-3: the
full msm_device3 call sat >30 min at 0 local CPU; precompute alone was
fine; program text is ~5.6 MB — comparable to the round-1 engine that
compiles on this backend)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import random

import jax
import jax.numpy as jnp

t0 = time.time()
from nova_tpu.curves.spec import AffinePoint, pallas
from nova_tpu.fields.jfield import JField
from nova_tpu.ops import msm2, msm3

USE_PALLAS = os.environ.get("PROBE_PALLAS", "0") == "1"
if not USE_PALLAS:
    msm2._use_pallas = lambda: False
    msm3._use_pallas = lambda: False

n = int(os.environ.get("PROBE_N", "512"))
c = int(os.environ.get("PROBE_C", "8"))
rng = random.Random(1)
g = AffinePoint.generator(pallas)
bases, acc = [], g
for _ in range(n):
    bases.append(acc)
    acc = acc.add(g)
db = msm2.DeviceBases2(pallas, bases)
print(f"[{time.time()-t0:6.1f}s] db built (pallas={USE_PALLAS}, n={n}, c={c})", flush=True)

xT, yT, ynegT, finf = msm3._fixed3(db, c, n)
jax.block_until_ready((xT, yT, ynegT))
print(f"[{time.time()-t0:6.1f}s] fixed3 ready", flush=True)

ul = jnp.asarray(msm3._scalar_ulimbs(
    [rng.randrange(pallas.scalar.p) for _ in range(n)], n, c))
ul.block_until_ready()
print(f"[{time.time()-t0:6.1f}s] scalars on device", flush=True)

jf = JField(pallas.base)
fn = jax.jit(msm3._msm3_program, static_argnums=(0, 1))
t1 = time.time()
lowered = fn.lower(jf.spec.p, c, ul, xT, yT, ynegT, finf)
print(f"[{time.time()-t0:6.1f}s] LOWERED in {time.time()-t1:.1f}s "
      f"({len(lowered.as_text())/1e6:.1f} MB text)", flush=True)
t1 = time.time()
compiled = lowered.compile()
print(f"[{time.time()-t0:6.1f}s] COMPILED in {time.time()-t1:.1f}s", flush=True)
t1 = time.time()
out, flag = compiled(ul, xT, yT, ynegT, finf)
out = jax.device_get(out)
print(f"[{time.time()-t0:6.1f}s] EXECUTED in {time.time()-t1:.1f}s flag={int(jax.device_get(flag))}",
      flush=True)
t1 = time.time()
iters = 3
for _ in range(iters):
    out, flag = compiled(ul, xT, yT, ynegT, finf)
jax.block_until_ready(out)
print(f"[{time.time()-t0:6.1f}s] steady {(time.time()-t1)/iters*1e3:.1f} ms/call",
      flush=True)
