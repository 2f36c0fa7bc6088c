"""Standalone XLA TPU sort compile/exec matrix through the axon tunnel.

Each configuration runs in its own subprocess with a hard timeout, so a
hung compile costs its slot and nothing else. Maps the real constraint
behind the msm3 sortpack hangs: which (n, payload count, dtype,
stability) shapes compile at all, and how fast they run.

Usage: python perf/probe_sort_matrix.py [timeout_s]
"""

import subprocess
import sys
import time

CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

n = int(sys.argv[1]); np_ = int(sys.argv[2])
dt = sys.argv[3]; stable = sys.argv[4] == "1"
dtype = jnp.uint32 if dt == "u32" else jnp.int32

@jax.jit
def f(key, *pl):
    outs = jax.lax.sort(tuple([key] + list(pl)), num_keys=1,
                        is_stable=stable)
    return [o[:8] for o in outs]

key = jnp.asarray(np.random.randint(0, 1 << 12, n).astype(np.int32))
pls = [jnp.asarray(np.arange(n, dtype=np.uint32).view(np.uint32) + i)
       .astype(dtype) for i in range(np_)]
t0 = time.perf_counter()
r = jax.device_get(f(key, *pls))
t1 = time.perf_counter()
for _ in range(3):
    r = jax.device_get(f(key, *pls))
t2 = time.perf_counter()
print("COMPILE %.1f WARM %.1f" % (t1 - t0, (t2 - t1) / 3 * 1e3), flush=True)
"""


def main(tmo: float) -> None:
    n = 1 << 20
    for np_ in (2, 4, 8):
        for dt in ("u32",):
            for stable in ("0", "1"):
                t0 = time.perf_counter()
                try:
                    r = subprocess.run(
                        [sys.executable, "-c", CHILD, str(n), str(np_),
                         dt, stable],
                        capture_output=True, text=True, timeout=tmo,
                    )
                    out = [l for l in r.stdout.splitlines() if "COMPILE" in l]
                    msg = out[0] if out else f"rc={r.returncode}"
                except subprocess.TimeoutExpired:
                    msg = f"TIMEOUT >{tmo:.0f}s"
                print(
                    f"n=2^20 payloads={np_} {dt} stable={stable}: {msg} "
                    f"(wall {time.perf_counter()-t0:.0f}s)",
                    flush=True,
                )


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 240.0)
