"""Gather/permutation formulation shootout on the axon TPU.

Measures warm dispatch+fetch wall for moving a (n, 32)-u32 point table
into sorted order by a permutation, under different formulations:
  limbs1d  — 32 independent 1-D gathers on (n,) limb columns (no
             transpose anywhere; the layout the msm3 kernels consume)
  rows     — one (n, 32) row gather (no transpose)
  rowsT    — row gather + .T (what sortpack v2 did; transpose with
             minor dim 32 suspected slow)
  sortmove — (rank, limb) 2-operand sorts per limb (sort as data mover)
Usage: python perf/probe_gather.py [lg]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def timeit(f, iters=3):
    import jax

    jax.device_get(f())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.device_get(f())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(lg: int) -> None:
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    n = 1 << lg
    rng = np.random.default_rng(1)
    perm = rng.permutation(n).astype(np.int32)
    cols = [jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
            for _ in range(32)]
    rows = jnp.stack(cols, axis=1)  # (n, 32)
    sidx = jnp.asarray(perm)
    rank = jnp.asarray(np.argsort(perm).astype(np.int32))

    @jax.jit
    def limbs1d(sidx, *cols):
        return [c[sidx][:8] for c in cols]

    @jax.jit
    def limbs1d_full(sidx, *cols):
        return jnp.stack([c[sidx] for c in cols])[:, :8]

    @jax.jit
    def rowg(sidx, rows):
        return rows[sidx][:8]

    @jax.jit
    def rowgT(sidx, rows):
        return rows[sidx].T[:, :8]

    @jax.jit
    def sortmove(rank, *cols):
        outs = [
            jax.lax.sort((rank, c), num_keys=1, is_stable=False)[1]
            for c in cols
        ]
        return jnp.stack(outs)[:, :8]

    mb = n * 32 * 4 / 1e6
    for name, f in (
        ("limbs1d", lambda: limbs1d(sidx, *cols)),
        ("limbs1d_full", lambda: limbs1d_full(sidx, *cols)),
        ("rows", lambda: rowg(sidx, rows)),
        ("rowsT", lambda: rowgT(sidx, rows)),
        ("sortmove", lambda: sortmove(rank, *cols)),
    ):
        try:
            t = timeit(f)
            print(f"{name}: {t*1e3:.1f} ms = {mb/t:.1f} MB/s-effective",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
