"""XLA:CPU shard_map persistent-cache segfault: repro harness + findings.

Round 1 observed repeated segfaults inside the persistent compilation
cache's put/get_executable while (de)serializing the big shard_map
executables on XLA:CPU, and worked around them with subprocess isolation
(tests/test_parallel.py) plus a cache bypass for those programs
(nova_tpu/parallel._no_persistent_cache).

Round 2 investigation: this script force-enables the persistent cache
around the REAL sharded-MSM program (the guard is neutralized) and runs
it twice — once to serialize the executable, once to load it back. On
jax 0.9 / XLA:CPU with an 8-device virtual mesh at n=64 BOTH runs pass
cleanly, repeatedly. The crash therefore needs more than the program
itself: it reproduced only inside large long-lived processes (the full
pytest run) after many prior compilations, which points at allocator /
heap state in the serializer rather than the program structure. Keeping
the _no_persistent_cache guard (cheap: those programs re-compile in
seconds) until a jax upgrade lands; re-test by running this script twice
and then the full suite with the guard commented out.
"""
import os, sys
sys.path.insert(0, "/root/repo")
cache = "/tmp/xla_cache_repro3"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_COMPILATION_CACHE_DIR"] = cache
os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", cache)

import nova_tpu.parallel as par
# neutralize the guard so the real program hits the persistent cache
class _noop:
    def __enter__(self): return self
    def __exit__(self, *a): return False
par._no_persistent_cache = _noop

import random
from nova_tpu.curves.spec import pallas, AffinePoint
rng = random.Random(1)
n = 64
g = AffinePoint.generator(pallas)
bases, acc = [], g
for _ in range(n):
    bases.append(acc); acc = acc.add(g)
scalars = [rng.randrange(pallas.scalar.p) for _ in range(n)]
mesh = par.make_mesh(8)
r = par.msm_sharded(scalars, bases, mesh=mesh)
print("RESULT-OK", r.x % 1000, flush=True)
