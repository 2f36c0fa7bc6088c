"""Round-5 fold-step probe: per-phase wall time of RecursiveSNARK.prove_step
on the live chip, device-routed vs host-routed.

Usage: python perf/probe_r5_fold.py [device|host|both]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def run(route: str) -> None:
    if route == "host":
        # force host routing by raising the crossover above augmented size
        os.environ["NOVA_FOLD_DEVICE_THRESHOLD"] = str(1 << 30)
    os.environ["NOVA_PROFILE"] = "1"

    from nova_tpu.nova.circuit import TrivialCircuit
    from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK
    from nova_tpu.provider.engines import PallasEngine, VestaEngine
    from nova_tpu import profiling

    c = TrivialCircuit()
    t0 = time.perf_counter()
    pp = PublicParams.setup(PallasEngine, VestaEngine, c)
    print(f"[{route}] setup: {time.perf_counter()-t0:.1f}s", flush=True)
    rs = RecursiveSNARK.new(pp, c, [0])
    t0 = time.perf_counter()
    rs.prove_step(pp, c)  # i=0 -> 1 (no work)
    rs.prove_step(pp, c)  # first real step (compiles)
    print(f"[{route}] first 2 steps: {time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(3):
        rs.prove_step(pp, c)  # warm tapes/caches
    times = []
    profiling.global_reset()
    for _ in range(5):
        t0 = time.perf_counter()
        rs.prove_step(pp, c)
        times.append(time.perf_counter() - t0)
    print(f"[{route}] warm prove_step: min {min(times)*1e3:.1f} "
          f"avg {sum(times)/len(times)*1e3:.1f} ms", flush=True)
    print(profiling.global_report(), flush=True)
    rs.verify(pp, rs.i, [0])
    print(f"[{route}] verify OK", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("device", "both"):
        run("device")
    if which in ("host", "both"):
        # host needs a fresh process for the env to matter at import time;
        # re-exec when running "both"
        if which == "both":
            import subprocess

            subprocess.run([sys.executable, __file__, "host"], check=False)
        else:
            run("host")
