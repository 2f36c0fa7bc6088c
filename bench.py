"""Headline benchmark. Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Primary metric: MSM throughput (points/sec/chip), 2^16 points, Pallas
curve, full 255-bit scalars, through the fixed-base engine the Pedersen
commitment path uses (ops/msm2). Baseline: the only MSM timing the
reference pins down in-repo is halo2curves `msm_best` at 192 ms for 2^20
points (64-bit scalars) on the reference dev machine
(/root/reference/src/provider/msm.rs:493-495), i.e. 5.46M points/sec.
vs_baseline = ours / 5.46e6.

`extra` carries the other BASELINE.json metrics measured on this chip:
  - fold_step_ms: RecursiveSNARK.prove_step wall time (trivial step
    circuit, Pallas/Vesta augmented pair, ~10k constraints each)
  - compressed_snark_prove_s: CompressedSNARK.prove (snark/snark + IPA)
    at the augmented-circuit size

Budget discipline (round-4 redesign after BENCH_r03's rc=124/no-output):
  - NOVA_BENCH_TOTAL_BUDGET (default 1200 s) is a hard wall-clock
    deadline; every stage gets a slice of what remains and stages are
    skipped when the remainder is low.
  - The JSON line is ALWAYS emitted: best-so-far state is flushed from a
    SIGTERM/SIGINT handler and from `finally`, so an external `timeout`
    can no longer turn a working result into an empty artifact.
  - A fast host-native MSM runs FIRST so a real number exists within the
    first ~minute; device engines then upgrade it.
  - Engine order (round 5): msm3m first — the production commit path
    (device-resident Montgomery scalars through the column-serial
    engine; 811k pts/s @2^16 measured) — then msm2 (259k), then msm1.
    NOVA_BENCH_ENGINES overrides. All msm3 phases are split programs
    cached by the AOT executable cache, so warm processes skip the
    multi-minute retrace+compile.
Set NOVA_BENCH_FAST=1 to emit only the MSM metric (used while iterating).
"""

from __future__ import annotations

import json
import os
import random
import signal
import subprocess
import sys
import time

_START = time.monotonic()
_TOTAL = float(os.environ.get("NOVA_BENCH_TOTAL_BUDGET", "1200"))
_BASELINE = (1 << 20) / 0.192  # reference msm_best datum: 5.46M pts/s


def _remaining() -> float:
    return _TOTAL - (time.monotonic() - _START)


# ---------------------------------------------------------------- emission

_state: dict = {"value": None, "backend": None, "extra": {}}
_emitted = False
_current_proc: subprocess.Popen | None = None


def _emit() -> None:
    """Print the best-so-far JSON line exactly once. Signal-safe: uses
    os.write and mutates only a bool flag."""
    global _emitted
    if _emitted:
        return
    _emitted = True
    extra = dict(_state["extra"])
    extra["backend"] = _state["backend"] or "none"
    if _state["value"] is None:
        line = {
            "metric": "msm_points_per_sec_per_chip_2e16",
            "value": 0.0,
            "unit": "points/sec",
            "vs_baseline": 0.0,
            "extra": {**extra, "error": "no stage completed in budget"},
        }
    else:
        line = {
            "metric": "msm_points_per_sec_per_chip_2e16",
            "value": round(_state["value"], 1),
            "unit": "points/sec",
            "vs_baseline": round(_state["value"] / _BASELINE, 4),
            "extra": extra,
        }
    os.write(1, (json.dumps(line) + "\n").encode())


def _on_signal(signum, frame):  # noqa: ANN001 - signal signature
    _emit()
    p = _current_proc
    if p is not None and p.poll() is None:
        try:
            p.kill()
        except OSError:
            pass
    # distinct exit status: a signal-interrupted partial run must not
    # look like a clean completion to wrappers that check rc (ADVICE r4);
    # the JSON line was already flushed above so the artifact survives
    os._exit(128 + int(signum))


# ----------------------------------------------------------- measurements


def bench_msm(engine: str = "msm2") -> float:
    """Steady-state device MSM throughput at 2^16, `engine` in
    {msm3, msm2, msm1}. Called in a watchdog subprocess by main(): the
    v2/v3 engines have large first-compile programs whose upload/compile
    over the tunnel can stall far beyond any useful bench window."""
    from nova_tpu.curves.spec import pallas
    from nova_tpu.provider.pedersen import CommitmentEngine

    n = 1 << 16
    rng = random.Random(0xBE2C)
    # via the engine so the hash-to-curve generators disk-cache across runs
    bases = CommitmentEngine.setup(pallas, b"bench-msm", n - 1).ck[:n]
    scalars = [rng.randrange(pallas.scalar.p) for _ in range(n)]

    if engine == "msm3m":
        # the production commit path: scalars arrive as a device-resident
        # Montgomery limb array (an FVec's .m, what pedersen.commit feeds
        # msm_device3_mont) — no per-call host conversion or H2D
        import jax

        from nova_tpu.fields.jfield import JField
        from nova_tpu.ops.fvec import FVec
        from nova_tpu.ops.msm2 import DeviceBases2
        from nova_tpu.ops.msm3 import msm_device3_mont

        db = DeviceBases2(pallas, bases)
        marr = FVec.from_ints(JField(pallas.scalar), scalars).m
        jax.block_until_ready(marr)
        run = lambda: msm_device3_mont(marr, db)

        def run_pipelined():
            # the batch_commit pattern: K independent MSMs dispatched
            # before the first collect (Spark oracle commits do exactly
            # this); hides the tunnel's per-result round trip
            from nova_tpu.ops.msm3 import msm_device3_mont_batch

            K = 4
            msm_device3_mont_batch([marr] * K, db)
            t0 = time.perf_counter()
            msm_device3_mont_batch([marr] * K, db)
            return K * n / (time.perf_counter() - t0)
    elif engine == "msm3":
        from nova_tpu.ops.msm2 import DeviceBases2
        from nova_tpu.ops.msm3 import msm_device3

        db = DeviceBases2(pallas, bases)
        run = lambda: msm_device3(scalars, device_bases=db)
    elif engine == "msm2":
        from nova_tpu.ops.msm2 import DeviceBases2, msm_device2

        db = DeviceBases2(pallas, bases)
        run = lambda: msm_device2(scalars, device_bases=db, reuse=True)
    else:
        from nova_tpu.ops.msm import DeviceBases, msm_device

        db = DeviceBases(pallas, bases)
        run = lambda: msm_device(scalars, device_bases=db)

    run()  # compile + precompute
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    if engine == "msm3m":
        return n / dt, run_pipelined()
    return n / dt


def bench_msm_host() -> float:
    """Host-native MSM fallback/floor (same workload as bench_msm)."""
    from nova_tpu.curves.spec import pallas
    from nova_tpu.provider.pedersen import CommitmentEngine
    from nova_tpu import native

    n = 1 << 16
    rng = random.Random(0xBE2C)
    ck = CommitmentEngine.setup(pallas, b"bench-msm", n - 1)
    arrays = ck.host_arrays(n)
    scalars = [rng.randrange(pallas.scalar.p) for _ in range(n)]
    sl = native.ints_to_limbs(scalars)
    native.msm_cached(pallas, arrays, sl)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        native.msm_cached(pallas, arrays, sl)
    return n / ((time.perf_counter() - t0) / iters)


def bench_fold_and_compress():
    from nova_tpu.provider.engines import PallasEngine, VestaEngine
    from nova_tpu.nova.circuit import TrivialCircuit
    from nova_tpu.nova.compressed import CompressedSNARK
    from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK

    c = TrivialCircuit()
    pp = PublicParams.setup(PallasEngine, VestaEngine, c)
    rs = RecursiveSNARK.new(pp, c, [0])
    rs.prove_step(pp, c)  # base-case bump
    rs.prove_step(pp, c)  # warm
    rs.prove_step(pp, c)  # steady shapes appear at step 3 (folded-W sizes);
    # this one still pays their first jit compiles
    t0 = time.perf_counter()
    rs.prove_step(pp, c)
    fold_ms = (time.perf_counter() - t0) * 1e3

    pk, vk = CompressedSNARK.setup(pp)
    t0 = time.perf_counter()
    proof = CompressedSNARK.prove(pp, pk, rs)
    compress_s = time.perf_counter() - t0
    proof.verify(vk, rs.i, [0])
    return fold_ms, compress_s


# ------------------------------------------------------ watchdog plumbing


def _run_stage(code: str, timeout_s: float, tag: str, env_extra: dict | None = None):
    """Run `code` in a worker process with a hard timeout; return the
    payload printed on the line starting with `tag `, or None. A wedged
    tunnel or a pathological device compile costs one slice, not the
    whole bench."""
    global _current_proc
    if timeout_s <= 5:
        return None
    env = {**os.environ, **(env_extra or {})}
    full = (
        "import sys; sys.path.insert(0, %r)\n" % os.path.dirname(os.path.abspath(__file__))
    ) + code
    try:
        _current_proc = subprocess.Popen(
            [sys.executable, "-u", "-c", full],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        out, _ = _current_proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        _current_proc.kill()
        _current_proc.communicate()
        return None
    finally:
        p, _current_proc = _current_proc, None
        if p is not None and p.poll() is None:
            p.kill()
    if p.returncode != 0:
        return None
    for line in out.splitlines():
        if line.startswith(tag + " "):
            return line[len(tag) + 1 :].split()
    return None


def _device_available(timeout_s: float) -> bool:
    """Probe the accelerator in a subprocess so a wedged tunnel can't hang
    the whole bench run."""
    got = _run_stage(
        "from nova_tpu._env import accelerator_available\n"
        "print('DEV', int(accelerator_available(timeout_s=%r)), flush=True)\n"
        % max(timeout_s - 10, 5),
        timeout_s,
        "DEV",
    )
    return bool(got and got[0] == "1")


def main() -> None:
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    try:
        _main_guarded()
    finally:
        _emit()


def _main_guarded() -> None:
    # Stage 1 — host-native floor: a real number exists within ~a minute.
    got = _run_stage(
        # env var alone does not beat the axon plugin; pin the config too
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import bench; print('PTS', bench.bench_msm_host(), flush=True)\n",
        min(300.0, _remaining() * 0.3),
        "PTS",
        {"JAX_PLATFORMS": "cpu"},
    )
    if got:
        _state["value"] = float(got[0])
        _state["backend"] = "host-fallback (device not yet tried)"

    # Stage 2 — device probe + engines, in completion-probability order.
    device_ok = _device_available(min(180.0, max(_remaining() - 120, 10)))
    if device_ok:
        order = os.environ.get(
            "NOVA_BENCH_ENGINES", "msm3m,msm2,msm1"
        ).split(",")
        tried = 0
        for eng in (e.strip() for e in order if e.strip()):
            tried += 1
            slice_s = min(
                float(os.environ.get("NOVA_BENCH_ENGINE_TIMEOUT", "900")),
                _remaining() - 30,
            )
            env_extra = {}
            got = _run_stage(
                "import bench\n"
                "r = bench.bench_msm(%r)\n"
                "print('PTS', *(r if isinstance(r, tuple) else (r,)),"
                " flush=True)\n" % eng,
                slice_s,
                "PTS",
                env_extra,
            )
            if got:
                # "upgrade" semantics: keep whichever number is higher —
                # a device engine slower than the host native path must
                # not replace the better measurement (ADVICE r4)
                val = float(got[0])
                if len(got) > 1:
                    # pipelined batch-commit throughput (same chip, the
                    # Spark batch_commit dispatch pattern)
                    _state["extra"]["msm_pipelined_pts_per_s"] = round(
                        float(got[1]), 1
                    )
                if _state["value"] is None or val > _state["value"]:
                    _state["value"] = val
                    _state["backend"] = f"tpu ({eng})"
                else:
                    _state["extra"][f"tpu_{eng}_pts_per_s"] = round(val, 1)
                break
        else:
            if _state["backend"]:
                _state["backend"] = (
                    "host-fallback (device engines stalled/failed)"
                    if tried
                    else "host-fallback (no device engine configured)"
                )
    elif _state["backend"]:
        _state["backend"] = "host-fallback (accelerator unavailable)"

    # Stage 3 — fold/compress extras, only with comfortable headroom.
    if os.environ.get("NOVA_BENCH_FAST") or _remaining() < 240:
        return
    code = (
        "import bench\n"
        "f, c = bench.bench_fold_and_compress()\n"
        "print('FC', f, c, flush=True)\n"
    )
    cpu_pin = "import jax; jax.config.update('jax_platforms', 'cpu')\n" + code
    for env_extra, stage_code in (({}, code), ({"JAX_PLATFORMS": "cpu"}, cpu_pin)):
        if not device_ok and not env_extra:
            continue  # no accelerator: go straight to the pinned-CPU run
        got = _run_stage(stage_code, _remaining() - 60, "FC", env_extra)
        if got:
            _state["extra"]["fold_step_ms"] = round(float(got[0]), 1)
            _state["extra"]["compressed_snark_prove_s"] = round(float(got[1]), 2)
            if env_extra:
                _state["extra"]["fold_backend"] = "cpu-fallback"
            return
        if _remaining() < 120:
            break
    _state["extra"]["fold_error"] = "fold/compress bench stalled or out of budget"


if __name__ == "__main__":
    main()
