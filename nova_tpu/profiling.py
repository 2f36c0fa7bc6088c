"""Profiling hooks (SURVEY.md §5: the reference profiles via criterion +
pprof2 flamegraphs behind a feature flag; the TPU-native analog is
jax.profiler traces for the device path plus lightweight wall-clock phase
counters for the host path).

Usage:

    from nova_tpu import profiling

    with profiling.phases() as ph:
        with ph("witness"):
            ...
        with ph("commit"):
            ...
    print(ph.report())

    with profiling.device_trace("/tmp/jax-trace"):   # TensorBoard format
        prove_step(...)

Set NOVA_PROFILE=1 to make the built-in prover phase markers record into
a process-global collector (read it with `profiling.global_report()`);
set NOVA_MSM_PROF=1 for the native MSM engine's per-phase breakdown
(printed to stderr by the C++ kernel).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator


class PhaseCollector:
    """Accumulates named wall-clock phases; nestable and reentrant."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        return "\n".join(
            f"{name:24s} {tot * 1e3:9.1f} ms  x{self.counts[name]}"
            for name, tot in rows
        )

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


_GLOBAL = PhaseCollector()


def enabled() -> bool:
    return bool(os.environ.get("NOVA_PROFILE"))


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Prover-internal phase marker: records into the global collector
    when NOVA_PROFILE=1, otherwise free."""
    if not enabled():
        yield
        return
    with _GLOBAL(name):
        yield


@contextlib.contextmanager
def phases() -> Iterator[PhaseCollector]:
    """A fresh local collector, independent of NOVA_PROFILE. (Context
    form kept for symmetry with the collector's own `with ph(name)`
    usage; exiting the block has no side effects.)"""
    yield PhaseCollector()


def global_report() -> str:
    return _GLOBAL.report()


def global_reset() -> None:
    _GLOBAL.totals.clear()
    _GLOBAL.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace around a device-side region (view the result
    with TensorBoard or xprof; works on the TPU backend and on XLA:CPU)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
