"""Shared harness for the bench grids (the reference ships six criterion
harnesses under benches/; these are their grid-for-grid analogs, emitting
one JSON line per configuration). Run any bench as

    python benches/<name>.py [--sizes 14,16] [--quick]

On a CPU-only session the device MSM engines are skipped automatically;
the host-native engines still exercise the same code paths the prover
uses below the device-dispatch thresholds.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(bench: str, config: str, seconds: float, extra=None) -> None:
    row = {"bench": bench, "config": config, "time_s": round(seconds, 4)}
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)


def timeit(fn, iters: int = 1) -> float:
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def parse_args(default_sizes):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default=None,
                    help="comma-separated log2 sizes")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes = default_sizes[:1] if args.quick else default_sizes
    return sizes, args


def rng(seed: int = 0xBE2C) -> random.Random:
    return random.Random(seed)


def force_cpu_if_no_accel() -> None:
    """Pin jax to CPU when no accelerator responds (a wedged tunnel must
    not hang a bench)."""
    from nova_tpu._env import apply_platform_env

    apply_platform_env()
