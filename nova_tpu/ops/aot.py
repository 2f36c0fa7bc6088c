"""Ahead-of-time executable cache: kill the per-process retrace tax.

The persistent XLA compilation cache only skips the *compile*: every new
process still pays a full Python trace + lowering of each jitted program
to even compute the cache key — measured at 2-4 minutes per production
MSM program on this 1-core host (the unrolled 16-limb Montgomery
arithmetic is O(10^5-10^6) primitive binds). The reference has no analog
problem (Rust is compiled once); the TPU-native analog of its "compile
the circuit once" discipline is serializing the *compiled executable*
itself.

`jax.experimental.serialize_executable` round-trips a lowered+compiled
jit program through bytes; deserialize_and_load takes ~0.1 s and the
loaded callable dispatches with zero retrace. This module wraps that in
a content-addressed disk cache:

  key = sha256(jax version, backend + device kind, host fingerprint,
               digest of the nova_tpu source tree, caller-supplied static
               key, arg shapes/dtypes)

Used by the hot entry points (ops/msm2, ops/msm3) so a fresh process
(e.g. the driver's bench.py watchdog subprocess) reaches steady state in
seconds instead of minutes. NOVA_TPU_AOT=0 disables; failures fall back
to the plain jit call path silently (the cache is an accelerator, never
a correctness dependency).
"""

from __future__ import annotations

import functools
import hashlib
import os
import pickle
from typing import Any, Callable, Optional

import jax

_MEM: dict = {}
_DISABLED_REASON: Optional[str] = None


def _enabled() -> bool:
    mode = os.environ.get("NOVA_TPU_AOT", "1")
    if mode == "0":
        return False
    if mode == "force":
        return True
    # default: TPU backend only — XLA:CPU executable (de)serialization has
    # segfaulted on large programs (see parallel._no_persistent_cache);
    # the per-process retrace tax this cache kills is a TPU-path problem
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.lru_cache(maxsize=1)
def _src_digest() -> str:
    """Digest of the kernel-defining source files: a code edit must
    invalidate every AOT entry (a stale executable would silently compute
    the OLD math)."""
    h = hashlib.sha256()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for sub in ("ops", "fields", "curves", "parallel"):
        d = os.path.join(root, sub)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if name.endswith(".py"):
                with open(os.path.join(d, name), "rb") as fh:
                    h.update(name.encode())
                    h.update(fh.read())
    return h.hexdigest()[:16]


@functools.lru_cache(maxsize=1)
def _env_key() -> str:
    from nova_tpu import _host_fingerprint

    dev = jax.devices()[0]
    return "|".join(
        (
            jax.__version__,
            jax.default_backend(),
            getattr(dev, "device_kind", "?"),
            str(jax.device_count()),
            _host_fingerprint(),
        )
    )


@functools.lru_cache(maxsize=1)
def _cache_dir() -> str:
    d = os.environ.get("NOVA_TPU_AOT_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "nova_tpu_aot"
    )
    os.makedirs(d, exist_ok=True)
    return d


def _arg_sig(args) -> str:
    parts = []
    for a in jax.tree_util.tree_leaves(args):
        if hasattr(a, "shape") and hasattr(a, "dtype"):
            parts.append(f"{tuple(a.shape)}:{a.dtype}")
        else:
            parts.append(repr(a))
    return ";".join(parts)


def aot_call(
    jitfn: Callable,
    args: tuple,
    static_key: Any = (),
    label: str = "prog",
):
    """Call `jitfn(*args)` through the AOT executable cache.

    `jitfn` must be a jax.jit-wrapped function; `args` its full argument
    tuple (including static args). The compiled executable is keyed on
    shapes/dtypes + `static_key` + the source-tree digest and reused
    across processes with zero retrace. Any failure (serialization
    unsupported, topology mismatch, version skew) falls back to the
    plain `jitfn(*args)` call."""
    global _DISABLED_REASON
    if not _enabled() or _DISABLED_REASON is not None:
        return jitfn(*args)
    try:
        key_raw = "|".join(
            (_env_key(), _src_digest(), label, repr(static_key), _arg_sig(args))
        )
    except Exception as e:  # pragma: no cover - env probing failed
        _DISABLED_REASON = f"keying failed: {e}"
        return jitfn(*args)
    key = hashlib.sha256(key_raw.encode()).hexdigest()[:32]

    exe = _MEM.get(key)
    if exe is None:
        path = os.path.join(_cache_dir(), f"{label}-{key}.aot")
        exe = _load(path)
        if exe is None:
            exe = _compile_and_store(jitfn, args, path)
        if exe is None:  # fall back for this call; don't retry the disk
            _MEM[key] = False
        else:
            _MEM[key] = exe
    if exe is False or exe is None:
        return jitfn(*args)
    try:
        # executables take only the non-static array args
        arr_args = [
            a
            for a in args
            if hasattr(a, "shape") and hasattr(a, "dtype") or _is_arraylike(a)
        ]
        return exe(*arr_args)
    except Exception:
        _MEM[key] = False
        return jitfn(*args)


def _is_arraylike(a) -> bool:
    import numpy as np

    return isinstance(a, (jax.Array, np.ndarray))


def _load(path: str):
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as fh:
            blob = pickle.load(fh)
        return se.deserialize_and_load(*blob)
    except Exception:
        try:
            os.unlink(path)  # corrupt/stale entry
        except OSError:
            pass
        return None


def _compile_and_store(jitfn, args, path: str):
    try:
        from jax.experimental import serialize_executable as se

        comp = jitfn.lower(*args).compile()
        blob = se.serialize(comp)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump(blob, fh)
        os.replace(tmp, path)
        return comp
    except Exception:
        return None
