"""Multi-chip sharding: mesh construction + sharded MSM / fold / sumcheck
(SURVEY.md §2.10: the reference is single-process rayon; this module is the
TPU-native distributed analog over a jax.sharding.Mesh).

Decomposition:
- MSM: points shard on the 'pts' axis; each device runs the full local
  Pippenger (sort + segmented combine, windows vmapped) giving a local
  accumulator; accumulators reduce with a log-tree of point-adds via
  all_gather over ICI. Linear scaling: per-device work is N/D point-adds,
  the reduction is log(D) single-point adds.
- Elementwise folds / cross-term T: pure data-parallel on the vector axis,
  no communication.
- Sumcheck round evaluation: tables shard on the vector axis; the three
  round sums (s(0), leading coeff, s(-1)) are per-device partial field sums
  reduced by all_gather + modular add (a psum cannot carry-propagate
  256-bit limbs, so the reduction is an explicit gather + field add over
  the tiny (D, 16) array).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.4.35 exposes shard_map at top level
    from jax import shard_map as _sm  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm


def _shard_map(f, mesh, in_specs, out_specs):
    # check_vma=False: replicated outputs here come from identical
    # post-all_gather computations on every device, which the varying-axes
    # checker cannot infer.
    try:
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax: check_rep
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)

from nova_tpu.curves.jpoints import xyzz_add, xyzz_double, xyzz_zero
from nova_tpu.curves.spec import AffinePoint, CurveSpec
from nova_tpu.fields.jfield import JField
from nova_tpu.fields.spec import NUM_LIMBS
from nova_tpu.ops.msm import (
    _limbs16_to_int,
    _window_bucket_sum_body,
    digits_for_windows,
    scalars_to_limbs16,
)


class _no_persistent_cache:
    """Disable the persistent compilation cache around the big shard_map
    programs: XLA:CPU's executable (de)serialization segfaults on them
    (observed repeatedly in put/get_executable during the test suite), and
    they are the only programs large enough to trigger it."""

    def __enter__(self):
        from jax._src import config as _jc

        self._cm = _jc.enable_compilation_cache(False)
        self._cm.__enter__()
        return self

    def __exit__(self, *exc):
        return self._cm.__exit__(*exc)


_ACTIVE_MESH = None


class use_mesh:
    """Context manager marking a device mesh as the active commit target:
    while active, CommitmentEngine.commit routes MSMs through msm_sharded
    on this mesh (the multi-chip prover path; SURVEY.md §2.10)."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self._prev = None

    def __enter__(self):
        global _ACTIVE_MESH
        self._prev = _ACTIVE_MESH
        _ACTIVE_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self._prev
        return False


def current_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "pts") -> Mesh:
    """1-D device mesh over the first n devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


# ---------------------------------------------------------------------------
# sharded MSM
# ---------------------------------------------------------------------------

def _pvary(tree, axis: str):
    """Mark a shard_map-internal constant as varying over `axis` (needed for
    scan carries whose inputs are built inside the mapped body)."""
    def one(x):
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, (axis,), to="varying")
        return jax.lax.pvary(x, (axis,))  # pragma: no cover

    return jax.tree.map(one, tree)


def _tree_reduce_points(jf, gathered: dict) -> dict:
    """Fold a (D, 16)-per-coord stack of XYZZ points into one (16,) point."""
    d = gathered["x"].shape[0]
    acc = {k: v[0] for k, v in gathered.items()}
    for i in range(1, d):
        acc = xyzz_add(jf, acc, {k: v[i] for k, v in gathered.items()})
    return acc


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _msm_sharded_kernel(field_p: int, c: int, rounds: int, mesh, d_all, bx, by, binf):
    """digits (W, N), bases (N, 16): N shards over 'pts'. Returns from_mont
    (x, y, zz, zzz) each (16,), replicated."""
    jf = JField._instances[field_p]

    def body(d_loc, bx_loc, by_loc, binf_loc):
        def one_window(d):
            return _window_bucket_sum_body(jf, c, rounds, d, bx_loc, by_loc, binf_loc)

        window_pts = jax.vmap(one_window)(d_loc)
        rev = {k: v[::-1] for k, v in window_pts.items()}
        acc0 = _pvary(xyzz_zero(jf, jnp.zeros((NUM_LIMBS,), jnp.uint32)), "pts")

        def horner(acc, ws):
            def dbl(_, a):
                return xyzz_double(jf, a)

            acc = jax.lax.fori_loop(0, c, dbl, acc)
            return xyzz_add(jf, acc, ws), None

        local, _ = jax.lax.scan(horner, acc0, rev)
        gathered = {
            k: jax.lax.all_gather(v, "pts", axis=0) for k, v in local.items()
        }
        return _tree_reduce_points(jf, gathered)

    out = _shard_map(
        body,
        mesh,
        in_specs=(P(None, "pts"), P("pts"), P("pts"), P("pts")),
        out_specs=P(),
    )(d_all, bx, by, binf)
    res = {k: jf.from_mont(v.reshape(1, NUM_LIMBS))[0] for k, v in out.items()}
    return res["x"], res["y"], res["zz"], res["zzz"]


def msm_sharded(
    scalars: Sequence[int],
    bases: Sequence[AffinePoint],
    mesh: Mesh,
    window: int = 8,
) -> AffinePoint:
    """Pod-sharded MSM entry point (host ints in/out)."""
    curve = bases[0].curve
    jf = JField(curve.base)
    n_dev = mesh.devices.size
    n = len(scalars)
    n_pad = n_dev
    while n_pad < n:
        n_pad *= 2

    limbs = np.zeros((n_pad, 16), dtype=np.uint32)
    limbs[:n] = scalars_to_limbs16(list(scalars))
    num_bits = curve.scalar.num_bits
    num_windows = (num_bits + window - 1) // window
    digits = digits_for_windows(limbs, window, num_windows)
    rounds = max(2, (n_pad // n_dev).bit_length() - 1)

    xs = jf.pack([p.x for p in bases] + [0] * (n_pad - n))
    ys = jf.pack([p.y for p in bases] + [0] * (n_pad - n))
    infs = np.array([p.infinity for p in bases] + [True] * (n_pad - n), dtype=bool)
    to_mont = jf.jit("to_mont")
    bx = to_mont(jnp.asarray(xs))
    by = to_mont(jnp.asarray(ys))

    with _no_persistent_cache():
        x, y, zz, zzz = _msm_sharded_kernel(
            jf.spec.p, window, rounds, mesh, jnp.asarray(digits), bx, by,
            jnp.asarray(infs)
        )
    xv = _limbs16_to_int(np.asarray(jax.device_get(x)))
    yv = _limbs16_to_int(np.asarray(jax.device_get(y)))
    zzv = _limbs16_to_int(np.asarray(jax.device_get(zz)))
    zzzv = _limbs16_to_int(np.asarray(jax.device_get(zzz)))
    f = curve.base
    if zzv == 0:
        return AffinePoint.identity(curve)
    return AffinePoint(curve, f.mul(xv, f.inv(zzv)), f.mul(yv, f.inv(zzzv)))


# ---------------------------------------------------------------------------
# sharded fold step (the "training step" analog for the dryrun)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1))
def _fold_elementwise_kernel(field_p: int, mesh, az, bz, cz, e_vec, w1, w2,
                             u_bcast, r_bcast):
    """Elementwise half of the sharded fold step (no communication except
    the sumcheck-round reduction):
      T = Az*Bz - u*Cz - E ; W' = W1 + r*W2 ; E' = E + r*T
    plus one sumcheck-style round reduction over T (partial field sums
    all-gathered and field-added) to exercise the collective path.
    The commitment to T runs separately through _msm_sharded_kernel, which
    keeps each compiled executable small (a single fused kernel crashed
    the XLA:CPU executable serializer) and shares the MSM compile with the
    standalone sharded-MSM path.
    """
    jf = JField._instances[field_p]

    def body(az, bz, cz, e_vec, w1, w2, u_b, r_b):
        u_b = jnp.broadcast_to(u_b, cz.shape)
        r_b = jnp.broadcast_to(r_b, cz.shape)
        t_vec = jf.sub(jf.sub(jf.mont_mul(az, bz), jf.mont_mul(u_b, cz)), e_vec)
        w_new = jf.add(w1, jf.mont_mul(r_b, w2))
        e_new = jf.add(e_vec, jf.mont_mul(r_b, t_vec))

        half = t_vec.shape[0] // 2
        lo, hi = t_vec[:half], t_vec[half:]
        s0_part = _field_sum(jf, jf.mont_mul(lo, lo))
        sinf_part = _field_sum(jf, jf.mont_mul(jf.sub(hi, lo), jf.sub(hi, lo)))
        s0_all = jax.lax.all_gather(s0_part, "pts", axis=0)
        sinf_all = jax.lax.all_gather(sinf_part, "pts", axis=0)
        s0 = _field_sum(jf, s0_all)
        sinf = _field_sum(jf, sinf_all)
        return t_vec, w_new, e_new, s0, sinf

    shard = P("pts")
    rep = P()
    return _shard_map(
        body,
        mesh,
        in_specs=(shard, shard, shard, shard, shard, shard, rep, rep),
        out_specs=(shard, shard, shard, rep, rep),
    )(az, bz, cz, e_vec, w1, w2, u_bcast, r_bcast)


def _field_sum(jf, arr):
    """Tree-sum of (N, 16) Montgomery field elements -> (16,)."""
    v = arr
    while v.shape[0] > 1:
        n = v.shape[0]
        if n % 2 == 1:
            pad = jnp.zeros((1, v.shape[1]), v.dtype)
            v = jnp.concatenate([v, pad], axis=0)
            n += 1
        v = jf.add(v[: n // 2], v[n // 2:])
    return v[0]


def run_sharded_fold_step(mesh: Mesh, field, n: int, seed: int = 7):
    """Drive _fold_step_kernel once on random data over `mesh`; used by
    __graft_entry__.dryrun_multichip and the multi-chip tests. Returns the
    replicated commitment x-coordinate array (device)."""
    import random

    from nova_tpu.curves.spec import AffinePoint as AP

    rng = random.Random(seed)
    jf = JField(field.spec if hasattr(field, "spec") else field)
    spec = jf.spec
    p = spec.p

    vec = lambda: [rng.randrange(p) for _ in range(n)]
    to_mont = jf.jit("to_mont")
    pack = lambda vals: to_mont(jnp.asarray(jf.pack(vals)))

    az, bz, cz = pack(vec()), pack(vec()), pack(vec())
    e_vec, w1, w2 = pack(vec()), pack(vec()), pack(vec())
    u_b = jf.const_mont(rng.randrange(p), az[:1])
    r_b = jf.const_mont(rng.randrange(p), az[:1])

    # digits for a fake T-commit (host precomputation mirrors real path)
    scalars = vec()
    c = 8
    from nova_tpu.curves.spec import pallas as _default_curve

    curve = _pick_curve_for_field(spec)
    num_windows = (curve.scalar.num_bits + c - 1) // c
    limbs = scalars_to_limbs16(scalars)
    digits = digits_for_windows(limbs, c, num_windows)
    rounds = max(2, (n // mesh.devices.size).bit_length() - 1)

    g = AP.generator(curve)
    bases = []
    acc = g
    for _ in range(n):
        bases.append(acc)
        acc = acc.double()
    bx = to_mont(jnp.asarray(jf.pack([pt.x for pt in bases])))
    by = to_mont(jnp.asarray(jf.pack([pt.y for pt in bases])))
    binf = jnp.asarray(np.zeros(n, dtype=bool))

    with _no_persistent_cache():
        t_vec, w_new, e_new, s0, sinf = _fold_elementwise_kernel(
            spec.p, mesh, az, bz, cz, e_vec, w1, w2, u_b, r_b
        )
        comm = _msm_sharded_kernel(
            spec.p, c, rounds, mesh, jnp.asarray(digits), bx, by, binf
        )
    jax.block_until_ready((t_vec, w_new, e_new, s0, sinf, comm))
    return comm[0]


def _pick_curve_for_field(spec):
    """Find a registered curve whose base field is `spec`."""
    from nova_tpu.curves.spec import bn254, grumpkin, pallas, secp256k1, secq256k1, vesta

    for c in (pallas, vesta, bn254, grumpkin, secp256k1, secq256k1):
        if c.base.p == spec.p:
            return c
    raise ValueError("no curve over this base field")
