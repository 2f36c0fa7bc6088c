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
from nova_tpu.ops.msm import _limbs16_to_int


class _no_persistent_cache:
    """Round-4 guard, now DEFAULT-OFF: the persistent compilation cache
    used to be disabled around the big shard_map programs because
    XLA:CPU's executable (de)serialization segfaulted on them (round-1/2
    jax). Round 5 re-tested on jax 0.9 (tests/test_parallel.py twice,
    NOVA_TEST_SLOW=1, cache ON: 6+6 passed, no segfault; second run
    953 s -> 324 s from the cache hits), so shard_map programs now cache
    like everything else — this is what makes the driver's
    dryrun_multichip compile one-time instead of per-run.

    NOVA_TPU_SHARDMAP_CACHE=0 restores the old bypass if the crash ever
    reappears (perf/repro_xla_cpu_cache.py is the repro harness)."""

    def __enter__(self):
        import os

        if os.environ.get("NOVA_TPU_SHARDMAP_CACHE") != "0":
            self._cm = None
            return self
        from jax._src import config as _jc

        self._cm = _jc.enable_compilation_cache(False)
        self._cm.__enter__()
        return self

    def __exit__(self, *exc):
        if self._cm is None:
            return False
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


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _msm3_sharded_kernel(field_p: int, c: int, mesh, ulimbs, xTw, yTw, ynegTw, finfw):
    """Sharded column-serial MSM (ops/msm3): scalars' offset limbs
    (n_pad, L) and window-shifted bases (NL, W, n_pad) shard over 'pts' on
    the points axis; each device sorts + accumulates its local block with
    the complete add formulas, and the per-device XYZZ accumulators reduce
    by all_gather + log-tree point adds. Returns from_mont (x, y, zz, zzz)
    each (16,), replicated."""
    from nova_tpu.ops.msm3 import _msm3_core, _num_windows, offset_digits_device

    jf = JField._instances[field_p]
    W = _num_windows(c)

    def body(ul, xT, yT, ynegT, finf):
        n_loc = ul.shape[0]
        d = offset_digits_device(ul, c).reshape(W * n_loc)
        s, _ = _msm3_core(
            jf,
            d,
            xT.reshape(NUM_LIMBS, W * n_loc),
            yT.reshape(NUM_LIMBS, W * n_loc),
            ynegT.reshape(NUM_LIMBS, W * n_loc),
            finf.reshape(W * n_loc),
            c,
            "complete",
        )
        local = {k: v[:, 0] for k, v in s.items()}
        gathered = {
            k: jax.lax.all_gather(v, "pts", axis=0) for k, v in local.items()
        }
        return _tree_reduce_points(jf, gathered)

    out = _shard_map(
        body,
        mesh,
        in_specs=(P("pts"), P(None, None, "pts"), P(None, None, "pts"),
                  P(None, None, "pts"), P(None, "pts")),
        out_specs=P(),
    )(ulimbs, xTw, yTw, ynegTw, finfw)
    res = {k: jf.from_mont(v.reshape(1, NUM_LIMBS))[0] for k, v in out.items()}
    return res["x"], res["y"], res["zz"], res["zzz"]


def msm_sharded(
    scalars: Sequence[int],
    bases: Sequence[AffinePoint] = None,
    mesh: Mesh = None,
    window: int = None,
    device_bases=None,
) -> AffinePoint:
    """Pod-sharded MSM entry point (host ints in/out) on the msm3
    column-serial engine. `device_bases` (a DeviceBases2) reuses a cached
    shifted-base precompute across calls (the Pedersen key path)."""
    from nova_tpu.ops import device_ok as _device_ok
    from nova_tpu.ops.msm3 import (
        DeviceBases2,
        _fixed3,
        _next_pow2,
        _num_windows,
        _scalar_ulimbs,
    )

    if device_bases is None:
        device_bases = DeviceBases2(bases[0].curve, bases)
    curve = device_bases.curve
    jf = JField(curve.base)
    if window is None:
        window = 16 if _device_ok() else 8
    n_dev = mesh.devices.size
    n = len(scalars)
    n_pad = max(512, _next_pow2(n), n_dev)

    ulimbs = _scalar_ulimbs(list(scalars), n_pad, window)
    xT, yT, ynegT, finf = _fixed3(device_bases, window, n_pad)
    W = _num_windows(window)

    with _no_persistent_cache():
        x, y, zz, zzz = _msm3_sharded_kernel(
            jf.spec.p, window, mesh, jnp.asarray(ulimbs),
            xT.reshape(NUM_LIMBS, W, n_pad),
            yT.reshape(NUM_LIMBS, W, n_pad),
            ynegT.reshape(NUM_LIMBS, W, n_pad),
            finf.reshape(W, n_pad),
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

    # T-commit through the sharded msm3 engine (same kernel as the real
    # Pedersen mesh path)
    scalars = vec()
    curve = _pick_curve_for_field(spec)
    g = AP.generator(curve)
    bases = []
    acc = g
    for _ in range(n):
        bases.append(acc)
        acc = acc.double()

    with _no_persistent_cache():
        t_vec, w_new, e_new, s0, sinf = _fold_elementwise_kernel(
            spec.p, mesh, az, bz, cz, e_vec, w1, w2, u_b, r_b
        )
    comm = msm_sharded(scalars, bases, mesh=mesh)
    jax.block_until_ready((t_vec, w_new, e_new, s0, sinf))
    return comm


# ---------------------------------------------------------------------------
# sharded outer sumcheck (the REAL Spartan prover's cubic round, distributed)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1))
def _cubic_round_sharded_kernel(field_p: int, mesh, eqZ, AZ, BZ, CZ):
    """Round sums for sum eq*(A*B - C) over tables laid out (n_loc, D, 16)
    with the strided (low-bits) axis sharded on 'pts': the top-variable
    halves pair up locally, partial sums all_gather + field-add (exact
    modular adds, so the result is bit-identical to the host prover).
    Returns (P(0), lead, P(-1)) as (16,) Montgomery rows, replicated."""
    jf = JField._instances[field_p]

    def body(e, a, b, c):
        e, a, b, c = e[:, 0], a[:, 0], b[:, 0], c[:, 0]
        half = a.shape[0] // 2
        elo, ehi = e[:half], e[half:]
        alo, ahi = a[:half], a[half:]
        blo, bhi = b[:half], b[half:]
        clo, chi = c[:half], c[half:]
        de, da = jf.sub(ehi, elo), jf.sub(ahi, alo)
        db, dc = jf.sub(bhi, blo), jf.sub(chi, clo)
        e0 = jf.mont_mul(elo, jf.sub(jf.mont_mul(alo, blo), clo))
        c3 = jf.mont_mul(de, jf.mont_mul(da, db))
        am, bm, cm = jf.sub(alo, da), jf.sub(blo, db), jf.sub(clo, dc)
        em1 = jf.mont_mul(jf.sub(elo, de), jf.sub(jf.mont_mul(am, bm), cm))
        part = jnp.stack(
            [_field_sum(jf, e0), _field_sum(jf, c3), _field_sum(jf, em1)]
        )  # (3, 16) local partials
        allp = jax.lax.all_gather(part, "pts", axis=0)  # (D, 3, 16)
        return (
            _field_sum(jf, allp[:, 0]),
            _field_sum(jf, allp[:, 1]),
            _field_sum(jf, allp[:, 2]),
        )

    sh = P(None, "pts", None)
    return _shard_map(
        body, mesh, in_specs=(sh, sh, sh, sh), out_specs=(P(), P(), P())
    )(eqZ, AZ, BZ, CZ)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _bind_sharded_kernel(field_p: int, k: int, mesh, r_mont, *polys):
    """Bind the top variable of k (n_loc, D, 16) strided-sharded tables."""
    jf = JField._instances[field_p]

    def body(r_b, *zs):
        out = []
        for Z in zs:
            z = Z[:, 0]
            half = z.shape[0] // 2
            lo, hi = z[:half], z[half:]
            rb = jnp.broadcast_to(r_b, lo.shape)
            out.append(jf.add(lo, jf.mont_mul(rb, jf.sub(hi, lo)))[:, None])
        return tuple(out)

    sh = P(None, "pts", None)
    return _shard_map(
        body, mesh, in_specs=(P(),) + (sh,) * k, out_specs=(sh,) * k
    )(r_mont, *polys)


def prove_cubic_with_three_inputs_sharded(
    field, claim: int, taus: Sequence[int], Az, Bz, Cz, transcript, mesh: Mesh
):
    """Mesh-sharded variant of SumcheckProof.prove_cubic_with_three_inputs
    (the Spartan outer sumcheck, src/spartan/sumcheck.rs:445-506):
    evaluation tables shard strided over the 'pts' axis, each round's three
    interpolation sums reduce exactly over ICI, binds run shard-local; the
    last log2(D) variables (the strided bits) finish on host once one
    element per device remains. Transcript/proof bit-identical to the host
    and single-device provers."""
    from nova_tpu.spartan.polys import EqPolynomial, UniPoly
    from nova_tpu.spartan.sumcheck import SumcheckProof

    p = field.p
    num_rounds = len(taus)
    D = mesh.devices.size
    n = 1 << num_rounds
    assert n % D == 0 and n // D >= 2, (n, D)
    jf = JField(field)
    to_mont = jf.jit("to_mont")

    def dev(vals):
        arr = to_mont(jnp.asarray(jf.pack([v % p for v in vals])))
        resh = jax.jit(
            lambda a: a.reshape(n // D, D, NUM_LIMBS),
            out_shardings=NamedSharding(mesh, P(None, "pts", None)),
        )
        return resh(arr)

    eqZ = dev(EqPolynomial.evals_from_points(field, [t % p for t in taus]))
    AZ, BZ, CZ = dev(Az), dev(Bz), dev(Cz)

    r_out: list = []
    polys = []
    claim_per_round = claim % p
    local = n // D
    with _no_persistent_cache():
        while local > 1:
            e0m, c3m, em1m = _cubic_round_sharded_kernel(
                p, mesh, eqZ, AZ, BZ, CZ
            )
            e0, c3, em1 = jf.unpack(
                jf.from_mont(jnp.stack([e0m, c3m, em1m]))
            )
            poly = UniPoly.from_evals_deg3(
                field, [e0, (claim_per_round - e0) % p, c3, em1]
            )
            transcript.absorb(b"p", poly)
            r_i = transcript.squeeze(b"c")
            r_out.append(r_i)
            polys.append(poly.compress())
            claim_per_round = poly.evaluate(r_i)
            r_mont = jf.const_mont(
                r_i % p, jnp.zeros((1, NUM_LIMBS), jnp.uint32)
            )[0]
            eqZ, AZ, BZ, CZ = _bind_sharded_kernel(
                p, 4, mesh, r_mont, eqZ, AZ, BZ, CZ
            )
            local //= 2

    # strided tail: one element per device; finish the last log2(D)
    # variables on host (global index == device index by construction)
    def host_list(Zd):
        return jf.unpack(jf.from_mont(jnp.asarray(Zd).reshape(D, NUM_LIMBS)))

    E, A, B, C = host_list(eqZ), host_list(AZ), host_list(BZ), host_list(CZ)
    while len(A) >= 2:
        half = len(A) // 2
        e0 = c3 = em1 = 0
        for i in range(half):
            de, da = E[half + i] - E[i], A[half + i] - A[i]
            db, dc = B[half + i] - B[i], C[half + i] - C[i]
            e0 += E[i] * (A[i] * B[i] - C[i])
            c3 += de * da * db
            em1 += (E[i] - de) * ((A[i] - da) * (B[i] - db) - (C[i] - dc))
        e0, c3, em1 = e0 % p, c3 % p, em1 % p
        poly = UniPoly.from_evals_deg3(
            field, [e0, (claim_per_round - e0) % p, c3, em1]
        )
        transcript.absorb(b"p", poly)
        r_i = transcript.squeeze(b"c")
        r_out.append(r_i)
        polys.append(poly.compress())
        claim_per_round = poly.evaluate(r_i)
        E = [(E[i] + r_i * (E[half + i] - E[i])) % p for i in range(half)]
        A = [(A[i] + r_i * (A[half + i] - A[i])) % p for i in range(half)]
        B = [(B[i] + r_i * (B[half + i] - B[i])) % p for i in range(half)]
        C = [(C[i] + r_i * (C[half + i] - C[i])) % p for i in range(half)]

    return SumcheckProof(polys), r_out, [A[0], B[0], C[0]]


def _pick_curve_for_field(spec):
    """Find a registered curve whose base field is `spec`."""
    from nova_tpu.curves.spec import bn254, grumpkin, pallas, secp256k1, secq256k1, vesta

    for c in (pallas, vesta, bn254, grumpkin, secp256k1, secq256k1):
        if c.base.p == spec.p:
            return c
    raise ValueError("no curve over this base field")
