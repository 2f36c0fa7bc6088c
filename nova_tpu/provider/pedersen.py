"""Pedersen commitment engine (reference: src/provider/pedersen.rs).

commit(v, r) = sum_i v_i * G_i + r * H over hashed-to-curve generators.
Generators derive from a label via a Shake256 XOF, one 32-byte block per
generator, lifted to the curve with the halo2curves hash_to_curve map
(src/provider/traits.rs:249-293; implemented + derivation-verified in
nova_tpu/provider/hash_to_curve.py). The round-1/2 try-and-increment
map remains available behind NOVA_LEGACY_MAP=1 for old key caches.
Keys are cached on disk, and large commitments dispatch to the TPU MSM.
"""

from __future__ import annotations

import os

import numpy as np
from dataclasses import dataclass
from typing import List, Optional, Sequence

from nova_tpu import native
from nova_tpu.constants import DEVICE_THRESHOLD
from nova_tpu.ops import device_ok as _device_ok
from nova_tpu.curves.msm_host import msm as host_msm
from nova_tpu.curves.spec import AffinePoint, CurveSpec
from nova_tpu.provider.keccak import Shake256

_KEY_CACHE_DIR = os.path.join(os.path.dirname(__file__), "_cache")


def map_to_curve_legacy(curve: CurveSpec, uniform_bytes: bytes) -> AffinePoint:
    """Round-1/2 try-and-increment map, kept behind NOVA_LEGACY_MAP=1 so
    keys cached under the old derivation remain loadable: interpret 32
    bytes as a little-endian integer u; take x = (u mod p) + ctr for the
    smallest ctr >= 0 making x^3 + b square; pick the root whose parity
    equals bit 255 of u."""
    f = curve.base
    u = int.from_bytes(uniform_bytes, "little")
    parity = (u >> 255) & 1
    x = u % f.p
    while True:
        rhs = f.add(f.mul(f.mul(x, x), x), curve.b % f.p)
        y = f.sqrt(rhs)
        if y is not None:
            if y & 1 != parity:
                y = f.p - y
            return AffinePoint(curve, x, y)
        x = f.add(x, 1)


def _use_legacy_map() -> bool:
    return os.environ.get("NOVA_LEGACY_MAP") == "1"


def from_label(curve: CurveSpec, label: bytes, n: int) -> List[AffinePoint]:
    """Derive n generators from a label (DlogGroup::from_label semantics,
    src/provider/traits.rs:249-293): Shake256(label) XOF -> 32-byte blocks
    -> halo2curves hash_to_curve("from_uniform_bytes") (SSWU over a
    3-isogenous curve for pallas/vesta/secp256k1, SVDW for the rest; see
    nova_tpu/provider/hash_to_curve.py for the derivation)."""
    from nova_tpu.provider.hash_to_curve import hash_to_curve

    reader = Shake256().update(label).finalize_xof()
    blocks = [reader.read(32) for _ in range(n)]
    if _use_legacy_map():
        return [map_to_curve_legacy(curve, blk) for blk in blocks]
    return [hash_to_curve(curve, b"from_uniform_bytes", blk) for blk in blocks]


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


@dataclass
class CommitmentKey:
    curve: CurveSpec
    ck: list  # List[AffinePoint] generators
    h: AffinePoint  # blinding generator

    def __len__(self):
        return len(self.ck)

    def device_bases(self, n: int):
        """Marshalled-to-device generators, cached (bases are reused across
        every commit with this key, so pay the host->device packing once)."""
        from nova_tpu.ops.msm import DeviceBases

        db = getattr(self, "_device_bases", None)
        if db is None or db.n < n:
            n_pad = 1 if n <= 1 else 1 << (n - 1).bit_length()
            db = DeviceBases(self.curve, self.ck[: min(n_pad, len(self.ck))])
            object.__setattr__(self, "_device_bases", db)
        return db

    def device_bases2(self, n: int):
        """Marshalled bases for the fixed-base MSM engine (ops/msm2),
        cached with their window-shifted precompute."""
        from nova_tpu.ops.msm2 import DeviceBases2

        db = getattr(self, "_device_bases2", None)
        if db is None or db.n < n:
            n_pad = 1 if n <= 1 else 1 << (n - 1).bit_length()
            db = DeviceBases2(self.curve, self.ck[: min(n_pad, len(self.ck))])
            object.__setattr__(self, "_device_bases2", db)
        return db

    def host_arrays(self, n: int):
        """Limb-marshalled generator arrays for native.msm_cached, cached
        (one-time Python-int -> limb conversion per key)."""
        from nova_tpu import native

        arrs = getattr(self, "_host_arrays", None)
        if arrs is None or arrs[0].shape[0] < n:
            arrs = native.marshal_points(self.ck[: max(n, len(self.ck))])
            object.__setattr__(self, "_host_arrays", arrs)
        return arrs

    # split/combine/fold/scale for IPA (CommitmentKeyExtTrait,
    # src/provider/pedersen.rs:431-529)
    def split_at(self, n: int):
        left = CommitmentKey(self.curve, self.ck[:n], self.h)
        # the left piece is a prefix: the marshalled-array caches remain
        # valid for it, so share them instead of re-marshalling per call
        arrs = getattr(self, "_host_arrays", None)
        if arrs is not None and arrs[0].shape[0] >= n:
            object.__setattr__(left, "_host_arrays", arrs)
        return (left, CommitmentKey(self.curve, self.ck[n:], self.h))

    def combine(self, other: "CommitmentKey") -> "CommitmentKey":
        return CommitmentKey(self.curve, self.ck + other.ck, self.h)

    def fold(self, w1: int, w2: int) -> "CommitmentKey":
        half = len(self.ck) // 2
        L, R = self.ck[:half], self.ck[half:]
        from nova_tpu import native

        if native.available() and half > 0:
            ck = native.ec_fold(L, R, w1, w2)
        else:
            ck = [l.mul(w1).add(r.mul(w2)) for l, r in zip(L, R)]
        return CommitmentKey(self.curve, ck, self.h)

    def scale(self, r: int) -> "CommitmentKey":
        from nova_tpu import native

        if native.available() and len(self.ck) > 1:
            return CommitmentKey(self.curve, native.ec_scale(self.ck, r), self.h)
        return CommitmentKey(self.curve, [g.mul(r) for g in self.ck], self.h)


@dataclass
class DerandKey:
    curve: CurveSpec
    h: AffinePoint


class Commitment:
    """A Pedersen commitment: a group element with the reference's
    transcript/RO absorption conventions."""

    __slots__ = ("point",)

    def __init__(self, point: AffinePoint):
        self.point = point

    @staticmethod
    def default(curve: CurveSpec) -> "Commitment":
        return Commitment(AffinePoint.identity(curve))

    def __add__(self, other: "Commitment") -> "Commitment":
        return Commitment(self.point.add(other.point))

    def __sub__(self, other: "Commitment") -> "Commitment":
        return Commitment(self.point.sub(other.point))

    def __mul__(self, scalar: int) -> "Commitment":
        return Commitment(self.point.mul(scalar))

    def __eq__(self, other):
        return self.point == other.point

    def __repr__(self):
        return f"Commitment({self.point!r})"

    def to_coordinates(self):
        return self.point.to_coordinates()

    def to_transcript_bytes(self) -> bytes:
        return self.point.to_transcript_bytes()

    def absorb_in_ro(self, ro):
        """Absorb (x, y, infinity) in the base-field RO
        (src/provider/pedersen.rs:120-135)."""
        x, y, inf = self.point.to_coordinates()
        ro.absorb(x)
        ro.absorb(y)
        ro.absorb(1 if inf else 0)

    def absorb_in_ro2(self, ro):
        """Absorb in the scalar-field RO as bignat limbs
        (src/provider/pedersen.rs:137-157)."""
        from nova_tpu.constants import BN_LIMB_WIDTH, BN_N_LIMBS

        x, y, inf = self.point.to_coordinates()
        mask = (1 << BN_LIMB_WIDTH) - 1
        for v in (x, y):
            for i in range(BN_N_LIMBS):
                ro.absorb((v >> (BN_LIMB_WIDTH * i)) & mask)
        ro.absorb(1 if inf else 0)


def _load_gen_cache(path, curve, num):
    """Load cached generators from the raw .npy format (rows of
    x[32] | y[32] | inf[1], little-endian). No pickle: generator caches are
    local but the loader stays typed anyway (allow_pickle=False)."""
    with open(path, "rb") as fh:
        rows = np.load(fh, allow_pickle=False)
    rows = rows[:num]
    out = []
    for r in rows:
        inf = bool(r[64])
        if inf:
            out.append(AffinePoint.identity(curve))
        else:
            x = int.from_bytes(r[:32].tobytes(), "little")
            y = int.from_bytes(r[32:64].tobytes(), "little")
            out.append(AffinePoint(curve, x, y))
    return out


class CommitmentEngine:
    """Pedersen commitment engine (CommitmentEngineTrait impl)."""

    @staticmethod
    def setup(curve: CurveSpec, label: bytes, n: int) -> CommitmentKey:
        num = _next_pow2(n) + 1
        # cache files are keyed by the hash-to-curve map: "ck" holds the
        # legacy try-and-increment keys, "ck2" the halo2curves-map keys
        tag = "ck" if _use_legacy_map() else "ck2"
        cache = os.path.join(
            _KEY_CACHE_DIR, f"{tag}_{curve.name}_{label.decode()}_{num}.npy"
        )
        if os.path.exists(cache):
            gens = _load_gen_cache(cache, curve, num)
        else:
            # reuse a larger cached key if present
            gens = None
            if os.path.isdir(_KEY_CACHE_DIR):
                prefix = f"{tag}_{curve.name}_{label.decode()}_"
                for fn in os.listdir(_KEY_CACHE_DIR):
                    if fn.startswith(prefix) and fn.endswith(".npy"):
                        try:
                            m = int(fn[len(prefix) : -4])
                        except ValueError:
                            continue
                        if m >= num:
                            gens = _load_gen_cache(
                                os.path.join(_KEY_CACHE_DIR, fn), curve, num
                            )
                            break
            if gens is None:
                gens = from_label(curve, label, num)
                os.makedirs(_KEY_CACHE_DIR, exist_ok=True)
                tmp = cache + ".tmp"
                rows = np.zeros((len(gens), 65), dtype=np.uint8)
                for i, g in enumerate(gens):
                    rows[i, :32] = np.frombuffer(
                        g.x.to_bytes(32, "little"), dtype=np.uint8
                    )
                    rows[i, 32:64] = np.frombuffer(
                        g.y.to_bytes(32, "little"), dtype=np.uint8
                    )
                    rows[i, 64] = 1 if g.infinity else 0
                with open(tmp, "wb") as fh:
                    np.save(fh, rows, allow_pickle=False)
                os.replace(tmp, cache)
        h, ck = gens[0], gens[1:]
        return CommitmentKey(curve, ck, h)

    @staticmethod
    def derand_key(ck: CommitmentKey) -> DerandKey:
        return DerandKey(ck.curve, ck.h)

    @staticmethod
    def commit(ck: CommitmentKey, v: Sequence[int], r: int = 0) -> Commitment:
        from nova_tpu import native
        from nova_tpu.constants import FOLD_DEVICE_THRESHOLD
        from nova_tpu.ops.fvec import FVec

        assert len(ck.ck) >= len(v), (len(ck.ck), len(v))
        from nova_tpu.parallel import current_mesh

        mesh = current_mesh()
        if mesh is not None and len(v) >= 8:
            from nova_tpu.parallel import msm_sharded
            from nova_tpu.ops.fvec import as_list

            acc = msm_sharded(
                as_list(v), mesh=mesh, device_bases=ck.device_bases2(len(v))
            )
            if r:
                acc = acc.add(ck.h.mul(r))
            return Commitment(acc)
        from nova_tpu.ops.fvec import HVec

        if isinstance(v, HVec) and native.available():
            return CommitmentEngine.commit_limbs(ck, v.limbs64(), r)
        if isinstance(v, FVec):
            if _device_ok() and len(v) >= FOLD_DEVICE_THRESHOLD:
                from nova_tpu.ops.msm3 import msm_device3_mont

                acc = msm_device3_mont(v.m, ck.device_bases2(len(v)))
                if r:
                    acc = acc.add(ck.h.mul(r))
                return Commitment(acc)
            v = v.to_ints()
        if len(v) == 0:
            acc = AffinePoint.identity(ck.curve)
        elif len(v) >= DEVICE_THRESHOLD and _device_ok():
            from nova_tpu.ops.msm2 import msm_device2

            acc = msm_device2(
                list(v), device_bases=ck.device_bases2(len(v)), reuse=True
            )
        elif native.available() and len(v) >= 16:
            acc = native.msm_cached(ck.curve, ck.host_arrays(len(v)), list(v))
        else:
            acc = host_msm(list(v), ck.ck[: len(v)])
        if r:
            acc = acc.add(ck.h.mul(r))
        return Commitment(acc)

    @staticmethod
    def commit_limbs(ck: CommitmentKey, vl, r: int = 0) -> Commitment:
        """Commit to a vector given as (n,4) uint64 normal-form limbs (the
        host-native kernels' boundary format); avoids Python-int round
        trips on the fold hot path."""
        from nova_tpu import native

        n = vl.shape[0]
        assert len(ck.ck) >= n
        if native.available():
            acc = native.msm_cached(ck.curve, ck.host_arrays(n), vl)
        else:
            acc = host_msm(native.limbs_to_ints(vl), ck.ck[:n])
        if r:
            acc = acc.add(ck.h.mul(r))
        return Commitment(acc)

    @staticmethod
    def batch_commit(ck: CommitmentKey, vs, rs) -> list:
        """commitment.rs:94-104. Device-resident (FVec) vectors batch
        through the pipelined MSM path: all dispatches queue before the
        first result is collected, hiding the per-result round trip."""
        assert len(vs) == len(rs)
        from nova_tpu.constants import FOLD_DEVICE_THRESHOLD
        from nova_tpu.ops.fvec import FVec
        from nova_tpu.parallel import current_mesh

        if (
            len(vs) > 1
            and current_mesh() is None
            and all(
                isinstance(v, FVec) and len(v) >= FOLD_DEVICE_THRESHOLD
                for v in vs
            )
            and _device_ok()
        ):
            from nova_tpu.ops.msm3 import msm_device3_mont_batch

            accs = msm_device3_mont_batch(
                [v.m for v in vs], ck.device_bases2(max(len(v) for v in vs))
            )
            out = []
            for acc, r in zip(accs, rs):
                if r:
                    acc = acc.add(ck.h.mul(r))
                out.append(Commitment(acc))
            return out
        return [CommitmentEngine.commit(ck, v, r) for v, r in zip(vs, rs)]

    @staticmethod
    def commit_small(ck: CommitmentKey, v: Sequence[int], r: int = 0) -> Commitment:
        """Small-scalar commit (commitment.rs:123-136 / msm_small
        routing, msm.rs:469-530): the device path decomposes only enough
        windows to cover the actual max bit width (1/10/16-bit Spark
        oracle data pays 1-2 windows instead of 17); the host-native
        engine already does max-bit window sizing internally."""
        from nova_tpu.constants import DEVICE_THRESHOLD
        from nova_tpu.ops.fvec import FVec
        from nova_tpu.parallel import current_mesh

        if (
            current_mesh() is None
            and not isinstance(v, FVec)
            and len(v) >= DEVICE_THRESHOLD
            and _device_ok()
        ):
            from nova_tpu.ops.msm3 import msm_device3

            vl = list(v)
            mb = max((int(x).bit_length() for x in vl), default=1)
            acc = msm_device3(
                vl, device_bases=ck.device_bases2(len(vl)),
                max_bits=max(mb, 1),
            )
            if r:
                acc = acc.add(ck.h.mul(r))
            return Commitment(acc)
        return CommitmentEngine.commit(ck, v, r)

    @staticmethod
    def batch_commit_small(ck: CommitmentKey, vs, rs) -> list:
        assert len(vs) == len(rs)
        return [CommitmentEngine.commit_small(ck, v, r) for v, r in zip(vs, rs)]

    @staticmethod
    def commit_small_range(
        ck: CommitmentKey, v: Sequence[int], r: int, range_: range, max_num_bits: int
    ) -> Commitment:
        """Commit over a generator sub-range (pedersen.rs:285-315)."""
        bases = ck.ck[range_.start : range_.stop]
        assert len(bases) >= len(v)
        if not v:
            acc = AffinePoint.identity(ck.curve)
        elif native.available():
            acc = native.msm_cached(
                ck.curve, ck.host_arrays(range_.start + len(v)), list(v),
                indices=list(range(range_.start, range_.start + len(v))),
            )
        else:
            acc = host_msm(list(v), bases[: len(v)])
        if r:
            acc = acc.add(ck.h.mul(r))
        return Commitment(acc)

    @staticmethod
    def ck_derive_by_address(
        ck: CommitmentKey, addresses: Sequence[int], table_size: int
    ) -> CommitmentKey:
        """Derived key: G'_j = sum_{i: addr[i]=j} G_i (pedersen.rs:360-381)."""
        from nova_tpu.errors import InvalidCommitmentKeyLengthError, InvalidIndexError

        if len(addresses) > len(ck.ck):
            raise InvalidCommitmentKeyLengthError()
        if any(j >= table_size for j in addresses):
            raise InvalidIndexError()
        if native.available() and addresses:
            import numpy as np

            addr = np.asarray(addresses, dtype=np.uint32)
            order = np.argsort(addr, kind="stable").astype(np.uint32)
            counts = np.bincount(addr, minlength=table_size)
            seg_off = np.concatenate(
                [np.zeros(1, dtype=np.int64), np.cumsum(counts)]
            ).astype(np.uint32)
            acc = native.batch_add_seg(
                ck.curve, ck.host_arrays(len(addresses)), order, seg_off
            )
        else:
            acc = [AffinePoint.identity(ck.curve) for _ in range(table_size)]
            for i, j in enumerate(addresses):
                acc[j] = acc[j].add(ck.ck[i])
        return CommitmentKey(ck.curve, acc, ck.h)

    @staticmethod
    def commit_sparse(
        ck: CommitmentKey, indices: Sequence[int], scalars: Sequence[int], r: int = 0
    ) -> Commitment:
        assert len(indices) == len(scalars)
        if not indices:
            acc = AffinePoint.identity(ck.curve)
        elif native.available():
            acc = native.msm_cached(
                ck.curve, ck.host_arrays(max(indices) + 1), list(scalars),
                indices=list(indices),
            )
        else:
            bases = [ck.ck[i] for i in indices]
            acc = host_msm(list(scalars), bases)
        if r:
            acc = acc.add(ck.h.mul(r))
        return Commitment(acc)

    @staticmethod
    def commit_sparse_binary(
        ck: CommitmentKey, non_zero_indices: Sequence[int], r: int = 0
    ) -> Commitment:
        if native.available() and non_zero_indices:
            acc = native.batch_add_seg(
                ck.curve,
                ck.host_arrays(max(non_zero_indices) + 1),
                list(non_zero_indices),
                [0, len(non_zero_indices)],
            )[0]
        else:
            acc = AffinePoint.identity(ck.curve)
            for i in non_zero_indices:
                acc = acc.add(ck.ck[i])
        if r:
            acc = acc.add(ck.h.mul(r))
        return Commitment(acc)

    @staticmethod
    def derandomize(dk: DerandKey, commit: Commitment, r: int) -> Commitment:
        return Commitment(commit.point.sub(dk.h.mul(r)))
