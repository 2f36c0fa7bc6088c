"""Device-resident prover state (FVec) vs the host int paths.

NOVA_TPU_FORCE_DEVICE drives the FVec/commit_T_device/mont-MSM pipeline
through the CPU XLA backend so the suite exercises exactly the code the
TPU runs."""

import numpy as np
import pytest

import nova_tpu.constants as constants
import nova_tpu.r1cs as r1cs_mod
from nova_tpu.fields.jfield import JField
from nova_tpu.ops.fvec import FVec
from nova_tpu.provider.engines import PallasEngine
from nova_tpu.provider.pedersen import CommitmentEngine
from nova_tpu.r1cs import RelaxedR1CSInstance, RelaxedR1CSWitness

from tests.test_nifs import satisfying_pair, tiny_r1cs


def test_fvec_roundtrip_and_ops():
    f = PallasEngine.scalar
    jf = JField(f)
    rng = np.random.default_rng(11)
    a = [int(rng.integers(0, 1 << 62)) * int(rng.integers(1, 1 << 62)) % f.p for _ in range(40)]
    b = [int(rng.integers(0, 1 << 62)) * int(rng.integers(1, 1 << 62)) % f.p for _ in range(40)]
    c = [int(x) % f.p for x in rng.integers(0, 1 << 60, 40)]
    av, bv, cv = (FVec.from_ints(jf, v) for v in (a, b, c))
    r, r2 = 0x1234567890ABCDEF, f.p - 3

    assert av.to_ints() == a
    assert list(av) == a
    assert av[3] == a[3]
    assert len(av) == 40
    assert av.axpy(r, bv) == [(x + r * y) % f.p for x, y in zip(a, b)]
    assert av.axpy2(r, bv, r2, cv) == [
        (x + r * y + r2 * z) % f.p for x, y, z in zip(a, b, c)
    ]
    assert av.add(bv) == [(x + y) % f.p for x, y in zip(a, b)]
    assert av.sub(bv) == [(x - y) % f.p for x, y in zip(a, b)]
    assert av.mul(bv) == [x * y % f.p for x, y in zip(a, b)]
    assert av.scale(r) == [x * r % f.p for x in a]
    assert av.pad_to(50) == a + [0] * 10
    assert av.concat_ints([7, 9]) == a + [7, 9]


@pytest.fixture
def force_device(monkeypatch):
    monkeypatch.setenv("NOVA_TPU_FORCE_DEVICE", "1")
    monkeypatch.setattr(constants, "FOLD_DEVICE_THRESHOLD", 1)
    monkeypatch.setattr(r1cs_mod, "FOLD_DEVICE_THRESHOLD", 1)


def _fold_sequence(engine, forced: bool):
    """Three deterministic NIFS folds over the tiny cubic shape; returns
    the final running instance and materialized witness vectors."""
    from nova_tpu.nova.nifs import NIFS
    from nova_tpu.r1cs import R1CSInstance, R1CSWitness

    S = tiny_r1cs(engine)
    ck = S.commitment_key()
    f = engine.scalar
    pp_digest = 0x1234
    U_r = RelaxedR1CSInstance.default(engine.curve, S)
    W_r = RelaxedR1CSWitness.default(S)
    for i, x in enumerate((5, 135, 7)):
        z0 = f.mul(x, x)
        z1 = f.mul(z0, x)
        z2 = f.add(z1, x)
        y = f.add(z2, 5)
        W2 = R1CSWitness.new(S, [z0, z1, z2, 0], r_W=1000 + i)
        U2 = R1CSInstance.new(S, W2.commit(ck), [x, y])
        nifs, (U_r, W_r) = NIFS.prove(
            ck, engine, pp_digest, S, U_r, W_r, U2, W2, r_T=77 + i
        )
    S.is_sat_relaxed(ck, U_r, W_r)
    from nova_tpu.ops.fvec import as_list

    return U_r, as_list(W_r.W), as_list(W_r.E)


def test_device_fold_matches_host(force_device):
    U_dev, W_dev, E_dev = _fold_sequence(PallasEngine, True)
    import os

    del os.environ["NOVA_TPU_FORCE_DEVICE"]
    U_host, W_host, E_host = _fold_sequence(PallasEngine, False)
    assert U_dev == U_host
    assert W_dev == W_host
    assert E_dev == E_host


def test_commit_fvec_matches_commit_ints(force_device):
    engine = PallasEngine
    S = tiny_r1cs(engine)
    ck = S.commitment_key()
    f = engine.scalar
    jf = JField(f)
    rng = np.random.default_rng(5)
    v = [
        int(rng.integers(0, 1 << 62)) * int(rng.integers(1, 1 << 62)) % f.p
        for _ in range(4)
    ]
    got = CommitmentEngine.commit(ck, FVec.from_ints(jf, v), 3)
    want = CommitmentEngine.commit(ck, v, 3)
    assert got == want
