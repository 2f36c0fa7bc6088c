"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(conftest.py sets XLA_FLAGS; SURVEY.md §4 item 9: distributed testing is
new ground for the TPU build)."""

import os
import random

import pytest

from nova_tpu.curves.spec import AffinePoint, pallas
from nova_tpu.parallel import make_mesh, msm_sharded, run_sharded_fold_step

rng = random.Random(0xD15C)


def test_msm_sharded_matches_host():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(4)
    n = 64
    g = AffinePoint.generator(pallas)
    bases, acc = [], g
    for _ in range(n):
        bases.append(acc)
        acc = acc.double()
    scalars = [rng.randrange(pallas.scalar.p) for _ in range(n)]

    got = msm_sharded(scalars, bases, mesh)

    from nova_tpu.curves.msm_host import msm as host_msm

    want = host_msm(scalars, bases)
    assert got == want


def _wide_cubic_r1cs(engine, num_vars=64):
    """The tiny cubic R1CS x^3 + x + 5 = y (reference
    src/r1cs/mod.rs:1294-1358) widened so witness commits have at least
    one point per device (mirrors __graft_entry__.dryrun_multichip)."""
    from nova_tpu.r1cs import R1CSShape, SparseMatrix

    f = engine.scalar
    num_cons, num_io = 4, 2
    A, B, C = [], [], []
    A.append((0, num_vars + 1, 1))
    B.append((0, num_vars + 1, 1))
    C.append((0, 0, 1))
    A.append((1, 0, 1))
    B.append((1, num_vars + 1, 1))
    C.append((1, 1, 1))
    A.append((2, 1, 1))
    A.append((2, num_vars + 1, 1))
    B.append((2, num_vars, 1))
    C.append((2, 2, 1))
    A.append((3, 2, 1))
    A.append((3, num_vars, 5))
    B.append((3, num_vars, 1))
    C.append((3, num_vars + 2, 1))
    rows, cols = num_cons, num_vars + num_io + 1
    return R1CSShape.new(
        f, num_cons, num_vars, num_io,
        SparseMatrix.new(f, A, rows, cols),
        SparseMatrix.new(f, B, rows, cols),
        SparseMatrix.new(f, C, rows, cols),
    )


def _satisfying_pair(engine, S, ck, x, num_vars):
    from nova_tpu.r1cs import R1CSInstance, R1CSWitness

    f = engine.scalar
    z0 = f.mul(x, x)
    z1 = f.mul(z0, x)
    z2 = f.add(z1, x)
    y = f.add(z2, 5)
    W = R1CSWitness.new(S, [z0, z1, z2] + [0] * (num_vars - 3), r_W=7)
    U = R1CSInstance.new(S, W.commit(ck), [x, y])
    return U, W


def test_sharded_commit_bit_identity():
    """pedersen commit through msm_sharded == host commit, bit for bit
    (dryrun check (a), now in CI)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from nova_tpu.provider.engines import PallasEngine
    from nova_tpu.provider.pedersen import CommitmentEngine

    mesh = make_mesh(4)
    S = _wide_cubic_r1cs(PallasEngine)
    ck = S.commitment_key()
    U1, W1 = _satisfying_pair(PallasEngine, S, ck, 5, S.num_vars)
    host_comm = CommitmentEngine.commit(ck, W1.W, W1.r_W)
    pt = msm_sharded(list(W1.W), ck.ck[: len(W1.W)], mesh=mesh)
    pt = pt.add(ck.h.mul(W1.r_W))
    assert (pt.x, pt.y) == (host_comm.point.x, host_comm.point.y)


def test_nifs_fold_under_mesh_bit_identity():
    """A REAL NIFS fold with all commitment MSMs mesh-routed produces the
    same folded pair as the host-only fold (dryrun check (b))."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from nova_tpu.nova.nifs import NIFS
    from nova_tpu.parallel import use_mesh
    from nova_tpu.provider.engines import PallasEngine
    from nova_tpu.r1cs import RelaxedR1CSInstance, RelaxedR1CSWitness

    mesh = make_mesh(4)
    S = _wide_cubic_r1cs(PallasEngine)
    ck = S.commitment_key()
    U2, W2 = _satisfying_pair(PallasEngine, S, ck, 9, S.num_vars)
    r_U = RelaxedR1CSInstance.default(PallasEngine.curve, S)
    r_W = RelaxedR1CSWitness.default(S)
    with use_mesh(mesh):
        nifs, (U_f, W_f) = NIFS.prove(
            ck, PallasEngine, 0x1234, S, r_U, r_W, U2, W2, r_T=11
        )
    S.is_sat_relaxed(ck, U_f, W_f)
    nifs_h, (U_h, W_h) = NIFS.prove(
        ck, PallasEngine, 0x1234, S, r_U, r_W, U2, W2, r_T=11
    )
    assert U_f.comm_W == U_h.comm_W and U_f.comm_E == U_h.comm_E
    assert U_f.u == U_h.u and U_f.X == U_h.X


def test_sharded_outer_sumcheck_proof_bits():
    """Mesh-sharded Spartan outer sumcheck emits bit-identical proofs to
    the host materialized-eq prover (dryrun check (c))."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from nova_tpu.parallel import prove_cubic_with_three_inputs_sharded
    from nova_tpu.provider.engines import PallasEngine
    from nova_tpu.provider.keccak import Keccak256Transcript
    from nova_tpu.spartan.polys import MultilinearPolynomial
    from nova_tpu.spartan.sumcheck import SumcheckProof

    mesh = make_mesh(4)
    f = PallasEngine.scalar
    p = f.p
    r = random.Random(0x5C)
    k, n = 6, 1 << 6
    taus = [r.randrange(p) for _ in range(k)]
    Az = [r.randrange(p) for _ in range(n)]
    Bz = [r.randrange(p) for _ in range(n)]
    Cz = [a * b % p for a, b in zip(Az, Bz)]
    t1 = Keccak256Transcript(b"test", f)
    proof_s, rx_s, claims_s = prove_cubic_with_three_inputs_sharded(
        f, 0, taus, Az, Bz, Cz, t1, mesh
    )
    t2 = Keccak256Transcript(b"test", f)
    os.environ["NOVA_NO_GRUEN"] = "1"
    try:
        proof_h, rx_h, claims_h = SumcheckProof.prove_cubic_with_three_inputs(
            f, 0, taus,
            MultilinearPolynomial(f, list(Az)),
            MultilinearPolynomial(f, list(Bz)),
            MultilinearPolynomial(f, list(Cz)),
            t2,
        )
    finally:
        del os.environ["NOVA_NO_GRUEN"]
    assert rx_s == rx_h and claims_s == claims_h
    assert [pl.coeffs_except_linear_term for pl in proof_s.compressed_polys] == [
        pl.coeffs_except_linear_term for pl in proof_h.compressed_polys
    ]


@pytest.mark.slow
def test_prove_step_under_mesh():
    """One REAL RecursiveSNARK.prove_step with the mesh active (every
    witness/cross-term commit mesh-routed) then verify (dryrun check (d)).
    Subprocess-isolated like test_sharded_fold_step_runs: the shard_map
    programs it compiles trip the XLA:CPU in-process segfault when the
    host process is already large."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "flags = os.environ.get('XLA_FLAGS', '')\n"
        "if 'host_platform_device_count' not in flags:\n"
        "    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from nova_tpu.parallel import make_mesh, use_mesh\n"
        "from nova_tpu.nova.circuit import TrivialCircuit\n"
        "from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK\n"
        "from nova_tpu.provider.engines import PallasEngine, VestaEngine\n"
        "c = TrivialCircuit()\n"
        "pp = PublicParams.setup(PallasEngine, VestaEngine, c)\n"
        "rs = RecursiveSNARK.new(pp, c, [0])\n"
        "with use_mesh(make_mesh(4)):\n"
        "    rs.prove_step(pp, c)\n"
        "rs.verify(pp, rs.i, [0])\n"
        "print('MESH_PROVE_STEP_OK')\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "MESH_PROVE_STEP_OK" in res.stdout


@pytest.mark.slow
def test_sharded_fold_step_runs():
    """Runs in a fresh subprocess: XLA:CPU segfaults compiling this
    shard_map program when the host process is already large (reproduced
    twice mid-suite; passes standalone), so isolate it."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "flags = os.environ.get('XLA_FLAGS', '')\n"
        "if 'host_platform_device_count' not in flags:\n"
        "    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from nova_tpu.parallel import make_mesh, run_sharded_fold_step\n"
        "from nova_tpu.curves.spec import pallas\n"
        "out = run_sharded_fold_step(make_mesh(len(jax.devices())), pallas.base, 64)\n"
        "assert out is not None\n"
        "print('FOLD_STEP_OK')\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "FOLD_STEP_OK" in res.stdout
