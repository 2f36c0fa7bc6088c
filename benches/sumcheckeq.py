"""Eq-sumcheck bench (reference benches/sumcheckeq.rs:36-40, up to 2^26
variables): the Gruen/BDDT eq-factored outer sumcheck vs the
materialized-eq prover."""

import os

from common import emit, force_cpu_if_no_accel, parse_args, rng, timeit

force_cpu_if_no_accel()

from nova_tpu.provider.engines import PallasEngine
from nova_tpu.provider.keccak import Keccak256Transcript
from nova_tpu.spartan.polys import EqPolynomial, MultilinearPolynomial
from nova_tpu.spartan.sumcheck import SumcheckProof


def main():
    sizes, _ = parse_args([14, 16])
    f = PallasEngine.scalar
    r = rng()
    for lg in sizes:
        n = 1 << lg
        Az = [r.randrange(f.p) for _ in range(n)]
        Bz = [r.randrange(f.p) for _ in range(n)]
        Cz = [r.randrange(f.p) for _ in range(n)]
        taus = [r.randrange(1, f.p) for _ in range(lg)]
        eq = EqPolynomial.evals_from_points(f, taus)
        claim = sum(e * (a * b - c) for e, a, b, c in zip(eq, Az, Bz, Cz)) % f.p

        def run():
            tr = Keccak256Transcript(b"b", f)
            SumcheckProof.prove_cubic_with_three_inputs(
                f, claim,
                taus,
                MultilinearPolynomial(f, Az),
                MultilinearPolynomial(f, Bz),
                MultilinearPolynomial(f, Cz),
                tr,
            )

        dt = timeit(run)
        os.environ["NOVA_NO_GRUEN"] = "1"
        try:
            dt_mat = timeit(run)
        finally:
            del os.environ["NOVA_NO_GRUEN"]
        emit("sumcheck-eq", f"2^{lg}", dt,
             {"gruen_s": round(dt, 3), "materialized_s": round(dt_mat, 3)})


if __name__ == "__main__":
    main()
