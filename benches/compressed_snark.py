"""CompressedSNARK prove/verify grid (reference
benches/compressed-snark.rs:43-58): same size grid as recursive-snark,
x {snark (S1/S2), ppsnark (SS1/SS2)}."""

from common import emit, force_cpu_if_no_accel, parse_args, timeit

force_cpu_if_no_accel()

from nova_tpu.nova.circuit import TrivialCircuit
from nova_tpu.nova.compressed import CompressedSNARK
from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK
from nova_tpu.provider.engines import PallasEngine, VestaEngine
from nova_tpu.spartan.ppsnark import RelaxedR1CSSNARK as PP


def main():
    _, args = parse_args([0])
    c = TrivialCircuit()
    configs = [("snark", None, None, {})]
    if not args.quick:
        configs.append(
            ("ppsnark", PP, PP,
             {"ck_hint1": PP.ck_floor, "ck_hint2": PP.ck_floor})
        )
    for name, S1, S2, hints in configs:
        pp = PublicParams.setup(PallasEngine, VestaEngine, c, **hints)
        rs = RecursiveSNARK.new(pp, c, [0])
        rs.prove_step(pp, c)
        rs.prove_step(pp, c)
        pk, vk = CompressedSNARK.setup(pp, S1=S1, S2=S2)
        t = timeit(lambda: CompressedSNARK.prove(pp, pk, rs))
        proof = CompressedSNARK.prove(pp, pk, rs)
        tv = timeit(lambda: proof.verify(vk, rs.i, [0]))
        emit("compressed-snark", name, t,
             {"prove_s": round(t, 2), "verify_s": round(tv, 2)})


if __name__ == "__main__":
    main()
