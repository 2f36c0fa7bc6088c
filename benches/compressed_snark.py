"""CompressedSNARK prove/verify grid (reference
benches/compressed-snark.rs:43-58): same size grid as recursive-snark,
x {snark (S1/S2), ppsnark (SS1/SS2)}."""

from common import emit, force_cpu_if_no_accel, parse_args, timeit

force_cpu_if_no_accel()

from nova_tpu.nova.compressed import CompressedSNARK
from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK
from nova_tpu.provider.engines import PallasEngine, VestaEngine
from nova_tpu.spartan.ppsnark import RelaxedR1CSSNARK as PP


def main():
    # sizes = log2 of EXTRA step-circuit constraints (0 = the minimal
    # TrivialCircuit augmented pair, ~2^14 padded), mirroring the
    # reference grid's 9985..2^20 sweep (benches/compressed-snark.rs:43-58)
    sizes, args = parse_args([0])
    from recursive_snark import NonTrivialCircuit
    from nova_tpu.nova.circuit import TrivialCircuit

    configs = [("snark", None, None, {})]
    if not args.quick:
        configs.append(
            ("ppsnark", PP, PP,
             {"ck_hint1": PP.ck_floor, "ck_hint2": PP.ck_floor})
        )
    for lg in sizes:
        c = TrivialCircuit() if lg == 0 else NonTrivialCircuit(1 << lg)
        z0 = [0] if lg == 0 else [2]
        for name, S1, S2, hints in configs:
            pp = PublicParams.setup(PallasEngine, VestaEngine, c, **hints)
            rs = RecursiveSNARK.new(pp, c, z0)
            rs.prove_step(pp, c)
            rs.prove_step(pp, c)
            pk, vk = CompressedSNARK.setup(pp, S1=S1, S2=S2)
            t = timeit(lambda: CompressedSNARK.prove(pp, pk, rs))
            proof = CompressedSNARK.prove(pp, pk, rs)
            tv = timeit(lambda: proof.verify(vk, rs.i, z0))
            emit("compressed-snark", f"{name} cons={pp.num_constraints()}", t,
                 {"prove_s": round(t, 2), "verify_s": round(tv, 2)})


if __name__ == "__main__":
    main()
