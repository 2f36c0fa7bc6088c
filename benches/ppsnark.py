"""DirectSNARK/ppsnark grid (reference benches/ppsnark.rs): NonTrivial
step circuit sizes, direct spark proof without IVC."""

from common import emit, force_cpu_if_no_accel, parse_args, timeit

force_cpu_if_no_accel()

from nova_tpu.provider.engines import PallasEngine
from nova_tpu.spartan.direct import DirectSNARK
from nova_tpu.spartan.ppsnark import RelaxedR1CSSNARK as PP
from recursive_snark import NonTrivialCircuit


def main():
    sizes, _ = parse_args([10, 12])
    for lg in sizes:
        c = NonTrivialCircuit(1 << lg)
        pk, vk = DirectSNARK.setup(PallasEngine, c, S_snark=PP)
        t = timeit(lambda: DirectSNARK.prove(PallasEngine, pk, c, [2], S_snark=PP))
        emit("ppsnark-direct", f"2^{lg} cons", t, {"prove_s": round(t, 2)})


if __name__ == "__main__":
    main()
