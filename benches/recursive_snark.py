"""RecursiveSNARK prove_step/verify grid (reference
benches/recursive-snark.rs:37-53): augmented-circuit sizes from the base
~10k constraints up, by padding the step circuit."""

from common import emit, force_cpu_if_no_accel, parse_args, timeit

force_cpu_if_no_accel()

from nova_tpu.frontend.constraint_system import ONE, lc
from nova_tpu.frontend.num import AllocatedNum
from nova_tpu.nova.circuit import StepCircuit
from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK
from nova_tpu.provider.engines import PallasEngine, VestaEngine


class NonTrivialCircuit(StepCircuit):
    """num_cons extra constraints: y_{i+1} = y_i^2 chains
    (reference bench circuit)."""

    def __init__(self, num_cons: int):
        self.num_cons = num_cons

    def arity(self):
        return 1

    def synthesize(self, cs, z):
        x = z[0]
        y = x
        for _ in range(self.num_cons):
            y = y.square(cs)
        return [y]


def main():
    sizes, _ = parse_args([0, 13, 14])  # extra-constraint log2 (0 = minimal)
    for lg in sizes:
        extra = 0 if lg == 0 else 1 << lg
        c = NonTrivialCircuit(max(extra, 1))
        pp = PublicParams.setup(PallasEngine, VestaEngine, c)
        num_cons = pp.num_constraints()
        rs = RecursiveSNARK.new(pp, c, [2])
        rs.prove_step(pp, c)
        rs.prove_step(pp, c)  # warm
        dt = timeit(lambda: rs.prove_step(pp, c))
        dv = timeit(lambda: rs.verify(pp, rs.i, [2]))
        emit("recursive-snark", f"cons={num_cons}", dt,
             {"prove_step_ms": round(dt * 1e3, 1),
              "verify_ms": round(dv * 1e3, 1)})


if __name__ == "__main__":
    main()
