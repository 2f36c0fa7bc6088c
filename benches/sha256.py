"""SHA-256 step-circuit bench (reference benches/sha256.rs): single-step
prove over message sizes."""

from common import emit, force_cpu_if_no_accel, parse_args, timeit

force_cpu_if_no_accel()

from nova_tpu.frontend.sha256 import sha256 as sha256_gadget
from nova_tpu.frontend.boolean import AllocatedBit, Boolean
from nova_tpu.nova.circuit import StepCircuit
from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK
from nova_tpu.provider.engines import PallasEngine, VestaEngine


class Sha256Circuit(StepCircuit):
    def __init__(self, msg_len: int):
        self.msg_len = msg_len

    def arity(self):
        return 1

    def synthesize(self, cs, z):
        bits = [
            Boolean.from_bit(AllocatedBit.alloc(cs, (lambda: False)))
            for _ in range(self.msg_len * 8)
        ]
        sha256_gadget(cs, bits)
        return [z[0]]


def main():
    sizes, _ = parse_args([64, 128])
    for n in sizes:
        c = Sha256Circuit(n)
        pp = PublicParams.setup(PallasEngine, VestaEngine, c)
        rs = RecursiveSNARK.new(pp, c, [0])
        rs.prove_step(pp, c)
        rs.prove_step(pp, c)
        dt = timeit(lambda: rs.prove_step(pp, c))
        emit("sha256", f"{n}B message", dt,
             {"constraints": pp.num_constraints()[0],
              "prove_step_ms": round(dt * 1e3, 1)})


if __name__ == "__main__":
    main()
