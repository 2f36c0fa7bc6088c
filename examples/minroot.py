"""MinRoot VDF IVC example (reference: examples/minroot.rs).

Each step verifies `iters_per_step` MinRoot iterations
  x_{i+1} = (x_i + y_i)^{1/5},  y_{i+1} = x_i
using non-deterministic advice: the fifth root is allocated as advice and
the circuit checks x_{i+1}^5 = x_i + y_i (5 constraints per iteration).

Run:  python examples/minroot.py [iters_per_step] [num_steps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nova_tpu._env import apply_platform_env

apply_platform_env()

from nova_tpu.frontend.constraint_system import ONE, lc
from nova_tpu.frontend.num import AllocatedNum
from nova_tpu.nova.circuit import StepCircuit
from nova_tpu.nova.compressed import CompressedSNARK
from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK
from nova_tpu.provider.engines import PallasEngine, VestaEngine


class MinRootIteration:
    def __init__(self, x_i, y_i, x_next, y_next):
        self.x_i, self.y_i = x_i, y_i
        self.x_i_plus_1, self.y_i_plus_1 = x_next, y_next

    @staticmethod
    def seq(field, num_iters, x0, y0):
        p = field.p
        exp = (pow(5, p - 2, p) * (p - 3)) % p
        out = []
        x_i, y_i = x0, y0
        for _ in range(num_iters):
            x_next = pow((x_i + y_i) % p, exp, p)
            assert pow(x_next, 5, p) == (x_i + y_i) % p
            out.append(MinRootIteration(x_i, y_i, x_next, x_i))
            x_i, y_i = x_next, x_i
        return [x0, y0], out


class MinRootCircuit(StepCircuit):
    def __init__(self, seq):
        self.seq = seq

    def arity(self):
        return 2

    def synthesize(self, cs, z):
        if not self.seq:
            return list(z)
        f = cs.field
        x_i, y_i = z[0], z[1]
        for k in range(len(self.seq)):
            x_next = AllocatedNum.alloc(cs, lambda k=k: self.seq[k].x_i_plus_1)
            sq = x_next.square(cs)
            quad = sq.square(cs)
            # quad * x_next = x_i + y_i
            cs.enforce(
                lc((1, quad.get_variable())),
                lc((1, x_next.get_variable())),
                lc((1, x_i.get_variable()), (1, y_i.get_variable())),
            )
            x_i, y_i = x_next, x_i
        return [x_i, y_i]


def main():
    iters_per_step = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    num_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    e1, e2 = PallasEngine, VestaEngine
    f = e1.scalar

    print(f"MinRoot IVC: {iters_per_step} iters/step x {num_steps} steps")

    # produce all advice up front (examples/minroot.rs:142-180)
    z0, all_iters = MinRootIteration.seq(
        f, iters_per_step * num_steps, 2, 3
    )
    circuits = [
        MinRootCircuit(all_iters[i * iters_per_step : (i + 1) * iters_per_step])
        for i in range(num_steps)
    ]

    t = time.time()
    pp = PublicParams.setup(e1, e2, circuits[0])
    print(f"PublicParams::setup  {time.time()-t:.2f}s  "
          f"constraints {pp.num_constraints()}")

    t = time.time()
    rs = RecursiveSNARK.new(pp, circuits[0], z0)
    print(f"RecursiveSNARK::new  {time.time()-t:.2f}s")

    for i, c in enumerate(circuits):
        t = time.time()
        rs.prove_step(pp, c)
        print(f"prove_step {i}  {time.time()-t:.2f}s")

    t = time.time()
    zn = rs.verify(pp, num_steps, z0)
    print(f"RecursiveSNARK::verify  {time.time()-t:.2f}s  z_n={zn}")

    t = time.time()
    pk, vk = CompressedSNARK.setup(pp)
    print(f"CompressedSNARK::setup  {time.time()-t:.2f}s")
    t = time.time()
    proof = CompressedSNARK.prove(pp, pk, rs)
    print(f"CompressedSNARK::prove  {time.time()-t:.2f}s")
    t = time.time()
    proof.verify(vk, num_steps, z0)
    print(f"CompressedSNARK::verify  {time.time()-t:.2f}s")
    print("OK")


if __name__ == "__main__":
    main()
