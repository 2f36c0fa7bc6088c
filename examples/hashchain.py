"""Poseidon hash-chain IVC example (reference: examples/hashchain.rs).

Each step absorbs the running digest plus num_elts_per_step fresh field
elements into a width-24 Poseidon sponge and squeezes the next digest.

Run: python examples/hashchain.py [num_elts_per_step] [num_steps]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nova_tpu._env import apply_platform_env

apply_platform_env()

from nova_tpu.frontend.num import AllocatedNum
from nova_tpu.gadgets.poseidon_circuit import Elt, sponge_hash_circuit
from nova_tpu.nova.circuit import StepCircuit
from nova_tpu.nova.ivc import PublicParams, RecursiveSNARK
from nova_tpu.provider.engines import PallasEngine, VestaEngine
from nova_tpu.provider.poseidon import api_constants, sponge_hash

rng = random.Random(0xC4A1)


class HashChainCircuit(StepCircuit):
    def __init__(self, field, x_i):
        self.field = field
        self.x_i = x_i
        self._consts = api_constants(field, 24)

    @staticmethod
    def random(field, num_elts):
        return HashChainCircuit(field, [rng.randrange(field.p) for _ in range(num_elts)])

    def arity(self):
        return 1

    def synthesize(self, cs, z_in):
        assert len(z_in) == 1
        xs = [
            AllocatedNum.alloc(cs, lambda i=i: self.x_i[i])
            for i in range(len(self.x_i))
        ]
        elts = [Elt.from_allocated(e) for e in list(z_in) + xs]
        z_out = sponge_hash_circuit(cs, self._consts, elts)
        return [z_out]

    def native_digest(self, acc):
        return sponge_hash(self._consts, [acc] + list(self.x_i))


def main():
    num_elts = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    num_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    e1, e2 = PallasEngine, VestaEngine
    f = e1.scalar

    print(f"HashChain IVC: {num_elts} elts/step x {num_steps} steps")
    circuits = [HashChainCircuit.random(f, num_elts) for _ in range(num_steps)]

    t = time.time()
    pp = PublicParams.setup(e1, e2, circuits[0])
    print(f"setup {time.time()-t:.2f}s constraints {pp.num_constraints()}")

    t = time.time()
    rs = RecursiveSNARK.new(pp, circuits[0], [0])
    for c in circuits:
        rs.prove_step(pp, c)
    print(f"prove {time.time()-t:.2f}s")

    zn = rs.verify(pp, num_steps, [0])

    # recompute the chain natively
    acc = 0
    for c in circuits:
        acc = c.native_digest(acc)
    assert zn == [acc], "digest mismatch"
    print("digest matches native recomputation; OK")


if __name__ == "__main__":
    main()
