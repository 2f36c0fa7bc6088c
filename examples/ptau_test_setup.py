"""Generate an INSECURE test Powers-of-Tau file
(reference: examples/ptau_test_setup.rs).

Usage: python examples/ptau_test_setup.py <power> [output_dir]
"""

import os
import secrets
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nova_tpu._env import apply_platform_env

apply_platform_env()

from nova_tpu.curves.spec import bn254
from nova_tpu.provider import ptau


def main():
    power = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "."
    path = os.path.join(out_dir, f"ppot_pruned_{power:02d}.ptau")
    tau = secrets.randbelow(bn254.scalar.p)
    print(f"writing INSECURE test SRS (power {power}) to {path} ...")
    ptau.write_test_ptau(path, tau, power)
    ptau.check_sanity_of_ptau_file(path, (1 << power), 2)
    print(f"ok: {os.path.getsize(path)} bytes")


if __name__ == "__main__":
    main()
