"""Prune a full PPOT ceremony file to header + 2^power+1 G1 + 2 G2 points
(~18x smaller; reference: examples/ppot_prune.rs).

Usage: python examples/ppot_prune.py <src.ptau> <power> [output_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nova_tpu._env import apply_platform_env

apply_platform_env()

from nova_tpu.provider import ptau


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    src = sys.argv[1]
    power = int(sys.argv[2])
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "."
    dst = os.path.join(out_dir, f"ppot_pruned_{power:02d}.ptau")
    print(f"pruning {src} -> {dst} (power {power}) ...")
    ptau.prune_ptau(src, dst, power)
    print(f"ok: {os.path.getsize(dst)} bytes")


if __name__ == "__main__":
    main()
