"""Commitment/MSM grid (reference benches/commit.rs:24-80): sizes
2^20-2^24 x scalar widths {1, 10, 16, 32, 64, 256} bits. Default sizes
here are trimmed to 2^16-2^20 for single-core runs; pass --sizes to
match the reference grid exactly."""

from common import emit, force_cpu_if_no_accel, parse_args, rng, timeit

force_cpu_if_no_accel()

from nova_tpu.curves.spec import pallas
from nova_tpu.provider.pedersen import CommitmentEngine, CommitmentKey, from_label


def main():
    sizes, _ = parse_args([16, 18, 20])
    n_max = 1 << max(sizes)
    gens = from_label(pallas, b"bench-commit", n_max + 1)
    ck = CommitmentKey(pallas, gens[1:], gens[0])
    r = rng()
    for lg in sizes:
        n = 1 << lg
        for bits in (1, 10, 16, 32, 64, 256):
            bound = pallas.scalar.p if bits == 256 else (1 << bits)
            v = [r.randrange(bound) for _ in range(n)]
            CommitmentEngine.commit(ck, v, 0)  # warm
            dt = timeit(lambda: CommitmentEngine.commit(ck, v, 0))
            emit("commit", f"2^{lg}/u{bits}", dt,
                 {"points_per_sec": round(n / dt)})


if __name__ == "__main__":
    main()
