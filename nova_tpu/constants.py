"""Protocol constants (reference: src/constants.rs:1-16)."""

# Number of bits used for challenge generation in the protocol.
NUM_CHALLENGE_BITS = 128

# Number of bits used for hash output sizing.
NUM_HASH_BITS = 250

# Width of each limb in the in-circuit bignat representation.
BN_LIMB_WIDTH = 64

# Number of limbs in the in-circuit bignat representation.
BN_N_LIMBS = 4

# Element count below which host-side (sequential) vector paths are used
# instead of dispatching to the TPU (dispatch overhead dominates below this).
# Vector-length crossover for dispatching commitments/folds to the TPU
# device kernels; below it the C++ host kernels (nova_tpu.native) win on
# latency. With the accelerator behind a network tunnel each dispatch costs
# ~0.5-2s, so the crossover sits high; on locally-attached chips it drops.
import os as _os

DEVICE_THRESHOLD = int(_os.environ.get("NOVA_DEVICE_THRESHOLD", str(1 << 16)))

# Crossover for the fully device-resident fold pipeline (FVec state, fused
# commit_T program, Montgomery-scalar MSM).
# Round-5 re-tune on the measured tunnel (PERFORMANCE.md round 5):
# the per-dispatch floor is ~25 ms and a fold step makes ~10 dependent
# dispatches, so device routing LOSES at augmented size (2^14): 592 ms
# device vs ~200 ms host (round-2 idle-box datum). The device MSM wins
# from ~2^16 up (81 ms vs ~226 ms host at 2^16). Crossovers sit there
# now; on locally-attached chips (no 25 ms floor) they drop.
FOLD_DEVICE_THRESHOLD = int(
    _os.environ.get("NOVA_FOLD_DEVICE_THRESHOLD", str(1 << 16))
)
