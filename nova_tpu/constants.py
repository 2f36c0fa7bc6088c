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

DEVICE_THRESHOLD = int(_os.environ.get("NOVA_DEVICE_THRESHOLD", str(1 << 17)))

# Crossover for the fully device-resident fold pipeline (FVec state, fused
# commit_T program, Montgomery-scalar MSM). Lower than DEVICE_THRESHOLD:
# the fused path pays ~2 dispatches per cross-term instead of ~10 eager
# kernel calls, so it wins already at augmented-circuit size (2^14).
FOLD_DEVICE_THRESHOLD = int(
    _os.environ.get("NOVA_FOLD_DEVICE_THRESHOLD", str(1 << 13))
)
