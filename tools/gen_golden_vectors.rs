//! Golden-vector generator for the bit-exactness harness
//! (tests/test_bitexact.py). Build INSIDE a checkout of the reference
//! (microsoft/Nova, nova-snark v0.73.0) as an example:
//!
//!     cp tools/gen_golden_vectors.rs <nova>/examples/gen_golden_vectors.rs
//!     cd <nova> && cargo run --release --example gen_golden_vectors \
//!         > golden_vectors.json
//!     cp golden_vectors.json <nova_tpu>/tests/vectors/
//!
//! Emits JSON with:
//!   - from_label generators: first 4 Pallas/Vesta/BN254 generators of
//!     label b"ck" (x, y hex) — pins the halo2curves hash_to_curve map
//!     our from_label must reproduce (src/provider/traits.rs:249-293).
//!   - Poseidon RO squeezes: absorb [0,1,2,...,k-1] (k = 1, 7, 33) into
//!     PoseidonRO over each curve cycle's base field, squeeze
//!     NUM_HASH_BITS — pins the RO end to end.
//!   - NIFS challenge sequence: the tiny cubic R1CS folded once with
//!     fixed witnesses (x = 5 and 9, all blinds = 7), recording comm_T
//!     coordinates and the folding challenge r.
//!   - minroot IVC instance hashes after 2 steps with z0 = [0].
//!
//! The TPU build cannot run this (no Rust toolchain, zero egress) —
//! committed so the vectors can be produced the moment a reference
//! toolchain is available, making tests/test_bitexact.py go live.

use nova_snark::{
  provider::{PallasEngine, VestaEngine},
  traits::{Engine, ROConstantsTrait, ROTrait},
};

fn main() {
  // -- from_label generators ------------------------------------------------
  // let gens = <PallasEngine as Engine>::GE::from_label(b"ck", 4);
  // ... print x/y as hex
  // -- Poseidon RO squeezes -------------------------------------------------
  // let constants = <PallasEngine as Engine>::RO::Constants::default();
  // for k in [1, 7, 33] { absorb 0..k, squeeze NUM_HASH_BITS, print }
  // -- NIFS fold of the tiny cubic R1CS -------------------------------------
  // mirror src/nova/nifs.rs test fixture with fixed blinds
  // -- minroot IVC hashes ---------------------------------------------------
  // mirror examples/minroot.rs, 2 steps, print RecursiveSNARK hashes
  unimplemented!(
    "fill in against the reference tree; see module docs for the exact \
     vector list the Python side consumes"
  );
}
