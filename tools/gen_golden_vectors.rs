//! Golden-vector generator for the bit-exactness harness
//! (tests/test_bitexact.py). Build INSIDE a checkout of the reference
//! (microsoft/Nova, nova-snark) as an example:
//!
//!     cp tools/gen_golden_vectors.rs <nova>/examples/gen_golden_vectors.rs
//!     cd <nova> && cargo run --release --example gen_golden_vectors \
//!         > golden_vectors.json
//!     cp golden_vectors.json <nova_tpu>/tests/vectors/
//!
//! Emits JSON with (all DETERMINISTIC artifacts — the reference's NIFS
//! and IVC provers sample ZK blinds from OsRng internally, so vectors
//! pin the deterministic layers those build on):
//!   - "from_label": first 4 generators of label b"ck" per curve — pins
//!     Shake256 XOF blocking + halo2curves hash_to_curve
//!     (src/provider/traits.rs:249-293).
//!   - "poseidon_ro": absorb [0..k) (k = 1, 7, 33), squeeze
//!     NUM_HASH_BITS — pins the Poseidon RO end to end.
//!   - "pp_digest": PublicParams digest for the TrivialCircuit pair on
//!     Pallas/Vesta — pins shapes, key derivation, constants and the
//!     digest serialization in one scalar.
//!   - "nifs": tiny cubic R1CS (src/r1cs/mod.rs test fixture), fixed
//!     witnesses x=5 / x=9, EXPLICIT blinds (7, 9) and r_T = 3:
//!     comm_T from S::commit_T plus the NIFS folding challenge r
//!     recomputed transcript-for-transcript (src/nova/nifs.rs:36-74).
//!
//! The TPU build cannot run this (no Rust toolchain, zero egress) —
//! committed so the vectors can be produced the moment a reference
//! toolchain is available, making tests/test_bitexact.py go live.

use ff::{Field, PrimeField};
use nova_snark::{
  constants::{NUM_CHALLENGE_BITS, NUM_HASH_BITS},
  gadgets::utils::scalar_as_base,
  provider::{
    Bn256EngineKZG, GrumpkinEngine, PallasEngine, Secp256k1Engine, Secq256k1Engine, VestaEngine,
  },
  r1cs::{R1CSInstance, R1CSShape, RelaxedR1CSInstance, RelaxedR1CSWitness, SparseMatrix},
  traits::{
    circuit::TrivialCircuit,
    commitment::CommitmentEngineTrait,
    snark::default_ck_hint,
    AbsorbInROTrait, Engine, ROConstants, ROTrait,
  },
};

fn hex_repr<F: PrimeField>(x: &F) -> String {
  // canonical big-endian hex of the field element
  let mut b = x.to_repr().as_ref().to_vec();
  b.reverse();
  format!("0x{}", b.iter().map(|v| format!("{v:02x}")).collect::<String>())
}

fn from_label_vectors<E: Engine>(n: usize) -> Vec<(String, String)>
where
  E::GE: nova_snark::provider::traits::DlogGroup,
{
  use nova_snark::provider::traits::DlogGroup;
  <E::GE as DlogGroup>::from_label(b"ck", n)
    .iter()
    .map(|aff| {
      let (x, y, _inf) = <E::GE as DlogGroup>::group(aff).to_coordinates();
      (hex_repr(&x), hex_repr(&y))
    })
    .collect()
}

fn poseidon_cases<E: Engine>(engine_name: &str, out: &mut Vec<String>) {
  for k in [1usize, 7, 33] {
    let mut ro = E::RO::new(ROConstants::<E>::default());
    for i in 0..k {
      ro.absorb(E::Base::from(i as u64));
    }
    let h = ro.squeeze(NUM_HASH_BITS, false);
    out.push(format!(
      "{{\"engine\": \"{engine_name}\", \"absorb_count\": {k}, \"squeeze\": \"{}\"}}",
      hex_repr(&h)
    ));
  }
}

type E1 = PallasEngine;
type Fr = <E1 as Engine>::Scalar;

fn tiny_r1cs(num_vars: usize) -> R1CSShape<E1> {
  // the cubic x^3 + x + 5 = y fixture, matching src/r1cs/mod.rs tests
  let one = Fr::ONE;
  let num_cons = 4;
  let num_io = 2;
  let mut a: Vec<(usize, usize, Fr)> = Vec::new();
  let mut b: Vec<(usize, usize, Fr)> = Vec::new();
  let mut c: Vec<(usize, usize, Fr)> = Vec::new();
  a.push((0, num_vars + 1, one));
  b.push((0, num_vars + 1, one));
  c.push((0, 0, one));
  a.push((1, 0, one));
  b.push((1, num_vars + 1, one));
  c.push((1, 1, one));
  a.push((2, 1, one));
  a.push((2, num_vars + 1, one));
  b.push((2, num_vars, one));
  c.push((2, 2, one));
  a.push((3, 2, one));
  a.push((3, num_vars, Fr::from(5u64)));
  b.push((3, num_vars, one));
  c.push((3, num_vars + 2, one));
  let rows = num_cons;
  let cols = num_vars + num_io + 1;
  R1CSShape::new(
    num_cons,
    num_vars,
    num_io,
    SparseMatrix::new(&a, rows, cols),
    SparseMatrix::new(&b, rows, cols),
    SparseMatrix::new(&c, rows, cols),
  )
  .unwrap()
}

fn main() {
  // -- from_label generators ------------------------------------------------
  let mut fl = String::new();
  fl.push_str(&format!(
    "\"pallas\": {:?}, ",
    from_label_vectors::<PallasEngine>(4)
  ));
  fl.push_str(&format!(
    "\"vesta\": {:?}, ",
    from_label_vectors::<VestaEngine>(4)
  ));
  fl.push_str(&format!(
    "\"bn254\": {:?}, ",
    from_label_vectors::<Bn256EngineKZG>(4)
  ));
  fl.push_str(&format!(
    "\"grumpkin\": {:?}, ",
    from_label_vectors::<GrumpkinEngine>(4)
  ));
  fl.push_str(&format!(
    "\"secp256k1\": {:?}, ",
    from_label_vectors::<Secp256k1Engine>(4)
  ));
  fl.push_str(&format!(
    "\"secq256k1\": {:?}",
    from_label_vectors::<Secq256k1Engine>(4)
  ));
  // tuples debug-print as ("x", "y") — patch to JSON arrays
  let fl = fl.replace('(', "[").replace(')', "]");

  // -- Poseidon RO squeezes -------------------------------------------------
  let mut ro_cases = Vec::new();
  poseidon_cases::<PallasEngine>("PallasEngine", &mut ro_cases);
  poseidon_cases::<VestaEngine>("VestaEngine", &mut ro_cases);
  poseidon_cases::<Bn256EngineKZG>("Bn256EngineKZG", &mut ro_cases);
  poseidon_cases::<GrumpkinEngine>("GrumpkinEngine", &mut ro_cases);

  // -- PublicParams digest (pins shapes + ck + constants + serialization) ---
  let pp = nova_snark::nova::PublicParams::<
    PallasEngine,
    VestaEngine,
    TrivialCircuit<Fr>,
  >::setup(
    &TrivialCircuit::default(),
    &*default_ck_hint(),
    &*default_ck_hint(),
  )
  .unwrap();
  let pp_digest = pp.digest();

  // -- NIFS fold of the tiny cubic R1CS with explicit blinds ----------------
  let s = tiny_r1cs(4);
  let ck = R1CSShape::commitment_key(&[&s], &[&*default_ck_hint()]).unwrap();
  let ro_consts = ROConstants::<E1>::default();

  // witness for x: vars = [x^2, x^3, x^3 + x], io = [x, x^3 + x + 5]
  let wit = |x: u64| -> (Vec<Fr>, Vec<Fr>) {
    let x = Fr::from(x);
    let z0 = x * x;
    let z1 = z0 * x;
    let z2 = z1 + x;
    (vec![z0, z1, z2, Fr::ZERO], vec![x, z2 + Fr::from(5u64)])
  };
  let (w1, x1) = wit(5);
  let (w2, x2) = wit(9);
  let r_w1 = Fr::from(7u64);
  let r_w2 = Fr::from(9u64);
  let r_t = Fr::from(3u64);

  let comm_w1 = <E1 as Engine>::CE::commit(&ck, &w1, &r_w1);
  let comm_w2 = <E1 as Engine>::CE::commit(&ck, &w2, &r_w2);
  let u1 = R1CSInstance::new(&s, &comm_w1, &x1).unwrap();
  let u2 = R1CSInstance::new(&s, &comm_w2, &x2).unwrap();

  // relaxed (U1, W1); R1CSWitness::new samples a random blind internally,
  // so construct the relaxed witness from the raw vector with our blind
  let r_u1 = RelaxedR1CSInstance::from_r1cs_instance(&ck, &s, &u1);
  let mut r_w1_relaxed = RelaxedR1CSWitness::<E1>::default(&s);
  // fold the default (zero) relaxed witness manually is intrusive; instead
  // reconstruct via the public fold with r = 1:
  //   (0-relaxed) fold (W1, r_W1) at r=1 gives W = W1, E = 0.
  // RelaxedR1CSWitness::fold(W2: &R1CSWitness, T, r_T, r) is public.
  {
    let w1_struct = r1cs_witness_with_blind(&s, &w1, r_w1);
    // T for folding the zero relaxed witness with (U1, W1) is all-zeros:
    let t = vec![Fr::ZERO; s.num_cons()];
    r_w1_relaxed = r_w1_relaxed
      .fold(&w1_struct, &t, &Fr::ZERO, &Fr::ONE)
      .unwrap();
  }
  // NOTE: from_r1cs_instance folds at "r=1" semantics only if it is defined
  // that way in this reference; if it instead just wraps (comm_W, X, u=1),
  // the two agree. Verified by is_sat below.
  assert!(s.is_sat_relaxed(&ck, &r_u1, &r_w1_relaxed).is_ok());

  let w2_struct = r1cs_witness_with_blind(&s, &w2, r_w2);
  let (t, comm_t) = s
    .commit_T(&ck, &r_u1, &r_w1_relaxed, &u2, &w2_struct, &r_t)
    .unwrap();
  let _ = t;

  // folding challenge r, transcript-for-transcript with NIFS::prove
  // (src/nova/nifs.rs:47-63; base_as_scalar of the 128-bit squeeze)
  let pp_digest_nifs = Fr::ZERO;
  let mut ro = <E1 as Engine>::RO::new(ro_consts.clone());
  ro.absorb(scalar_as_base::<E1>(pp_digest_nifs));
  u2.absorb_in_ro(&mut ro);
  comm_t.absorb_in_ro(&mut ro);
  let r = nova_snark::gadgets::utils::base_as_scalar::<E1>(
    ro.squeeze(NUM_CHALLENGE_BITS, false),
  );

  let (ct_x, ct_y, _) =
    nova_snark::traits::commitment::CommitmentTrait::<E1>::to_coordinates(&comm_t);

  println!("{{");
  println!("  \"from_label\": {{{fl}}},");
  println!("  \"poseidon_ro\": [{}],", ro_cases.join(", "));
  println!("  \"pp_digest_trivial_pallas\": \"{}\",", hex_repr(&pp_digest));
  println!("  \"nifs\": {{");
  println!("    \"pp_digest\": \"{}\",", hex_repr(&pp_digest_nifs));
  println!("    \"r_W1\": \"{}\", \"r_W2\": \"{}\", \"r_T\": \"{}\",", hex_repr(&r_w1), hex_repr(&r_w2), hex_repr(&r_t));
  println!("    \"comm_T_x\": \"{}\",", hex_repr(&ct_x));
  println!("    \"comm_T_y\": \"{}\",", hex_repr(&ct_y));
  println!("    \"r\": \"{}\"", hex_repr(&r));
  println!("  }}");
  println!("}}");
}

/// R1CSWitness with an explicit blind. R1CSWitness::new samples OsRng, so
/// round-trip through serde to set a pinned blind.
fn r1cs_witness_with_blind(
  s: &R1CSShape<E1>,
  w: &[Fr],
  blind: Fr,
) -> nova_snark::r1cs::R1CSWitness<E1> {
  // R1CSWitness is Serialize/Deserialize with fields (W, r_W); construct
  // via JSON so the crate-private fields can be set deterministically.
  let mut wv = w.to_vec();
  wv.resize(s.num_vars(), Fr::ZERO);
  let json = format!(
    "{{\"W\": {}, \"r_W\": {}}}",
    serde_json::to_string(&wv).unwrap(),
    serde_json::to_string(&blind).unwrap()
  );
  serde_json::from_str(&json).unwrap()
}
