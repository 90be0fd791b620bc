//! Hand-written FFI declarations for cbindings/blitzar_tpu_api.h.

use std::os::raw::{c_char, c_int, c_uint, c_void};

pub const SXT_CPU_BACKEND: c_int = 1;
pub const SXT_GPU_BACKEND: c_int = 2;

pub const SXT_CURVE_RISTRETTO255: c_uint = 0;
pub const SXT_CURVE_BLS_381: c_uint = 1;
pub const SXT_CURVE_BN_254: c_uint = 2;
pub const SXT_CURVE_GRUMPKIN: c_uint = 3;

pub const SXT_FIELD_SCALAR255: c_uint = 0;
pub const SXT_FIELD_GRUMPKIN: c_uint = 1;

#[repr(C)]
pub struct sxt_config {
    pub backend: c_int,
    pub num_precomputed_generators: u64,
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct sxt_ristretto255_compressed {
    pub ristretto_bytes: [u8; 32],
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct sxt_bls12_381_g1_compressed {
    pub g1_bytes: [u8; 48],
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct sxt_curve25519_scalar {
    pub bytes: [u8; 32],
}

#[repr(C)]
pub struct sxt_transcript {
    pub bytes: [u8; 203],
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct sxt_ristretto255 {
    pub x: [u64; 5],
    pub y: [u64; 5],
    pub z: [u64; 5],
    pub t: [u64; 5],
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct sxt_bls12_381_g1 {
    pub x: [u64; 6],
    pub y: [u64; 6],
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct sxt_bls12_381_g1_p2 {
    pub x: [u64; 6],
    pub y: [u64; 6],
    pub z: [u64; 6],
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct sxt_bn254_g1 {
    pub x: [u64; 4],
    pub y: [u64; 4],
    pub infinity: u8,
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct sxt_bn254_g1_p2 {
    pub x: [u64; 4],
    pub y: [u64; 4],
    pub z: [u64; 4],
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct sxt_grumpkin {
    pub x: [u64; 4],
    pub y: [u64; 4],
    pub infinity: u8,
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct sxt_grumpkin_p2 {
    pub x: [u64; 4],
    pub y: [u64; 4],
    pub z: [u64; 4],
}

#[repr(C)]
pub struct sxt_sequence_descriptor {
    pub element_nbytes: u8,
    pub n: u64,
    pub data: *const u8,
    pub is_signed: c_int,
}

#[repr(C)]
pub struct sumcheck_descriptor {
    pub mles: *const c_void,
    pub product_table: *const c_void,
    pub product_terms: *const c_uint,
    pub n: c_uint,
    pub num_mles: c_uint,
    pub num_products: c_uint,
    pub num_product_terms: c_uint,
    pub round_degree: c_uint,
}

#[repr(C)]
pub struct sxt_multiexp_handle {
    _unused: [u8; 0],
}

extern "C" {
    pub fn sxt_init(config: *const sxt_config) -> c_int;

    pub fn sxt_curve25519_compute_pedersen_commitments(
        commitments: *mut sxt_ristretto255_compressed,
        num_sequences: u32,
        descriptors: *const sxt_sequence_descriptor,
        offset_generators: u64,
    );

    pub fn sxt_curve25519_compute_pedersen_commitments_with_generators(
        commitments: *mut sxt_ristretto255_compressed,
        num_sequences: u32,
        descriptors: *const sxt_sequence_descriptor,
        generators: *const sxt_ristretto255,
    );

    pub fn sxt_bls12_381_g1_compute_pedersen_commitments_with_generators(
        commitments: *mut sxt_bls12_381_g1_compressed,
        num_sequences: u32,
        descriptors: *const sxt_sequence_descriptor,
        generators: *const sxt_bls12_381_g1,
    );

    pub fn sxt_bn254_g1_uncompressed_compute_pedersen_commitments_with_generators(
        commitments: *mut sxt_bn254_g1,
        num_sequences: u32,
        descriptors: *const sxt_sequence_descriptor,
        generators: *const sxt_bn254_g1,
    );

    pub fn sxt_grumpkin_uncompressed_compute_pedersen_commitments_with_generators(
        commitments: *mut sxt_grumpkin,
        num_sequences: u32,
        descriptors: *const sxt_sequence_descriptor,
        generators: *const sxt_grumpkin,
    );

    pub fn sxt_ristretto255_get_generators(
        generators: *mut sxt_ristretto255,
        offset_generators: u64,
        num_generators: u64,
    ) -> c_int;

    pub fn sxt_curve25519_get_one_commit(
        one_commit: *mut sxt_ristretto255,
        n: u64,
    ) -> c_int;

    pub fn sxt_curve25519_prove_inner_product(
        l_vector: *mut sxt_ristretto255_compressed,
        r_vector: *mut sxt_ristretto255_compressed,
        ap_value: *mut sxt_curve25519_scalar,
        transcript: *mut sxt_transcript,
        n: u64,
        generators_offset: u64,
        a_vector: *const sxt_curve25519_scalar,
        b_vector: *const sxt_curve25519_scalar,
    );

    pub fn sxt_curve25519_verify_inner_product(
        transcript: *mut sxt_transcript,
        n: u64,
        generators_offset: u64,
        b_vector: *const sxt_curve25519_scalar,
        product: *const sxt_curve25519_scalar,
        a_commit: *const sxt_ristretto255,
        l_vector: *const sxt_ristretto255_compressed,
        r_vector: *const sxt_ristretto255_compressed,
        ap_value: *const sxt_curve25519_scalar,
    ) -> c_int;

    pub fn sxt_multiexp_handle_new(
        curve_id: c_uint,
        generators: *const c_void,
        n: c_uint,
    ) -> *mut sxt_multiexp_handle;

    pub fn sxt_multiexp_handle_new_from_file(
        curve_id: c_uint,
        filename: *const c_char,
    ) -> *mut sxt_multiexp_handle;

    pub fn sxt_multiexp_handle_write_to_file(
        handle: *const sxt_multiexp_handle,
        filename: *const c_char,
    );

    pub fn sxt_multiexp_handle_free(handle: *mut sxt_multiexp_handle);

    pub fn sxt_fixed_multiexponentiation(
        res: *mut c_void,
        handle: *const sxt_multiexp_handle,
        element_num_bytes: c_uint,
        num_outputs: c_uint,
        n: c_uint,
        scalars: *const u8,
    );

    pub fn sxt_fixed_packed_multiexponentiation(
        res: *mut c_void,
        handle: *const sxt_multiexp_handle,
        output_bit_table: *const c_uint,
        num_outputs: c_uint,
        n: c_uint,
        scalars: *const u8,
    );

    pub fn sxt_fixed_vlen_multiexponentiation(
        res: *mut c_void,
        handle: *const sxt_multiexp_handle,
        output_bit_table: *const c_uint,
        output_lengths: *const c_uint,
        num_outputs: c_uint,
        scalars: *const u8,
    );

    pub fn sxt_prove_sumcheck(
        polynomials: *mut c_void,
        evaluation_point: *mut c_void,
        field_id: c_uint,
        descriptor: *const sumcheck_descriptor,
        transcript_callback: *mut c_void,
        transcript_context: *mut c_void,
    );
}
