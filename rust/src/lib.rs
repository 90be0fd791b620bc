//! FFI bindings for libblitzar_tpu.so (ABI of cbindings/blitzar_tpu_api.h,
//! which mirrors the upstream blitzar C API). Hand-written equivalent of a
//! bindgen run over the header.

#![allow(non_camel_case_types)]

pub mod bindings;
pub use bindings::*;

#[cfg(test)]
mod tests {
    use super::*;

    /// Port of the upstream sys-crate end-to-end test (reference
    /// rust/tests/src/main.rs:26-48): hardcoded commitment bytes.
    #[test]
    fn pedersen_commitments_match_hardcoded_vectors() {
        let config = sxt_config {
            backend: SXT_CPU_BACKEND,
            num_precomputed_generators: 4,
        };
        unsafe {
            assert_eq!(sxt_init(&config), 0);
        }

        let data: [[u32; 4]; 3] = [
            [2000, 7500, 5000, 1500],
            [5000, 0, 400000, 10],
            [7000, 7500, 405000, 1510],
        ];
        let descriptors: Vec<sxt_sequence_descriptor> = data
            .iter()
            .map(|row| sxt_sequence_descriptor {
                element_nbytes: 4,
                n: 4,
                data: row.as_ptr() as *const u8,
                is_signed: 0,
            })
            .collect();
        let mut commitments = [sxt_ristretto255_compressed {
            ristretto_bytes: [0u8; 32],
        }; 3];
        unsafe {
            sxt_curve25519_compute_pedersen_commitments(
                commitments.as_mut_ptr(),
                3,
                descriptors.as_ptr(),
                0,
            );
        }
        let expected: [[u8; 32]; 3] = [
            [
                4, 105, 58, 131, 59, 69, 150, 106, 120, 137, 32, 225, 175, 244,
                82, 115, 216, 180, 206, 150, 21, 250, 240, 98, 251, 192, 146,
                244, 54, 169, 199, 97,
            ],
            [
                2, 254, 178, 195, 198, 238, 44, 156, 24, 29, 88, 196, 37, 63,
                157, 50, 236, 159, 61, 49, 153, 181, 79, 126, 55, 188, 67, 1,
                228, 248, 72, 51,
            ],
            [
                30, 237, 163, 234, 252, 111, 45, 133, 235, 227, 21, 117, 229,
                188, 88, 149, 240, 109, 205, 90, 6, 130, 199, 152, 5, 221, 57,
                231, 168, 9, 141, 122,
            ],
        ];
        for i in 0..3 {
            assert_eq!(commitments[i].ristretto_bytes, expected[i]);
        }
    }
}
