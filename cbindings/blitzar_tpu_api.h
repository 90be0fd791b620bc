/* blitzar_tpu C ABI — drop-in replacement for the upstream blitzar C API.
 *
 * Function names, argument lists, and struct layouts follow the upstream
 * contract (reference cbindings/blitzar_api.h) so existing consumers (e.g. a
 * Rust sys-crate) can relink against libblitzar_tpu.so unchanged. The
 * implementation forwards into the JAX/TPU runtime through an embedded
 * CPython bridge (blitzar_tpu/capi_bridge.py).
 */
#ifndef BLITZAR_TPU_API_H
#define BLITZAR_TPU_API_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define SXT_CPU_BACKEND 1
#define SXT_GPU_BACKEND 2

#define SXT_CURVE_RISTRETTO255 0
#define SXT_CURVE_BLS_381 1
#define SXT_CURVE_BN_254 2
#define SXT_CURVE_GRUMPKIN 3

#define SXT_FIELD_SCALAR255 0
#define SXT_FIELD_GRUMPKIN 1

struct sxt_config {
  int backend;
  uint64_t num_precomputed_generators;
};

struct sxt_ristretto255_compressed { uint8_t ristretto_bytes[32]; };
struct sxt_bls12_381_g1_compressed { uint8_t g1_bytes[48]; };
struct sxt_curve25519_scalar { uint8_t bytes[32]; };
struct sxt_transcript { uint8_t bytes[203]; };

/* curve25519 point, extended coordinates, radix-2^51 limbs */
struct sxt_ristretto255 { uint64_t X[5]; uint64_t Y[5]; uint64_t Z[5]; uint64_t T[5]; };
/* bls12-381 G1 affine / projective, Montgomery-form 64-bit limbs */
struct sxt_bls12_381_g1 { uint64_t X[6]; uint64_t Y[6]; };
struct sxt_bls12_381_g1_p2 { uint64_t X[6]; uint64_t Y[6]; uint64_t Z[6]; };
/* bn254 / grumpkin affine (+infinity flag) and projective */
struct sxt_bn254_g1 { uint64_t X[4]; uint64_t Y[4]; uint8_t infinity; };
struct sxt_bn254_g1_p2 { uint64_t X[4]; uint64_t Y[4]; uint64_t Z[4]; };
struct sxt_grumpkin { uint64_t X[4]; uint64_t Y[4]; uint8_t infinity; };
struct sxt_grumpkin_p2 { uint64_t X[4]; uint64_t Y[4]; uint64_t Z[4]; };

struct sxt_sequence_descriptor {
  uint8_t element_nbytes; /* power of 2, 1..32 */
  uint64_t n;
  const uint8_t* data;    /* n * element_nbytes little-endian bytes */
  int is_signed;          /* if set, element_nbytes must be <= 16 */
};

struct sumcheck_descriptor {
  const void* mles;           /* n x num_mles column-major FIELD matrix */
  const void* product_table;  /* num_products x {FIELD multiplier; unsigned len} */
  const unsigned* product_terms;
  unsigned n;
  unsigned num_mles;
  unsigned num_products;
  unsigned num_product_terms;
  unsigned round_degree;
};

struct sxt_multiexp_handle;

int sxt_init(const struct sxt_config* config);

void sxt_curve25519_compute_pedersen_commitments(
    struct sxt_ristretto255_compressed* commitments, uint32_t num_sequences,
    const struct sxt_sequence_descriptor* descriptors, uint64_t offset_generators);

void sxt_curve25519_compute_pedersen_commitments_with_generators(
    struct sxt_ristretto255_compressed* commitments, uint32_t num_sequences,
    const struct sxt_sequence_descriptor* descriptors,
    const struct sxt_ristretto255* generators);

void sxt_bls12_381_g1_compute_pedersen_commitments_with_generators(
    struct sxt_bls12_381_g1_compressed* commitments, uint32_t num_sequences,
    const struct sxt_sequence_descriptor* descriptors,
    const struct sxt_bls12_381_g1* generators);

void sxt_bn254_g1_uncompressed_compute_pedersen_commitments_with_generators(
    struct sxt_bn254_g1* commitments, uint32_t num_sequences,
    const struct sxt_sequence_descriptor* descriptors,
    const struct sxt_bn254_g1* generators);

void sxt_grumpkin_uncompressed_compute_pedersen_commitments_with_generators(
    struct sxt_grumpkin* commitments, uint32_t num_sequences,
    const struct sxt_sequence_descriptor* descriptors,
    const struct sxt_grumpkin* generators);

int sxt_ristretto255_get_generators(struct sxt_ristretto255* generators,
                                    uint64_t offset_generators, uint64_t num_generators);

int sxt_curve25519_get_one_commit(struct sxt_ristretto255* one_commit, uint64_t n);

void sxt_curve25519_prove_inner_product(
    struct sxt_ristretto255_compressed* l_vector,
    struct sxt_ristretto255_compressed* r_vector, struct sxt_curve25519_scalar* ap_value,
    struct sxt_transcript* transcript, uint64_t n, uint64_t generators_offset,
    const struct sxt_curve25519_scalar* a_vector,
    const struct sxt_curve25519_scalar* b_vector);

int sxt_curve25519_verify_inner_product(
    struct sxt_transcript* transcript, uint64_t n, uint64_t generators_offset,
    const struct sxt_curve25519_scalar* b_vector,
    const struct sxt_curve25519_scalar* product, const struct sxt_ristretto255* a_commit,
    const struct sxt_ristretto255_compressed* l_vector,
    const struct sxt_ristretto255_compressed* r_vector,
    const struct sxt_curve25519_scalar* ap_value);

struct sxt_multiexp_handle* sxt_multiexp_handle_new(unsigned curve_id,
                                                    const void* generators, unsigned n);
struct sxt_multiexp_handle* sxt_multiexp_handle_new_from_file(unsigned curve_id,
                                                              const char* filename);
void sxt_multiexp_handle_write_to_file(const struct sxt_multiexp_handle* handle,
                                       const char* filename);
void sxt_multiexp_handle_free(struct sxt_multiexp_handle* handle);

void sxt_fixed_multiexponentiation(void* res, const struct sxt_multiexp_handle* handle,
                                   unsigned element_num_bytes, unsigned num_outputs,
                                   unsigned n, const uint8_t* scalars);

void sxt_fixed_packed_multiexponentiation(void* res,
                                          const struct sxt_multiexp_handle* handle,
                                          const unsigned* output_bit_table,
                                          unsigned num_outputs, unsigned n,
                                          const uint8_t* scalars);

void sxt_fixed_vlen_multiexponentiation(void* res, const struct sxt_multiexp_handle* handle,
                                        const unsigned* output_bit_table,
                                        const unsigned* output_lengths,
                                        unsigned num_outputs, const uint8_t* scalars);

void sxt_prove_sumcheck(void* polynomials, void* evaluation_point, unsigned field_id,
                        const struct sumcheck_descriptor* descriptor,
                        void* transcript_callback, void* transcript_context);

#ifdef __cplusplus
}
#endif

#endif /* BLITZAR_TPU_API_H */
