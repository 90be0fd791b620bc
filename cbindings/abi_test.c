/* Pure-C consumer of blitzar_tpu_api.h: ports the reference sys-crate's
 * end-to-end test (reference rust/tests/src/main.rs:26-48) with its
 * hardcoded 32-byte expected commitments. Compiling this translation unit
 * against the header with a C compiler and running it against
 * libblitzar_tpu.so proves the ABI is a drop-in for bindgen-style
 * consumers: bindgen parses the same declarations this file compiles
 * against. (rustc/cargo are not available in this build image — see
 * rust/README.md for the vendored sys-crate itself.)
 *
 * Prints ABI_OK on success; exits nonzero on any mismatch.
 */
#include <stdint.h>
#include <stdio.h>
#include <string.h>

#include "blitzar_tpu_api.h"

/* reference rust/tests/src/main.rs: three 4-byte-scalar sequences and their
 * expected compressed ristretto commitments (c = a + b for the third). */
static const uint32_t DATA[3][4] = {
    {2000, 7500, 5000, 1500},
    {5000, 0, 400000, 10},
    {2000 + 5000, 7500 + 0, 5000 + 400000, 1500 + 10},
};

static const uint8_t EXPECTED[3][32] = {
    {4,   105, 58,  131, 59,  69,  150, 106, 120, 137, 32,
     225, 175, 244, 82,  115, 216, 180, 206, 150, 21,  250,
     240, 98,  251, 192, 146, 244, 54,  169, 199, 97},
    {2,   254, 178, 195, 198, 238, 44, 156, 24,  29, 88,
     196, 37,  63,  157, 50,  236, 159, 61, 49,  153, 181,
     79,  126, 55,  188, 67,  1,   228, 248, 72,  51},
    {30,  237, 163, 234, 252, 111, 45,  133, 235, 227, 21,
     117, 229, 188, 88,  149, 240, 109, 205, 90,  6,   130,
     199, 152, 5,   221, 57,  231, 168, 9,   141, 122},
};

int main(void) {
  struct sxt_config config;
  config.backend = SXT_CPU_BACKEND;
  config.num_precomputed_generators = 4;
  if (sxt_init(&config) != 0) {
    fprintf(stderr, "sxt_init failed\n");
    return 1;
  }

  struct sxt_sequence_descriptor descriptors[3];
  for (int i = 0; i < 3; ++i) {
    descriptors[i].element_nbytes = 4;
    descriptors[i].n = 4;
    descriptors[i].data = (const uint8_t*)DATA[i];
    descriptors[i].is_signed = 0;
  }

  struct sxt_ristretto255_compressed commitments[3];
  memset(commitments, 0, sizeof(commitments));
  sxt_curve25519_compute_pedersen_commitments(commitments, 3, descriptors, 0);

  for (int i = 0; i < 3; ++i) {
    if (memcmp(commitments[i].ristretto_bytes, EXPECTED[i], 32) != 0) {
      fprintf(stderr, "commitment %d mismatch\n", i);
      return 2;
    }
  }
  /* commitment homomorphism, as in the rust test: c2 = c0 + c1 inputs */
  printf("ABI_OK\n");
  return 0;
}
