/* C ABI hello world — counterpart of reference example/cbindings1/main.cc:
 * commit to the sequence [1, 2, 3] of 1-byte scalars and print the 32-byte
 * compressed ristretto commitment as hex.
 *
 * Build (from the repo root):
 *   cbindings/build.sh /tmp/blitzar_build
 *   cc examples/cbindings1.c -I cbindings -L /tmp/blitzar_build \
 *      -lblitzar_tpu -Wl,-rpath,/tmp/blitzar_build -o /tmp/cbindings1
 */
#include <stdint.h>
#include <stdio.h>

#include "blitzar_tpu_api.h"

int main(void) {
  const struct sxt_config config = {SXT_CPU_BACKEND, 0};
  if (sxt_init(&config) != 0) {
    fprintf(stderr, "sxt_init failed\n");
    return -1;
  }

  uint8_t data_bytes[3] = {1, 2, 3};
  struct sxt_sequence_descriptor descriptor = {
      1,          /* element_nbytes */
      3,          /* n */
      data_bytes, /* data */
      0,          /* is_signed */
  };
  struct sxt_ristretto255_compressed commitment;
  sxt_curve25519_compute_pedersen_commitments(&commitment, 1, &descriptor, 0);
  for (size_t i = 0; i < sizeof commitment.ristretto_bytes; ++i) {
    printf("%02x", commitment.ristretto_bytes[i]);
  }
  printf("\n");
  return 0;
}
