// Standalone g++ harness timing the REFERENCE's CPU multiexponentiation path
// (sxt/multiexp/curve/multiexponentiation.h compute_multiexponentiation —
// the exact function cpu_backend::compute_commitments calls,
// /root/reference/sxt/cbindings/backend/cpu_backend.cc:116-121), bypassing
// bazel (blocked: zero network egress, see tools/ref_bazel_attempt*.log).
//
// Generators are derived with the same xorshift128+-seeded curve sampling the
// reference benchmark uses random generators for; scalars are random 32-byte
// (or 1-byte) values, matching benchmark/multi_commitment/benchmark.m.cc.
#include <chrono>
#include <cinttypes>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#include "sxt/base/container/span.h"
#include "sxt/base/num/fast_random_number_generator.h"
#include "sxt/curve21/operation/add.h"
#include "sxt/curve21/operation/double.h"
#include "sxt/curve21/operation/neg.h"
#include "sxt/curve21/operation/scalar_multiply.h"
#include "sxt/curve21/type/element_p3.h"
#include "sxt/memory/management/managed_array.h"
#include "sxt/multiexp/base/exponent_sequence.h"
// NOTE: sxt/multiexp/curve/multiexponentiation.h (the umbrella header) pulls
// the CUDA bucket-method kernels, which g++ can't parse without nvcc. The
// sync CPU entry (multiexponentiation.h:128-142) only needs the pieces below;
// compute_multiexponentiation_cpu() mirrors that function body exactly.
#include "sxt/multiexp/curve/multiexponentiation_cpu_driver.h"
#include "sxt/multiexp/curve/pippenger_multiproduct_solver.h"
#include "sxt/multiexp/pippenger/multiexponentiation.h"
#include "sxt/ristretto/base/byte_conversion.h"
#include "sxt/ristretto/random/element.h"
#include "sxt/seqcommit/generator/base_element.h"

using namespace sxt;

// Body of the reference's sync CPU multiexponentiation
// (sxt/multiexp/curve/multiexponentiation.h:128-142), restated here because
// the umbrella header that hosts it also includes CUDA kernel code.
static memmg::managed_array<c21t::element_p3>
compute_multiexponentiation_cpu(basct::cspan<c21t::element_p3> generators,
                                basct::cspan<mtxb::exponent_sequence> exponents) {
  mtxcrv::pippenger_multiproduct_solver<c21t::element_p3> solver;
  mtxcrv::multiexponentiation_cpu_driver<c21t::element_p3> driver{&solver};
  return mtxpi::compute_multiexponentiation(
             driver,
             {static_cast<const void*>(generators.data()), generators.size(),
              sizeof(c21t::element_p3)},
             exponents)
      .value()
      .template as_array<c21t::element_p3>();
}

static double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

int main(int argc, char** argv) {
  size_t lg_n = argc > 1 ? strtoul(argv[1], nullptr, 10) : 20;
  size_t num_outputs = argc > 2 ? strtoul(argv[2], nullptr, 10) : 1;
  size_t nbytes = argc > 3 ? strtoul(argv[3], nullptr, 10) : 32;
  int samples = argc > 4 ? atoi(argv[4]) : 3;
  // canonical mode: the library's own precomputed generator sequence
  // (seqcommit/generator/base_element.cc:30-35) + counter-derived scalars —
  // both reproducible in blitzar_tpu, so the result digests can be pinned
  // as cross-implementation vectors at any size
  bool canonical = argc > 5 && strcmp(argv[5], "canonical") == 0;
  size_t n = 1ull << lg_n;

  std::vector<c21t::element_p3> generators(n);
  std::mt19937_64 urng{0xdeadbeef};
  if (canonical) {
    for (size_t i = 0; i < n; ++i) {
      sqcgn::compute_base_element(generators[i], i);
    }
  } else {
    // random generators (same distribution as the reference benchmarks)
    basn::fast_random_number_generator rng{urng(), urng()};
    for (size_t i = 0; i < n; ++i) {
      rstrn::generate_random_element(generators[i], rng);
    }
  }

  std::vector<uint8_t> data(num_outputs * n * nbytes);
  if (canonical) {
    // scalar row i = LE(i * K1) || LE(i * K2 + 1) || zeros — deterministic,
    // language-neutral, full-byte-entropy in the low 16 bytes
    for (size_t o = 0; o < num_outputs; ++o) {
      for (size_t i = 0; i < n; ++i) {
        uint8_t* row = data.data() + (o * n + i) * nbytes;
        memset(row, 0, nbytes);
        uint64_t v1 = (i + o) * 0x9E3779B97F4A7C15ull;
        uint64_t v2 = (i + o) * 0xC2B2AE3D27D4EB4Full + 1;
        memcpy(row, &v1, nbytes < 8 ? nbytes : 8);
        if (nbytes >= 16) memcpy(row + 8, &v2, 8);
      }
    }
  } else {
    for (auto& b : data) b = static_cast<uint8_t>(urng());
  }
  std::vector<mtxb::exponent_sequence> seqs(num_outputs);
  for (size_t i = 0; i < num_outputs; ++i) {
    seqs[i] = {.element_nbytes = static_cast<uint8_t>(nbytes),
               .n = n,
               .data = data.data() + i * n * nbytes,
               .is_signed = 0};
  }

  double best = 1e100;
  memmg::managed_array<c21t::element_p3> res;
  for (int s = 0; s < samples; ++s) {
    double t0 = now_s();
    res = compute_multiexponentiation_cpu({generators.data(), n},
                                          {seqs.data(), num_outputs});
    double dt = now_s() - t0;
    if (dt < best) best = dt;
    fprintf(stderr, "sample %d: %.3f s\n", s, dt);
  }
  // compress the first result so it can be cross-checked bit-exactly
  // against blitzar_tpu on the same dumped inputs
  uint8_t cres[32] = {};
  if (!res.empty()) rstb::to_bytes(cres, res[0]);
  char hex[65];
  for (int i = 0; i < 32; ++i) sprintf(hex + 2 * i, "%02x", cres[i]);

  // optional input dump for cross-implementation verification:
  // REF_BENCH_DUMP=<prefix> writes <prefix>.gens (32B compressed each) and
  // <prefix>.scalars
  if (const char* dump = getenv("REF_BENCH_DUMP")) {
    std::string base{dump};
    FILE* fg = fopen((base + ".gens").c_str(), "wb");
    for (size_t i = 0; i < n; ++i) {
      uint8_t buf[32];
      rstb::to_bytes(buf, generators[i]);
      fwrite(buf, 1, 32, fg);
    }
    fclose(fg);
    FILE* fs = fopen((base + ".scalars").c_str(), "wb");
    fwrite(data.data(), 1, data.size(), fs);
    fclose(fs);
  }

  printf("{\"impl\": \"reference-cpu\", \"op\": \"curve25519_msm\", "
         "\"n\": %zu, \"num_outputs\": %zu, \"element_nbytes\": %zu, "
         "\"best_s\": %.4f, \"points_per_s\": %.0f, "
         "\"res0_compressed\": \"%s\"}\n",
         n, num_outputs, nbytes, best, (double)(n * num_outputs) / best, hex);
  return 0;
}
