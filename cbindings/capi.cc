// Native C ABI for blitzar_tpu (see blitzar_tpu_api.h).
//
// Role-equivalent of the reference's cbindings layer (reference
// cbindings/backend.cc, pedersen.cc, fixed_pedersen.cc, ...): a stable
// extern-"C" surface over the compute runtime. Here the runtime is JAX/XLA,
// reached through an embedded CPython interpreter; every entry point forwards
// raw pointers (as uintptr_t) into blitzar_tpu/capi_bridge.py, which does the
// ABI struct parsing/serialization and dispatches the jitted TPU programs.
//
// Error model mirrors the reference: misuse aborts with a message
// (reference base/error/panic.h semantics).

#include "blitzar_tpu_api.h"

#include <Python.h>

#include <cstdio>
#include <cstdlib>
#include <mutex>

namespace {

void panic(const char* msg) {
  std::fprintf(stderr, "blitzar_tpu panic: %s\n", msg);
  if (PyErr_Occurred() != nullptr) {
    PyErr_Print();
  }
  std::abort();
}

// Initialize the embedded interpreter exactly once. MUST run before any
// PyGILState_Ensure: in a pure-C consumer (no host Python) the first ABI
// call is what brings the interpreter up, and taking the GIL first
// segfaults in _PyThreadState_New. After Py_InitializeEx the calling
// thread owns the GIL — hand it back with PyEval_SaveThread so every
// entry point (from any thread) can use the PyGILState API uniformly.
void ensure_python() {
  static std::once_flag once;
  std::call_once(once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      PyEval_SaveThread();
    }
  });
}

// Lazily import the bridge module.
PyObject* bridge() {
  static PyObject* mod = nullptr;
  static std::once_flag once;
  std::call_once(once, [] {
    PyGILState_STATE gil = PyGILState_Ensure();
    mod = PyImport_ImportModule("blitzar_tpu.capi_bridge");
    if (mod == nullptr) {
      panic("failed to import blitzar_tpu.capi_bridge "
            "(is blitzar_tpu on PYTHONPATH?)");
    }
    PyGILState_Release(gil);
  });
  return mod;
}

struct GIL {
  PyGILState_STATE state;
  GIL() {
    ensure_python();
    state = PyGILState_Ensure();
  }
  ~GIL() { PyGILState_Release(state); }
};

// Call a bridge function; returns the result object (new reference).
PyObject* call(const char* name, const char* fmt, ...) {
  PyObject* fn = PyObject_GetAttrString(bridge(), name);
  if (fn == nullptr) {
    panic(name);
  }
  va_list args;
  va_start(args, fmt);
  PyObject* tuple = Py_VaBuildValue(fmt, args);
  va_end(args);
  if (tuple == nullptr) {
    panic("argument marshalling failed");
  }
  PyObject* res = PyObject_CallObject(fn, tuple);
  Py_DECREF(tuple);
  Py_DECREF(fn);
  if (res == nullptr) {
    panic(name);
  }
  return res;
}

uint64_t as_u64(PyObject* obj, const char* what) {
  uint64_t v = PyLong_AsUnsignedLongLong(obj);
  if (PyErr_Occurred() != nullptr) {
    panic(what);
  }
  Py_DECREF(obj);
  return v;
}

uintptr_t uptr(const void* p) { return reinterpret_cast<uintptr_t>(p); }

}  // namespace

extern "C" {

int sxt_init(const struct sxt_config* config) {
  if (config == nullptr) {
    panic("config must not be null");
  }
  GIL gil;
  PyObject* res = call("init", "(iK)", config->backend,
                       (unsigned long long)config->num_precomputed_generators);
  return (int)as_u64(res, "init");
}

void sxt_curve25519_compute_pedersen_commitments(
    struct sxt_ristretto255_compressed* commitments, uint32_t num_sequences,
    const struct sxt_sequence_descriptor* descriptors, uint64_t offset_generators) {
  GIL gil;
  Py_DECREF(call("curve25519_compute_pedersen_commitments", "(KKKKKK)",
                 (unsigned long long)uptr(commitments),
                 (unsigned long long)num_sequences,
                 (unsigned long long)uptr(descriptors), 0ULL, 0ULL,
                 (unsigned long long)offset_generators));
}

void sxt_curve25519_compute_pedersen_commitments_with_generators(
    struct sxt_ristretto255_compressed* commitments, uint32_t num_sequences,
    const struct sxt_sequence_descriptor* descriptors,
    const struct sxt_ristretto255* generators) {
  GIL gil;
  // longest sequence determines how many generators the bridge reads
  uint64_t max_n = 0;
  for (uint32_t i = 0; i < num_sequences; ++i) {
    if (descriptors[i].n > max_n) {
      max_n = descriptors[i].n;
    }
  }
  Py_DECREF(call("curve25519_compute_pedersen_commitments", "(KKKKKK)",
                 (unsigned long long)uptr(commitments),
                 (unsigned long long)num_sequences,
                 (unsigned long long)uptr(descriptors),
                 (unsigned long long)uptr(generators), (unsigned long long)max_n,
                 0ULL));
}

#define BLITZAR_TPU_COMMITMENTS_WITH_GENERATORS(c_name, bridge_name, point_t)   \
  void c_name(point_t* commitments, uint32_t num_sequences,                     \
              const struct sxt_sequence_descriptor* descriptors,                \
              const point_t* generators) {                                      \
    GIL gil;                                                                    \
    uint64_t max_n = 0;                                                         \
    for (uint32_t i = 0; i < num_sequences; ++i) {                              \
      if (descriptors[i].n > max_n) {                                           \
        max_n = descriptors[i].n;                                               \
      }                                                                         \
    }                                                                           \
    Py_DECREF(call(bridge_name, "(KKKKK)",                                      \
                   (unsigned long long)uptr(commitments),                       \
                   (unsigned long long)num_sequences,                           \
                   (unsigned long long)uptr(descriptors),                       \
                   (unsigned long long)uptr(generators),                        \
                   (unsigned long long)max_n));                                 \
  }

void sxt_bls12_381_g1_compute_pedersen_commitments_with_generators(
    struct sxt_bls12_381_g1_compressed* commitments, uint32_t num_sequences,
    const struct sxt_sequence_descriptor* descriptors,
    const struct sxt_bls12_381_g1* generators) {
  GIL gil;
  uint64_t max_n = 0;
  for (uint32_t i = 0; i < num_sequences; ++i) {
    if (descriptors[i].n > max_n) {
      max_n = descriptors[i].n;
    }
  }
  Py_DECREF(call("bls12_381_g1_compute_pedersen_commitments", "(KKKKK)",
                 (unsigned long long)uptr(commitments),
                 (unsigned long long)num_sequences,
                 (unsigned long long)uptr(descriptors),
                 (unsigned long long)uptr(generators),
                 (unsigned long long)max_n));
}

BLITZAR_TPU_COMMITMENTS_WITH_GENERATORS(
    sxt_bn254_g1_uncompressed_compute_pedersen_commitments_with_generators,
    "bn254_g1_uncompressed_compute_pedersen_commitments", struct sxt_bn254_g1)

BLITZAR_TPU_COMMITMENTS_WITH_GENERATORS(
    sxt_grumpkin_uncompressed_compute_pedersen_commitments_with_generators,
    "grumpkin_uncompressed_compute_pedersen_commitments", struct sxt_grumpkin)

int sxt_ristretto255_get_generators(struct sxt_ristretto255* generators,
                                    uint64_t offset_generators, uint64_t num_generators) {
  GIL gil;
  PyObject* res = call("ristretto255_get_generators", "(KKK)",
                       (unsigned long long)uptr(generators),
                       (unsigned long long)offset_generators,
                       (unsigned long long)num_generators);
  return (int)as_u64(res, "get_generators");
}

int sxt_curve25519_get_one_commit(struct sxt_ristretto255* one_commit, uint64_t n) {
  GIL gil;
  PyObject* res = call("curve25519_get_one_commit", "(KK)",
                       (unsigned long long)uptr(one_commit), (unsigned long long)n);
  return (int)as_u64(res, "get_one_commit");
}

void sxt_curve25519_prove_inner_product(
    struct sxt_ristretto255_compressed* l_vector,
    struct sxt_ristretto255_compressed* r_vector, struct sxt_curve25519_scalar* ap_value,
    struct sxt_transcript* transcript, uint64_t n, uint64_t generators_offset,
    const struct sxt_curve25519_scalar* a_vector,
    const struct sxt_curve25519_scalar* b_vector) {
  GIL gil;
  Py_DECREF(call("curve25519_prove_inner_product", "(KKKKKKKK)",
                 (unsigned long long)uptr(l_vector), (unsigned long long)uptr(r_vector),
                 (unsigned long long)uptr(ap_value),
                 (unsigned long long)uptr(transcript), (unsigned long long)n,
                 (unsigned long long)generators_offset,
                 (unsigned long long)uptr(a_vector), (unsigned long long)uptr(b_vector)));
}

int sxt_curve25519_verify_inner_product(
    struct sxt_transcript* transcript, uint64_t n, uint64_t generators_offset,
    const struct sxt_curve25519_scalar* b_vector,
    const struct sxt_curve25519_scalar* product, const struct sxt_ristretto255* a_commit,
    const struct sxt_ristretto255_compressed* l_vector,
    const struct sxt_ristretto255_compressed* r_vector,
    const struct sxt_curve25519_scalar* ap_value) {
  GIL gil;
  PyObject* res = call(
      "curve25519_verify_inner_product", "(KKKKKKKKK)",
      (unsigned long long)uptr(transcript), (unsigned long long)n,
      (unsigned long long)generators_offset, (unsigned long long)uptr(b_vector),
      (unsigned long long)uptr(product), (unsigned long long)uptr(a_commit),
      (unsigned long long)uptr(l_vector), (unsigned long long)uptr(r_vector),
      (unsigned long long)uptr(ap_value));
  return (int)as_u64(res, "verify_inner_product");
}

struct sxt_multiexp_handle* sxt_multiexp_handle_new(unsigned curve_id,
                                                    const void* generators, unsigned n) {
  GIL gil;
  PyObject* res = call("multiexp_handle_new", "(IKI)", curve_id,
                       (unsigned long long)uptr(generators), n);
  return reinterpret_cast<struct sxt_multiexp_handle*>(
      (uintptr_t)as_u64(res, "multiexp_handle_new"));
}

struct sxt_multiexp_handle* sxt_multiexp_handle_new_from_file(unsigned curve_id,
                                                              const char* filename) {
  GIL gil;
  PyObject* res = call("multiexp_handle_new_from_file", "(Iy)", curve_id, filename);
  return reinterpret_cast<struct sxt_multiexp_handle*>(
      (uintptr_t)as_u64(res, "multiexp_handle_new_from_file"));
}

void sxt_multiexp_handle_write_to_file(const struct sxt_multiexp_handle* handle,
                                       const char* filename) {
  GIL gil;
  Py_DECREF(call("multiexp_handle_write_to_file", "(Ky)",
                 (unsigned long long)uptr(handle), filename));
}

void sxt_multiexp_handle_free(struct sxt_multiexp_handle* handle) {
  GIL gil;
  Py_DECREF(call("multiexp_handle_free", "(K)", (unsigned long long)uptr(handle)));
}

void sxt_fixed_multiexponentiation(void* res, const struct sxt_multiexp_handle* handle,
                                   unsigned element_num_bytes, unsigned num_outputs,
                                   unsigned n, const uint8_t* scalars) {
  GIL gil;
  Py_DECREF(call("fixed_multiexponentiation", "(KKIIIK)",
                 (unsigned long long)uptr(res), (unsigned long long)uptr(handle),
                 element_num_bytes, num_outputs, n,
                 (unsigned long long)uptr(scalars)));
}

void sxt_fixed_packed_multiexponentiation(void* res,
                                          const struct sxt_multiexp_handle* handle,
                                          const unsigned* output_bit_table,
                                          unsigned num_outputs, unsigned n,
                                          const uint8_t* scalars) {
  GIL gil;
  Py_DECREF(call("fixed_packed_multiexponentiation", "(KKKIIK)",
                 (unsigned long long)uptr(res), (unsigned long long)uptr(handle),
                 (unsigned long long)uptr(output_bit_table), num_outputs, n,
                 (unsigned long long)uptr(scalars)));
}

void sxt_fixed_vlen_multiexponentiation(void* res, const struct sxt_multiexp_handle* handle,
                                        const unsigned* output_bit_table,
                                        const unsigned* output_lengths,
                                        unsigned num_outputs, const uint8_t* scalars) {
  GIL gil;
  Py_DECREF(call("fixed_vlen_multiexponentiation", "(KKKKIK)",
                 (unsigned long long)uptr(res), (unsigned long long)uptr(handle),
                 (unsigned long long)uptr(output_bit_table),
                 (unsigned long long)uptr(output_lengths), num_outputs,
                 (unsigned long long)uptr(scalars)));
}

void sxt_prove_sumcheck(void* polynomials, void* evaluation_point, unsigned field_id,
                        const struct sumcheck_descriptor* descriptor,
                        void* transcript_callback, void* transcript_context) {
  if (descriptor == nullptr) {
    panic("descriptor must not be null");
  }
  GIL gil;
  Py_DECREF(call("prove_sumcheck", "(KKIKKKIIIIIKK)",
                 (unsigned long long)uptr(polynomials),
                 (unsigned long long)uptr(evaluation_point), field_id,
                 (unsigned long long)uptr(descriptor->mles),
                 (unsigned long long)uptr(descriptor->product_table),
                 (unsigned long long)uptr(descriptor->product_terms),
                 descriptor->n, descriptor->num_mles, descriptor->num_products,
                 descriptor->num_product_terms, descriptor->round_degree,
                 (unsigned long long)uptr(transcript_callback),
                 (unsigned long long)uptr(transcript_context)));
}

}  // extern "C"
