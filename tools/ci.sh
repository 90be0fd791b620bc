#!/bin/sh
# CI entry point (the analog of reference ci/build.sh + the bazel test
# matrix, .github/workflows/test-check-lint.yml):
#   1. fast host-only tests (limbs, transcript, refimpl oracles)
#   2. full pytest suite on the virtual 8-device CPU mesh
#   3. native .so build + C ABI end-to-end (subprocess driver + abi_test.c)
#   4. checks mode: JAX runtime checks enabled on the fast subset
#      (the sanitizer-equivalent toggle; reference runs ASAN/compute-sanitizer)
set -e
cd "$(dirname "$0")/.."

echo "== ABI parity vs reference header =="
if [ -f /root/reference/cbindings/blitzar_api.h ]; then
  python tools/abi_parity.py
else
  echo "reference header not present, skipping"
fi

echo "== fast host-only tests =="
python -m pytest tests/test_limbs.py tests/test_transcript.py tests/test_refimpl.py -q

echo "== full suite incl. slow tier (virtual 8-device CPU mesh) =="
python -m pytest tests/ -q -m ""
# (the interpret-mode kernel tier needs BLITZAR_TPU_RUN_INTERPRET=1 and
# hours of XLA:CPU compile — run it manually when kernels change; kernel
# correctness is also checked on hardware via pallas-vs-fallback equality)

echo "== multi-host simulation (2 jax.distributed processes x 4 CPU devices) =="
python tools/multihost_sim.py

echo "== native ABI =="
OUT=$(mktemp -d)
cbindings/build.sh "$OUT"
python tests/capi_driver.py "$OUT/libblitzar_tpu.so" "$PWD"

echo "== checks mode (jax_enable_checks + on-curve result validation) =="
JAX_ENABLE_CHECKS=1 BLITZAR_TPU_CHECKS=1 python -m pytest tests/test_limbs.py tests/test_msm.py tests/test_api.py -q

echo "CI_OK"
