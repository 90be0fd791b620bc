#!/bin/sh
# Build libblitzar_tpu.so (the native C ABI over the JAX runtime).
# Usage: cbindings/build.sh [outdir]
set -e
cd "$(dirname "$0")"
OUT="${1:-.}"
CFLAGS="$(python3-config --includes)"
LDFLAGS="$(python3-config --ldflags --embed)"
g++ -std=c++17 -O2 -fPIC -shared capi.cc -o "$OUT/libblitzar_tpu.so" \
    $CFLAGS $LDFLAGS
echo "built $OUT/libblitzar_tpu.so"
