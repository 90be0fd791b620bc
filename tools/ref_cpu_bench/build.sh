#!/bin/bash
# Build the reference CPU multiexponentiation benchmark with plain g++
# (bazel is blocked by zero egress — tools/ref_bazel_attempt2.log).
# Compiles the dependency closure of mtxcrv::compute_multiexponentiation's
# CPU pippenger path; stacktrace.cc (the only boost/libbacktrace user) is
# replaced by a stub.
set -e
REF=/root/reference
OUT=${1:-/tmp/ref_cpu_bench}
mkdir -p "$OUT"
cd "$(dirname "$0")"

SRCS=(
  main.cc
  stubs.cc
)
# non-template .cc files in the closure (collected by chasing link errors)
REF_SRCS=(
  sxt/base/error/panic.cc
  sxt/base/error/assert.cc
  sxt/curve21/type/element_p3.cc
  sxt/curve21/type/conversion_utility.cc
  sxt/curve21/operation/add.cc
  sxt/curve21/operation/double.cc
  sxt/curve21/operation/neg.cc
  sxt/curve21/operation/scalar_multiply.cc
  sxt/curve21/operation/cmov.cc
  sxt/field51/operation/add.cc
  sxt/field51/operation/sub.cc
  sxt/field51/operation/mul.cc
  sxt/field51/operation/sq.cc
  sxt/field51/operation/neg.cc
  sxt/field51/operation/cmov.cc
  sxt/field51/operation/invert.cc
  sxt/field51/operation/pow22523.cc
  sxt/field51/base/byte_conversion.cc
  sxt/field51/type/element.cc
  sxt/field51/random/element.cc
  sxt/ristretto/random/element.cc
  sxt/curve21/random/exponent.cc
  sxt/ristretto/base/elligator.cc
  sxt/multiexp/base/exponent_sequence_utility.cc
  sxt/multiexp/base/digit_utility.cc
  sxt/multiexp/base/generator_utility.cc
  sxt/multiexp/pippenger/multiproduct_table.cc
  sxt/multiexp/pippenger/exponent_aggregates_computation.cc
  sxt/multiexp/pippenger/multiexponentiation.cc
  sxt/multiexp/index/index_table.cc
  sxt/multiexp/index/clump2_descriptor.cc
  sxt/multiexp/index/clump2_descriptor_utility.cc
  sxt/multiexp/index/clump2_marker_utility.cc
  sxt/multiexp/index/marker_transformation.cc
  sxt/multiexp/index/partition_marker_utility.cc
  sxt/multiexp/index/reindex.cc
  sxt/multiexp/index/transpose.cc
  sxt/base/container/blob_array.cc
  sxt/base/bit/count.cc
  sxt/base/bit/iteration.cc
  sxt/base/bit/span_op.cc
  sxt/execution/async/future_state_utility.cc
  sxt/execution/schedule/pending_event.cc
  sxt/execution/schedule/scheduler.cc
  sxt/seqcommit/generator/base_element.cc
  sxt/field51/operation/notsquare.cc
  sxt/field51/operation/sqrt.cc
  sxt/field51/operation/abs.cc
  sxt/field51/operation/cneg.cc
  sxt/field51/operation/sqmul.cc
  sxt/execution/schedule/pollable_event.cc
  sxt/multiexp/index/index_table_utility.cc
  sxt/curve21/base/elligate.cc
  sxt/curve21/base/mont_ed_conversion.cc
  sxt/curve21/type/cofactor_utility.cc
  sxt/scalar25/operation/reduce.cc
  sxt/scalar25/base/reduce.cc
  sxt/execution/schedule/active_scheduler.cc
  sxt/execution/schedule/pending_scheduler.cc
  sxt/curve21/type/byte_conversion.cc
  sxt/curve21/type/compact_element.cc
  sxt/curve21/type/double_impl.cc
  sxt/curve21/type/element_cached.cc
  sxt/curve21/type/element_p1p1.cc
  sxt/curve21/type/element_p2.cc
  sxt/curve21/type/operation_adl_stub.cc
  sxt/curve21/type/point_formation.cc
  sxt/curve21/operation/overload.cc
  sxt/field51/base/reduce.cc
  sxt/ristretto/base/byte_conversion.cc
  sxt/ristretto/base/point_formation.cc
  sxt/ristretto/base/sqrt_ratio_m1.cc
  sxt/memory/management/managed_array.cc
  sxt/memory/management/managed_array_fwd.cc
  sxt/multiexp/bitset_multiprod/multiproduct.cc
  sxt/multiexp/bitset_multiprod/value_cache.cc
  sxt/multiexp/bitset_multiprod/value_cache_utility.cc
  sxt/multiexp/pippenger_multiprod/active_count.cc
  sxt/multiexp/pippenger_multiprod/active_offset.cc
  sxt/multiexp/pippenger_multiprod/clump_inputs.cc
  sxt/multiexp/pippenger_multiprod/clump_outputs.cc
  sxt/multiexp/pippenger_multiprod/driver.cc
  sxt/multiexp/pippenger_multiprod/multiproduct.cc
  sxt/multiexp/pippenger_multiprod/multiproduct_params.cc
  sxt/multiexp/pippenger_multiprod/multiproduct_params_computation.cc
  sxt/multiexp/pippenger_multiprod/partition_inputs.cc
  sxt/multiexp/pippenger_multiprod/product_table_normalization.cc
  sxt/multiexp/pippenger_multiprod/prune.cc
  sxt/multiexp/pippenger_multiprod/reduction_stats.cc
  sxt/multiexp/pippenger/driver.cc
  sxt/multiexp/pippenger/exponent_aggregates.cc
)
OBJS=()
for s in "${SRCS[@]}"; do
  o="$OUT/$(basename "$s" .cc).o"
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ]; then
    g++ -std=gnu++2b -O3 -march=native -DNDEBUG -I"$REF" -isystem "$(dirname "$0")/shim" -include tuple -c "$s" -o "$o" &
  fi
  OBJS+=("$o")
done
for s in "${REF_SRCS[@]}"; do
  o="$OUT/$(echo "$s" | tr / _ | sed s/.cc$/.o/)"
  if [ ! -f "$o" ] || [ "$REF/$s" -nt "$o" ]; then
    g++ -std=gnu++2b -O3 -march=native -DNDEBUG -I"$REF" -isystem "$(dirname "$0")/shim" -include tuple -c "$REF/$s" -o "$o" &
  fi
  OBJS+=("$o")
done
wait
g++ -O3 "${OBJS[@]}" -o "$OUT/ref_cpu_bench" -lm
echo "built $OUT/ref_cpu_bench"
