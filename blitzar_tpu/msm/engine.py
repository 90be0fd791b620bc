"""Multi-scalar multiplication (Pedersen commitment) engine, TPU-native.

Replaces the reference's scatter-based bucket accumulation
(reference sxt/multiexp/bucket_method/accumulation_kernel.h:38-67 — one CUDA
thread serially walking a private 255-bucket array) with a scatter-free
formulation that maps onto TPU vector units:

  1. 8-bit window digit decomposition (same radix as the reference:
     255 buckets x `nbytes` windows per output).
  2. Per (output, window) row: sort point indices by digit (XLA sort),
     locate each bucket's contiguous run by vectorized binary search.
  3. Gather points into a static (255, C) padded matrix (invalid slots =
     identity) and tree-reduce along C with the complete addition law —
     a log-depth, full-width batched reduction instead of a serial walk.
     A while_loop repeats with fresh slabs for (rare, adversarial) buckets
     with more than C entries, so shapes stay static at any skew.
  4. Triangle combine: window sum = sum_b b*S_b computed as a reverse
     associative scan + reduction (reference combine_buckets' triangle sum),
     then Horner over windows with 8 doublings per step
     (reference doubling_reduction.h:30-53).

Multi-device: `bucket_accumulate` is data-parallel over the point axis; the
sharded driver (msm/sharded.py) all-gathers the fixed-size (R, 255) partial
bucket arrays and folds them — communication is O(buckets), not O(n), the
same split as the reference's multi-GPU fold
(reference bucket_method/accumulation.h:96-162) but over ICI collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..curves import edwards25519 as ed
from ..fields import fp25519 as F

NUM_BUCKETS = 255  # digits 1..255; digit 0 contributes nothing


def choose_capacity(n: int, num_rows: int = 1) -> int:
    """Static per-bucket slab capacity C. Covers random data in one round
    (mean + 6 sigma); skewed data just takes more while-loop rounds."""
    mean = max(n / NUM_BUCKETS, 1.0)
    c = int(mean + 6.0 * mean**0.5 + 8)
    c = min(c, n)
    return max(8, -(-c // 8) * 8)


def digit_decompose(scalars_u8: jnp.ndarray) -> jnp.ndarray:
    """(O, n, nbytes) uint8 -> (O, nbytes, n) int32 digits (8-bit windows)."""
    return jnp.transpose(scalars_u8, (0, 2, 1)).astype(jnp.int32)


def bucket_accumulate(
    points,
    digits: jnp.ndarray,
    signs: jnp.ndarray,
    capacity: int,
    curve=ed,
):
    """Partial bucket sums.

    points: curve point batch (n,)
    digits: (R, n) int32 in [0, 255]; R = num_outputs * num_windows
    signs:  (R, n) uint32, 1 = negate the point's contribution
    returns PointP3 with batch (R, NUM_BUCKETS): S[r, k] = sum over
    {i : digits[r, i] == k+1} of (+-) points[i].
    """
    r_rows, n = digits.shape
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (r_rows, n))
    sorted_digits, sorted_idx = lax.sort((digits, iota), num_keys=1)

    boundaries = jnp.arange(1, 257, dtype=jnp.int32)
    bounds = jax.vmap(lambda d: jnp.searchsorted(d, boundaries, side="left"))(
        sorted_digits
    )  # (R, 256): bounds[:, b-1] = first index with digit >= b
    starts = bounds[:, :NUM_BUCKETS]  # digit k+1 run start
    ends = bounds[:, 1 : NUM_BUCKETS + 1]
    num_rounds = lax.max(
        jnp.int32(1),
        (jnp.max(ends - starts) + jnp.int32(capacity - 1)) // jnp.int32(capacity),
    )

    ident = curve.identity((r_rows, NUM_BUCKETS))
    offs = jnp.arange(capacity, dtype=jnp.int32)

    def body(state):
        rnd, acc = state
        pos = starts[:, :, None] + rnd * capacity + offs  # (R, 255, C)
        valid = pos < ends[:, :, None]
        safe = jnp.where(valid, pos, 0)
        src = jnp.take_along_axis(
            sorted_idx, safe.reshape(r_rows, -1), axis=1
        ).reshape(r_rows, NUM_BUCKETS, capacity)
        # mode="clip": invalid slots may reference padding indices beyond the
        # point batch; their gathers are discarded by the select below.
        gathered = curve.make_point(*(jnp.take(c, src, axis=1, mode="clip") for c in points))
        sign_g = jnp.take_along_axis(
            signs, src.reshape(r_rows, -1), axis=1, mode="clip"
        ).reshape(r_rows, NUM_BUCKETS, capacity)
        gathered = curve.cneg(gathered, sign_g == 1)
        gathered = curve.select(
            curve.identity((r_rows, NUM_BUCKETS, capacity)), gathered, valid
        )
        partial = curve.tree_reduce(gathered, capacity)
        return rnd + 1, curve.add(acc, partial)

    _, acc = lax.while_loop(
        lambda s: s[0] < num_rounds, body, (jnp.int32(0), ident)
    )
    return acc


def combine_buckets(bucket_sums, num_outputs: int, num_windows: int, curve=ed):
    """(O*W, 255) bucket sums -> (O,) results.

    Triangle sum per window (sum_b b*S_b via reverse scan), then Horner over
    windows with 8 doublings per step.
    """
    # leaves are (16, R, 255): axis 2 is the bucket axis
    suffix = lax.associative_scan(curve.add, bucket_sums, reverse=True, axis=2)
    window_sums = curve.tree_reduce(suffix, NUM_BUCKETS)  # (O*W,)
    w = curve.reshape_batch(window_sums, (num_outputs, num_windows))

    def step(i, acc):
        acc = lax.fori_loop(0, 8, lambda _, a: curve.double(a), acc)
        idx = num_windows - 2 - i
        wi = curve.make_point(
            *(lax.dynamic_index_in_dim(c, idx, axis=2, keepdims=False) for c in w)
        )
        return curve.add(acc, wi)

    acc0 = curve.make_point(*(c[:, :, num_windows - 1] for c in w))
    if num_windows == 1:
        return acc0
    return lax.fori_loop(0, num_windows - 1, step, acc0)


# Soft cap on the materialized gather slab (bytes) — rows are processed in
# blocks so (row_block, 255, C) x 4 coords x 64B stays under this.
GATHER_BUDGET_BYTES = 1 << 30


def _row_block(capacity: int, r_rows: int, curve=ed) -> int:
    per_row = NUM_BUCKETS * capacity * curve.coord_count * curve.nlimbs * 4 * 2  # x2: tree temps
    blk = max(1, GATHER_BUDGET_BYTES // per_row)
    return min(blk, r_rows)


def bucket_accumulate_chunked(
    points, digits: jnp.ndarray, signs: jnp.ndarray, capacity: int, curve=ed
):
    """bucket_accumulate over row blocks (lax.map) to bound peak memory."""
    r_rows, n = digits.shape
    blk = _row_block(capacity, r_rows, curve)
    if r_rows % blk:
        pad = blk - r_rows % blk
        digits = jnp.concatenate([digits, jnp.zeros((pad, n), digits.dtype)])
        signs = jnp.concatenate([signs, jnp.zeros((pad, n), signs.dtype)])
    nblocks = digits.shape[0] // blk

    def f(args):
        d, s = args
        return bucket_accumulate(points, d, s, capacity, curve)

    out = lax.map(
        f,
        (
            digits.reshape(nblocks, blk, n),
            signs.reshape(nblocks, blk, n),
        ),
    )
    # leaves: (nblocks, nlimbs, blk, 255) -> (nlimbs, nblocks*blk, 255)
    merged = curve.make_point(
        *(
            jnp.moveaxis(c, 0, 1).reshape(curve.nlimbs, nblocks * blk, NUM_BUCKETS)
            for c in out
        )
    )
    return curve.index_batch(merged, (slice(0, r_rows),))


@functools.partial(
    jax.jit, static_argnames=("num_outputs", "num_windows", "capacity", "curve")
)
def msm_jit(
    points,
    digits: jnp.ndarray,
    signs: jnp.ndarray,
    num_outputs: int,
    num_windows: int,
    capacity: int,
    curve=ed,
):
    """Single-device MSM: digits (O, W, n) -> (O,) points."""
    r_rows = num_outputs * num_windows
    n = digits.shape[-1]
    digits = digits.reshape(r_rows, n)
    signs = jnp.broadcast_to(signs[:, None, :], (num_outputs, num_windows, n)).reshape(
        r_rows, n
    )
    buckets = bucket_accumulate_chunked(points, digits, signs, capacity, curve)
    return combine_buckets(buckets, num_outputs, num_windows, curve)


def prepare_scalars(data_list, nbytes_list, signed_list, n_max=None):
    """Host-side normalization of exponent sequences.

    data_list: list of (n_i, nbytes_i) uint8 arrays (little-endian rows).
    Returns (scalars_u8 (O, n, max_nbytes) with two's-complement applied,
    signs (O, n) uint8, n).

    Signed sequences follow the reference exponent_sequence contract
    (reference multiexp/base/exponent_sequence.h): bytes are two's-complement;
    we fold the sign into a per-element point negation.
    """
    num_outputs = len(data_list)
    n = n_max if n_max is not None else max((d.shape[0] for d in data_list), default=0)
    max_nbytes = max(nbytes_list, default=1)
    scalars = np.zeros((num_outputs, n, max_nbytes), dtype=np.uint8)
    signs = np.zeros((num_outputs, n), dtype=np.uint8)
    for o, (data, nbytes, is_signed) in enumerate(zip(data_list, nbytes_list, signed_list)):
        rows = np.asarray(data, dtype=np.uint8).reshape(-1, nbytes)
        ni = rows.shape[0]
        if ni == 0:
            continue
        if is_signed:
            neg = rows[:, -1] >= 0x80
            # two's-complement negate the negative rows bytewise
            comp = (~rows).astype(np.uint16)
            carry = np.ones(ni, dtype=np.uint16)
            out = np.zeros_like(rows)
            for b in range(nbytes):
                t = comp[:, b] + carry
                out[:, b] = (t & 0xFF).astype(np.uint8)
                carry = t >> 8
            rows = np.where(neg[:, None], out, rows)
            signs[o, :ni] = neg.astype(np.uint8)
        scalars[o, :ni, :nbytes] = rows
    return scalars, signs, n


# Small cache of partition-table handles, so repeated dynamic MSMs over the
# same generator set (e.g. the cached canonical ristretto generators in
# api.compute_*_commitments) skip the multi-second table rebuild. Lookup is
# two-tier: array object identity first (free), then a cheap content digest
# of boundary points + n — so logically identical generators arriving in a
# FRESH array (the C ABI copies its inputs, capi_bridge.py) still hit.
# Bounded so stale entries rotate out.
_HANDLE_CACHE: list = []
_HANDLE_CACHE_SLOTS = 4


def _content_digest(points, n: int, curve) -> bytes:
    """Digest of boundary + stride-sampled interior points (x AND y limbs)
    plus n. Sampling both coordinates defeats the sign-flip collision (y
    negation preserves every x) and interior-only edits; 64 sampled points
    across the array make an accidental collision for real generator sets
    effectively impossible. Cost is a small D2H gather."""
    import hashlib

    k = min(64, n)
    # boundary-biased sample: always the first/last 4, plus an even stride
    idx = np.unique(
        np.concatenate(
            [
                np.arange(min(4, n)),
                np.arange(max(n - 4, 0), n),
                np.linspace(0, n - 1, num=k, dtype=np.int64),
            ]
        )
    )
    h = hashlib.blake2b(digest_size=16)
    h.update(n.to_bytes(8, "little"))
    h.update(curve.name.encode())
    h.update(np.asarray(points.x[:, idx]).tobytes())
    h.update(np.asarray(points.y[:, idx]).tobytes())
    return h.digest()


# ceiling for the fused single-dispatch small-n path (reference
# bucket_method2 caps at 128*32 = 4096, bucket_method2/constants.h:23)
SMALL_N_MAX = 4096

# point arrays seen ONCE by the small-n path: a second MSM over the same
# live generator array promotes it to a cached w=8 handle (repeat-call
# workloads then skip both the streamed build and the handle build)
_SMALL_SEEN: list = []
_SMALL_SEEN_SLOTS = 8


def _small_seen_before(points) -> bool:
    for e in _SMALL_SEEN:
        if e is points.x:
            return True
    _SMALL_SEEN.append(points.x)
    if len(_SMALL_SEEN) > _SMALL_SEEN_SLOTS:
        _SMALL_SEEN.pop(0)
    return False


def _handle_cached(points, n, curve) -> bool:
    return any(
        e[0] is points.x and e[1] == n and e[2] is curve for e in _HANDLE_CACHE
    )


def _cached_handle(points, n, curve, _fixed):
    for entry in _HANDLE_CACHE:
        cached_x, cached_n, cached_curve, _digest, handle = entry
        if cached_x is points.x and cached_n == n and cached_curve is curve:
            return handle
    digest = _content_digest(points, n, curve)
    for entry in _HANDLE_CACHE:
        _x, cached_n, cached_curve, cached_digest, handle = entry
        if cached_digest == digest and cached_n == n and cached_curve is curve:
            # same content in a fresh array (e.g. through the copying C ABI):
            # re-key on the new identity so the next lookup is free
            entry[0] = points.x
            return handle
    import logging

    logging.getLogger("blitzar_tpu").info(
        "building partition-table handle (n=%d, curve=%s) — cache miss", n, curve.name
    )
    # width chosen by table-memory budget (w=8 tables hold 2^8/8 = 32
    # split points per input point — 6.4 GB at n=2^20 for curve25519, more
    # for the wider Weierstrass fields); larger n takes the streaming path
    # before reaching here
    handle = _fixed.MultiexpHandle(points, curve=curve, n=n)
    _HANDLE_CACHE.append([points.x, n, curve, digest, handle])
    if len(_HANDLE_CACHE) > _HANDLE_CACHE_SLOTS:
        _HANDLE_CACHE.pop(0)
    return handle


def msm(points, data_list, nbytes_list, signed_list, curve=ed):
    """Host entry: generalized Pedersen MSM over shared generators.

    Equivalent of reference mtxcrv::async_compute_multiexponentiation
    (reference multiexp/curve/multiexponentiation.h:147-208), curve-generic.

    Engine selection (the reference picks bucket_method2 / bucket_method /
    pippenger v1 by problem shape, multiexponentiation.h:147-200; we pick by
    what maps to TPU): every shape uses the sort-free partition-table path
    (XLA's sort is ~100x off roofline on TPU, so the bucket engine's
    sort+segment formulation loses to subset-sum tables built on the fly).
    Signed sequences stay on it too: per-element signs become positive and
    negative bit-row masks against the same table, result = Q_pos - Q_neg
    (reference handles signs with a sign bit on the gather index + cneg,
    multiexp/curve/multiproduct.h:32-58). The sort-based bucket engine
    remains available via BLITZAR_TPU_MSM_ENGINE=bucket (it is also the
    base of the sharded driver, msm/sharded.py).
    """
    scalars, signs, n = prepare_scalars(data_list, nbytes_list, signed_list)
    num_outputs, _, max_nbytes = scalars.shape
    if n == 0 or num_outputs == 0:
        return curve.identity((max(num_outputs, 0),))
    import os as _os

    force_bucket = _os.environ.get("BLITZAR_TPU_MSM_ENGINE") == "bucket"
    if not force_bucket:
        from . import fixed as _fixed

        any_signed = any(signed_list)
        if points.x.shape[-1] > n:
            points = curve.index_batch(points, (slice(0, n),))
        if n > (1 << 20):
            # beyond 2^20 a persistent w=8 table outgrows HBM; stream
            # build+query per generator chunk instead
            return _fixed.streaming_multiexponentiation(
                points, scalars, curve, signs=signs if any_signed else None
            )
        from ..ops import pallas_point as _pp

        small_env = _os.environ.get("BLITZAR_TPU_SMALL_MSM")
        use_small = (
            small_env == "stream"
            or (small_env != "handle" and _pp.use_pallas())
        )
        if (
            use_small
            and n <= SMALL_N_MAX
            and not _handle_cached(points, n, curve)
            and not _small_seen_before(points)
        ):
            # small-n low-latency path (reference keeps a dedicated engine
            # for 256 <= n <= 4096, bucket_method2/multiexponentiation.h:
            # 87-121): a fresh small generator set takes ONE fused
            # build+query dispatch (cached-form tables, no inversion, no
            # persistent handle) instead of paying a w=8 table build.
            # n pads to a power of two to bound shape-specialized compiles.
            # TPU-only by default (BLITZAR_TPU_SMALL_MSM=stream|handle
            # overrides): its win is dispatch latency + skipping the niels
            # build, which XLA:CPU does not care about.
            n_pad = 8
            while n_pad < n:
                n_pad *= 2
            if scalars.shape[1] < n_pad:
                scalars = np.pad(
                    scalars, ((0, 0), (0, n_pad - scalars.shape[1]), (0, 0))
                )
                if any_signed:
                    signs = np.pad(signs, ((0, 0), (0, n_pad - signs.shape[1])))
            return _fixed.streaming_multiexponentiation(
                points, scalars[:, :n_pad], curve,
                signs=signs[:, :n_pad] if any_signed else None,
            )
        handle = _cached_handle(points, n, curve, _fixed)
        if any_signed:
            return _fixed.fixed_multiexponentiation_signed(handle, scalars, signs)
        return _fixed.fixed_multiexponentiation(handle, scalars)
    # pad n to the next power of two (>= 8) to bound shape-specialized
    # recompiles; zero digits land in the excluded bucket 0
    n_pad = 8
    while n_pad < n:
        n_pad *= 2
    if n_pad != n:
        scalars = np.pad(scalars, ((0, 0), (0, n_pad - n), (0, 0)))
        signs = np.pad(signs, ((0, 0), (0, n_pad - n)))
    digits = digit_decompose(jnp.asarray(scalars))  # (O, W, n_pad)
    capacity = choose_capacity(n)
    return msm_jit(
        points,
        digits,
        jnp.asarray(signs),
        num_outputs=num_outputs,
        num_windows=max_nbytes,
        capacity=capacity,
        curve=curve,
    )
