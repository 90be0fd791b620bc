#!/usr/bin/env python
"""MXU field-multiply prototype (VERDICT r4 missing #4 / next #4).

The flagship lookup kernel is VPU-bound on its mixed-add field multiplies
(benchmarks/ROOFLINE.md): ~120 G int32 ops vs the v5e VPU's ~0.96 T op/s.
The v5e MXU does ~394 TOP/s int8 / ~197 TFLOP/s bf16 — IF the work can be
phrased as a contraction with a lane-SHARED operand. This probe measures
the candidate formulations against the production 16x16-limb skew multiply:

  base    — fp25519.mul (16 u16 limbs, VPU skew schoolbook), jitted.
  conv8   — byte schoolbook as a BATCHED dot_general: per lane,
            c[l] = a8[l] (1x32) @ T(b8[l]) (32x64), batch dim = lanes.
            There is NO lane-shared operand, so the MXU sees one tiny
            (1x32)@(32x64) sliver per lane — this measures how badly the
            "int8 MXU schoolbook" idea maps when each lane multiplies
            independent operands. (f32 entries: byte products < 2^16 and
            31-term columns < 2^21 stay exact; true int8 entries would
            additionally need nibble splits since bytes overflow int8.)
  redmat  — the mod-p FOLD of the high product limbs as a lane-SHARED
            contraction: c_red[l, j] = sum_k hi[l, k] * R[k, j] with
            R[k, j] = limb j of (2^(16(16+k)) mod p) shared by every lane —
            a genuine (L, 32) @ (32, 34) MXU matmul (operands split to
            11/8-bit halves to keep every f32 term exact). Only replaces
            the fold stage; the n^2 partial products stay on the VPU.

Bit-exactness of each variant is asserted against python ints before any
timing. Run on the TPU tunnel; results go into benchmarks/ROOFLINE.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from blitzar_tpu.utils.cache import configure

configure(jax.config, tag="bench")

import jax.numpy as jnp
import numpy as np
from jax import lax

from blitzar_tpu.fields import fp25519 as F

P = (1 << 255) - 19
NL16 = 16  # u16 limbs
NB = 32  # byte limbs


def rand_elems(rng, lanes):
    return [int.from_bytes(rng.bytes(32), "little") % P for _ in range(lanes)]


def to_u16(vals):
    out = np.zeros((NL16, len(vals)), np.uint32)
    for j, v in enumerate(vals):
        for i in range(NL16):
            out[i, j] = (v >> (16 * i)) & 0xFFFF
    return out


def to_bytes_rows(vals):
    out = np.zeros((len(vals), NB), np.uint8)
    for j, v in enumerate(vals):
        out[j] = np.frombuffer(int(v).to_bytes(32, "little"), np.uint8)
    return out


def from_u16(arr):
    arr = np.asarray(arr)
    return [
        sum(int(arr[i, j]) << (16 * i) for i in range(arr.shape[0]))
        for j in range(arr.shape[1])
    ]


def _sync(x):
    np.asarray(x)


def timeit(fn, *args, samples=5):
    _sync(fn(*args))
    ts = []
    for _ in range(samples):
        t0 = time.time()
        _sync(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


# --- base: production skew mul ---------------------------------------------


@jax.jit
def base_mul(a, b):
    return F.mul(a, b)


# --- conv8: batched dot_general byte schoolbook ----------------------------


@jax.jit
def conv8_mul(a8, b8):
    """a8, b8: (L, 32) uint8. Returns (L, 64) f32 partial-product columns
    c[l, k] = sum_{i+j=k} a8[l,i] * b8[l,j] via a batched matmul against
    the per-lane Toeplitz of b8. Every column is a sum of <= 32 byte
    products < 2^16, so f32 (24-bit mantissa) is exact."""
    # T[l, i, k] = b8[l, k - i] for 0 <= k - i < 32
    T = jnp.stack(
        [jnp.pad(b8, ((0, 0), (i, NB - i))) for i in range(NB)], axis=1
    )  # (L, 32, 64)
    out = lax.dot_general(
        a8.astype(jnp.float32)[:, None, :],
        T.astype(jnp.float32),
        (((2,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (L, 1, 64)
    return out[:, 0, :]


def conv8_to_int(cols):
    cols = np.asarray(cols)
    return [
        sum(int(cols[l, k]) << (8 * k) for k in range(cols.shape[1])) % P
        for l in range(cols.shape[0])
    ]


# --- redmat: lane-shared reduction matmul ----------------------------------

# R[k, j] = u16 limb j of (2^(16*(16+k)) mod p); the fold of the 16 high
# limbs is c_red[l] = sum_k hi[l, k] * (2^(16(16+k)) mod p), a contraction
# with R SHARED across lanes. To keep every f32 term exact, split
# hi (< 2^22) into 11-bit halves and R into 8-bit halves: 4 stacked
# contractions, each term < 2^19 and each column sum < 16 * 2^19 = 2^23.
_R = np.zeros((NL16, NL16 + 1), np.int64)
for k in range(NL16):
    v = pow(2, 16 * (16 + k), P)
    for j in range(NL16 + 1):
        _R[k, j] = (v >> (16 * j)) & 0xFFFF

_R_LO = jnp.asarray((_R & 0xFF).astype(np.float32))
_R_HI = jnp.asarray((_R >> 8).astype(np.float32))


@jax.jit
def redmat_fold(hi_limbs):
    """hi_limbs: (L, 16) int32 (< 2^22). Returns (L, 17) int64 columns of
    sum_k hi[l, k] * (2^(16(16+k)) mod p) — the mod-p fold as 4 MXU
    matmuls with one shared operand."""
    lo11 = (hi_limbs & 0x7FF).astype(jnp.float32)
    hi11 = (hi_limbs >> 11).astype(jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    # HIGHEST: TPU f32 dots default to bf16 passes, which truncate the
    # 11-bit operands; the multi-pass mode keeps every term exact
    prec = lax.Precision.HIGHEST
    t00 = lax.dot_general(lo11, _R_LO, dims, precision=prec)
    t01 = lax.dot_general(lo11, _R_HI, dims, precision=prec)
    t10 = lax.dot_general(hi11, _R_LO, dims, precision=prec)
    t11 = lax.dot_general(hi11, _R_HI, dims, precision=prec)
    # every column < 2^23, exact in f32; recombination (t00 + t01*2^8 +
    # t10*2^11 + t11*2^19 per column) happens host-side in the check — on
    # device it would be a handful of cheap u32 splits, not the bottleneck
    return jnp.stack([t00, t01, t10, t11])


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    rng = np.random.default_rng(9)
    va = rand_elems(rng, 64)
    vb = rand_elems(rng, 64)

    # -- bit-exactness on 64 lanes --
    a16 = jnp.asarray(to_u16(va))
    b16 = jnp.asarray(to_u16(vb))
    # fp25519 keeps values partially reduced (limbs carry slack); compare
    # mod p
    got = [g % P for g in from_u16(base_mul(a16, b16))]
    want = [(x * y) % P for x, y in zip(va, vb)]
    assert got == want, "base mul mismatch"

    a8 = jnp.asarray(to_bytes_rows(va))
    b8 = jnp.asarray(to_bytes_rows(vb))
    got8 = conv8_to_int(conv8_mul(a8, b8))
    assert got8 == want, "conv8 product mismatch"

    hi = rng.integers(0, 1 << 22, size=(64, NL16), dtype=np.int64).astype(np.int32)
    parts = np.asarray(redmat_fold(jnp.asarray(hi))).astype(np.int64)
    folded = parts[0] + (parts[1] << 8) + (parts[2] << 11) + (parts[3] << 19)
    for l in range(64):
        want_v = sum(int(hi[l, k]) * pow(2, 16 * (16 + k), P) for k in range(NL16)) % P
        got_v = sum(int(folded[l, j]) << (16 * j) for j in range(NL16 + 1)) % P
        assert got_v == want_v, f"redmat fold mismatch at lane {l}"
    print("bit-exactness OK (base, conv8, redmat)", flush=True)

    # -- throughput at `lanes` --
    big_a = rng.integers(0, 1 << 16, size=(NL16, lanes), dtype=np.int64).astype(
        np.uint32
    )
    big_b = rng.integers(0, 1 << 16, size=(NL16, lanes), dtype=np.int64).astype(
        np.uint32
    )
    t_base = timeit(base_mul, jnp.asarray(big_a), jnp.asarray(big_b))

    big_a8 = rng.integers(0, 256, size=(lanes, NB), dtype=np.uint8)
    big_b8 = rng.integers(0, 256, size=(lanes, NB), dtype=np.uint8)
    t_conv8 = timeit(conv8_mul, jnp.asarray(big_a8), jnp.asarray(big_b8))

    big_hi = rng.integers(0, 1 << 22, size=(lanes, NL16), dtype=np.int64).astype(
        np.int32
    )
    t_red = timeit(redmat_fold, jnp.asarray(big_hi))

    print(f"lanes = {lanes}")
    print(f"base   (u16 skew FULL mul, VPU): {t_base*1e3:8.2f} ms "
          f"({lanes/t_base/1e6:.1f} M mul/s)")
    print(f"conv8  (batched-MXU partial products only): {t_conv8*1e3:8.2f} ms "
          f"({lanes/t_conv8/1e6:.1f} M/s)")
    print(f"redmat (lane-shared MXU fold only): {t_red*1e3:8.2f} ms "
          f"({lanes/t_red/1e6:.1f} M/s)")


if __name__ == "__main__":
    main()
