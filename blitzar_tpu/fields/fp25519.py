"""GF(2^255 - 19) arithmetic, vectorized for TPU lanes.

Representation: a field element batch is a single ``uint32`` array of shape
``(16, *batch)`` — sixteen 16-bit little-endian limbs, limb axis leading so the
batch rides the TPU vector lanes (the SoA dual of the reference's
one-thread-one-element layout, see reference sxt/field51/type/element.h).

Invariant for stored elements: every limb is < 2^16 and the represented value
is < 2^256 (congruent mod p, not necessarily canonical). All ops take and
return arrays satisfying the invariant. TPUs have no 64-bit integer multiply,
so products are formed as 16x16->32-bit partials with immediate lo/hi
splitting; accumulator bounds are commented at each step.

Two product formulations, selected by ``diag_mode``:

- default (XLA graphs): ONE (16, 16, batch) outer product + Toeplitz-skew
  realignment — ~80 HLO ops per multiply, so full protocol graphs
  (inversion chains, MSM trees) compile in seconds.
- ``with diag_mode():`` (inside Pallas kernel bodies only): a diagonal
  accumulation of 256 scalar-limb partials — no materialized outer product,
  every intermediate stays in VMEM/registers, and Mosaic (unlike XLA) digests
  the unrolled form. Constants are Python-int immediates in this mode because
  Pallas rejects captured device arrays.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax import lax

NLIMBS = 16
LIMB_BITS = 16
# NOTE: constants are Python ints (inlined as immediates), NOT jnp arrays —
# captured jnp constants are rejected inside Pallas kernel bodies
# (ops/pallas_point.py routes the group law through these functions).
MASK = 0xFFFF

# p = 2^255 - 19 as 16-bit limbs.
P_LIMBS = (0xFFED,) + (0xFFFF,) * 14 + (0x7FFF,)
# 4p = 2^257 - 76 decomposed with per-limb slack in [2^16, 2^17) so that
# a[i] + FOURP[i] - b[i] never borrows: 4p = (2^17-76) + sum_{i>=1} (2^17-2)*2^16i.
FOURP_LIMBS = (0x1FFB4,) + (0x1FFFE,) * 15


def _const(limbs, batch_ndim):
    c = jnp.array(limbs, dtype=jnp.uint32)
    return c.reshape((len(limbs),) + (1,) * batch_ndim)


def zeros(batch_shape=()):
    return jnp.zeros((NLIMBS,) + tuple(batch_shape), dtype=jnp.uint32)


def from_int_const(value: int, batch_shape=()):
    """Broadcast a Python-int field constant to (16, *batch). In diag mode
    (inside Pallas kernel bodies) the limbs are scalar immediates broadcast
    with jnp.full — a jnp.array literal would become a captured constant,
    which pallas_call rejects."""
    value %= 2**256
    limbs = [(value >> (16 * i)) & 0xFFFF for i in range(NLIMBS)]
    if _DIAG[-1]:
        return jnp.stack(
            [jnp.full(tuple(batch_shape), l, jnp.uint32) for l in limbs]
        )
    c = jnp.array(limbs, dtype=jnp.uint32).reshape((NLIMBS,) + (1,) * len(batch_shape))
    return jnp.broadcast_to(c, (NLIMBS,) + tuple(batch_shape))


def _scan_unroll() -> bool:
    """Carry/borrow chains run as rolled lax.scan loops on CPU (10x smaller
    HLO — XLA:CPU compile time is the binding constraint for the virtual-mesh
    dryrun and the test suite) but fully unrolled on TPU (identical graphs to
    the hand-unrolled form; the hot paths are Pallas kernels either way).
    Same math, same evaluation order, bit-identical values on both."""
    from ..utils.backend import compute_platform

    return compute_platform() == "tpu"


def _carry_pass(limbs):
    """Sequential carry propagation over a python list of rows (diag/Pallas
    form — fully unrolled). Input rows may be up to 2^31; output rows are
    < 2^16 with the radix-2^16 carry returned (carry <= 2^16)."""
    out = []
    c = None
    for i in range(NLIMBS):
        t = limbs[i] if c is None else limbs[i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    return out, c


def _carry_scan(stacked):
    """Array-form carry propagation: lax.scan over the limb axis (rolled on
    CPU, unrolled on TPU — see _scan_unroll). Same math and order as
    _carry_pass; bit-identical values."""
    def step(c, row):
        t = row + c
        return t >> LIMB_BITS, t & MASK

    c, out = lax.scan(
        step, jnp.zeros_like(stacked[0]), stacked, unroll=_scan_unroll()
    )
    return out, c


def _finalize(limbs):
    """Reduce 16 uint32 accumulator rows (each <= 2^31; python list or a
    stacked (16, *batch) array) to the stored invariant (limbs < 2^16, value
    < 2^256), folding 2^256 == 38 (mod p)."""
    if _DIAG[-1]:
        out, c = _carry_pass(limbs)
        # c <= 2^16 so 38*c <= 2^21.3; value now < 2^256 + 2^22.
        out[0] = out[0] + c * 38
        out, c2 = _carry_pass(out)
        # c2 in {0, 1}; if c2 == 1 the remaining value is < 2^22, so only limbs
        # 0..1 are nonzero and the fold below cannot cascade past limb 1.
        t = out[0] + c2 * 38
        out[0] = t & MASK
        out[1] = out[1] + (t >> LIMB_BITS)
        return jnp.stack(out)
    stacked = jnp.stack(limbs) if isinstance(limbs, list) else limbs
    out, c = _carry_scan(stacked)
    out = out.at[0].add(c * 38)
    out, c2 = _carry_scan(out)
    t = out[0] + c2 * 38
    return jnp.concatenate(
        [(t & MASK)[None], (out[1] + (t >> LIMB_BITS))[None], out[2:]]
    )


def _fourp(batch_ndim: int):
    return jnp.asarray(FOURP_LIMBS, jnp.uint32).reshape(
        (NLIMBS,) + (1,) * batch_ndim
    )


def add(a, b):
    if _DIAG[-1]:
        return _finalize([a[i] + b[i] for i in range(NLIMBS)])
    return _finalize(a + b)


def sub(a, b):
    # a + 4p - b: each row in [0, 2^17 + 2^16), no borrow.
    if _DIAG[-1]:
        return _finalize([a[i] + FOURP_LIMBS[i] - b[i] for i in range(NLIMBS)])
    return _finalize(a + _fourp(a.ndim - 1) - b)


def neg(a):
    if _DIAG[-1]:
        return _finalize([FOURP_LIMBS[i] - a[i] for i in range(NLIMBS)])
    return _finalize(_fourp(a.ndim - 1) - a)


_DIAG = [False]


@contextlib.contextmanager
def diag_mode():
    """Trace-time switch to the Pallas-friendly diagonal limb product (used
    by ops/pallas_point.py while tracing kernel bodies)."""
    _DIAG.append(True)
    try:
        yield
    finally:
        _DIAG.pop()


def _schoolbook_skew(a, b):
    """(32, *batch) accumulator rows via one outer product + Toeplitz skew
    (OUT[i, k] = P[i, k-i]); compile-friendly for XLA graphs."""
    outer = a[:, None] * b[None, :]  # (16, 16, *batch); exact in uint32
    lo = outer & MASK
    hi = outer >> LIMB_BITS
    batch = outer.shape[2:]

    def skew(mat):
        padded = jnp.concatenate(
            [mat, jnp.zeros((NLIMBS, NLIMBS + 1) + batch, jnp.uint32)], axis=1
        )
        flat = padded.reshape((NLIMBS * 33,) + batch)
        return flat[: NLIMBS * 32].reshape((NLIMBS, 32) + batch)

    acc = jnp.sum(skew(lo), axis=0, dtype=jnp.uint32)  # <= 16*2^16 per row
    acc_hi = jnp.sum(skew(hi), axis=0, dtype=jnp.uint32)
    acc = acc + jnp.concatenate([jnp.zeros((1,) + batch, jnp.uint32), acc_hi[:-1]])
    return acc


def _mul_skew(a, b):
    acc = _schoolbook_skew(a, b)
    lo = acc[:NLIMBS] + acc[NLIMBS:] * jnp.uint32(38)
    return _finalize(lo)


def _schoolbook(a, b):
    """32 accumulator rows of the 256-bit x 256-bit product, each < 2^21.

    Diagonal (anti-banded) accumulation: acc[k] = sum_{i+j==k} lo(a_i*b_j)
    + sum_{i+j==k-1} hi(a_i*b_j). Every intermediate is a (*batch,)-shaped
    elementwise value, so XLA fuses the whole product into one loop — no
    (16, 16, batch) outer-product or pad/reshape materialization (those cost
    ~16x the operand size in HBM traffic per multiply)."""
    a_rows = [a[i] for i in range(NLIMBS)]
    b_rows = [b[j] for j in range(NLIMBS)]
    acc = [None] * (2 * NLIMBS)
    for i in range(NLIMBS):
        ai = a_rows[i]
        for j in range(NLIMBS):
            p = ai * b_rows[j]  # exact in uint32 (both < 2^16)
            k = i + j
            lo = p & MASK
            hi = p >> LIMB_BITS
            acc[k] = lo if acc[k] is None else acc[k] + lo
            acc[k + 1] = hi if acc[k + 1] is None else acc[k + 1] + hi
    # each row accumulates <= 32 terms < 2^16 -> < 2^21
    return acc  # list of 32 rows


def _schoolbook_sq(a):
    """Squaring: off-diagonal products counted once and doubled
    (~halves the multiply count vs _schoolbook)."""
    a_rows = [a[i] for i in range(NLIMBS)]
    acc = [None] * (2 * NLIMBS)

    def put(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(NLIMBS):
        p = a_rows[i] * a_rows[i]
        put(2 * i, p & MASK)
        put(2 * i + 1, p >> LIMB_BITS)
        for j in range(i + 1, NLIMBS):
            p = a_rows[i] * a_rows[j]
            # doubled cross term: 2*p < 2^33 would overflow; split first.
            lo = (p & MASK) << 1  # < 2^17
            hi = (p >> LIMB_BITS) << 1
            put(i + j, lo)
            put(i + j + 1, hi)
    # rows accumulate <= 32 terms < 2^17 -> < 2^22 (still fine: mul folds to
    # < 2^28 and _finalize tolerates rows up to 2^31)
    return acc


def mul(a, b):
    if not _DIAG[-1]:
        return _mul_skew(a, b)
    acc = _schoolbook(a, b)
    # Fold 2^256 == 38: rows < 2^22 + 38*2^22 < 2^28.
    lo = [acc[i] + acc[NLIMBS + i] * 38 for i in range(NLIMBS)]
    return _finalize(lo)


def sq(a):
    if not _DIAG[-1]:
        return _mul_skew(a, a)
    acc = _schoolbook_sq(a)
    lo = [acc[i] + acc[NLIMBS + i] * 38 for i in range(NLIMBS)]
    return _finalize(lo)


def mul_const(a, value: int):
    """Multiply by a fixed field constant given as a Python int — in diag
    mode the limbs are inlined as scalar immediates (Pallas-safe)."""
    if not _DIAG[-1]:
        return _mul_skew(a, from_int_const(value, a.shape[1:]))
    value %= 2**256
    c_limbs = [(value >> (16 * i)) & 0xFFFF for i in range(NLIMBS)]
    a_rows = [a[i] for i in range(NLIMBS)]
    acc = [None] * (2 * NLIMBS)
    for i in range(NLIMBS):
        ci = c_limbs[i]
        if ci == 0:
            continue
        for j in range(NLIMBS):
            p = a_rows[j] * ci
            k = i + j
            lo = p & MASK
            hi = p >> LIMB_BITS
            acc[k] = lo if acc[k] is None else acc[k] + lo
            acc[k + 1] = hi if acc[k + 1] is None else acc[k + 1] + hi
    zero_like = a_rows[0] - a_rows[0]
    acc = [zero_like if r is None else r for r in acc]
    lo = [acc[i] + acc[NLIMBS + i] * 38 for i in range(NLIMBS)]
    return _finalize(lo)


def mul_small(a, k: int):
    """Multiply by a small constant (k < 2^15)."""
    if _DIAG[-1]:
        return _finalize([a[i] * k for i in range(NLIMBS)])
    return _finalize(a * jnp.uint32(k))


def add_const(a, value: int):
    """a + value for a Python-int constant (limbs inlined as immediates, so
    this is Pallas-safe like mul_const)."""
    value %= 2**256
    if _DIAG[-1]:
        return _finalize(
            [a[i] + ((value >> (16 * i)) & MASK) for i in range(NLIMBS)]
        )
    c = jnp.asarray(
        [(value >> (16 * i)) & MASK for i in range(NLIMBS)], jnp.uint32
    ).reshape((NLIMBS,) + (1,) * (a.ndim - 1))
    return _finalize(a + c)


def sub_from_const(value: int, a):
    """value - a for a Python-int constant (Pallas-safe immediates).
    Rows are value_limb + 4p_limb - a_limb < 2^18: no borrow."""
    value %= 2**256
    if _DIAG[-1]:
        return _finalize(
            [((value >> (16 * i)) & MASK) + FOURP_LIMBS[i] - a[i] for i in range(NLIMBS)]
        )
    c = jnp.asarray(
        [((value >> (16 * i)) & MASK) + FOURP_LIMBS[i] for i in range(NLIMBS)],
        jnp.uint32,
    ).reshape((NLIMBS,) + (1,) * (a.ndim - 1))
    return _finalize(c - a)


def pow2k(a, k: int):
    """a^(2^k) by repeated squaring (fori_loop keeps the graph small)."""
    return lax.fori_loop(0, k, lambda _, x: sq(x), a)


def _pow_chain_250(z, mul_op=None, sq_op=None, pow2k_op=None):
    """z^(2^250 - 1), the shared prefix of the inversion / pow22523 chains.
    The field ops are injectable so callers can run the chain through the
    Pallas elementwise kernels (ops/pallas_point.py fmul/fsq) instead of
    the inline XLA formulas."""
    mul_ = mul_op or mul
    sq_ = sq_op or sq
    p2k = pow2k_op or pow2k
    z2 = sq_(z)
    z9 = mul_(p2k(z2, 2), z)
    z11 = mul_(z9, z2)
    z2_5_0 = mul_(sq_(z11), z9)  # 2^5 - 1
    z2_10_0 = mul_(p2k(z2_5_0, 5), z2_5_0)
    z2_20_0 = mul_(p2k(z2_10_0, 10), z2_10_0)
    z2_40_0 = mul_(p2k(z2_20_0, 20), z2_20_0)
    z2_50_0 = mul_(p2k(z2_40_0, 10), z2_10_0)
    z2_100_0 = mul_(p2k(z2_50_0, 50), z2_50_0)
    z2_200_0 = mul_(p2k(z2_100_0, 100), z2_100_0)
    z2_250_0 = mul_(p2k(z2_200_0, 50), z2_50_0)
    return z2_250_0, z11


def invert(a, mul_op=None, sq_op=None, pow2k_op=None):
    """a^(p-2); returns 0 for input 0."""
    z2_250_0, z11 = _pow_chain_250(a, mul_op, sq_op, pow2k_op)
    mul_ = mul_op or mul
    p2k = pow2k_op or pow2k
    return mul_(p2k(z2_250_0, 5), z11)  # 2^255 - 21 = p - 2


def pow22523(a):
    """a^((p-5)/8) = a^(2^252 - 3) (reference field51/operation/pow22523)."""
    z2_250_0, _ = _pow_chain_250(a)
    return mul(pow2k(z2_250_0, 2), a)


def _sub_borrow(a_rows, b_limbs):
    """(a - b) mod 2^256 limbwise with borrow chain; returns (rows, borrow)."""
    out = []
    borrow = None
    for i in range(NLIMBS):
        t = a_rows[i] + (0x10000 - b_limbs[i])
        if borrow is not None:
            t = t - borrow
        out.append(t & MASK)
        borrow = 1 - (t >> LIMB_BITS)
    return out, borrow


def _sub_borrow_scan(stacked, b_limbs):
    """Array-form borrow chain: (stacked - b) mod 2^256; returns
    (rows, borrow). Same math/order as _sub_borrow."""
    c = jnp.asarray(
        [0x10000 - int(b_limbs[i]) for i in range(NLIMBS)], jnp.uint32
    ).reshape((NLIMBS,) + (1,) * (stacked.ndim - 1))

    def step(borrow, rows):
        t = rows[0] + rows[1] - borrow
        return 1 - (t >> LIMB_BITS), t & MASK

    borrow, out = lax.scan(
        step,
        jnp.zeros_like(stacked[0]),
        (stacked, jnp.broadcast_to(c, stacked.shape)),
        unroll=_scan_unroll(),
    )
    return out, borrow


def canonicalize(a):
    """Fully reduce to [0, p). Stored values are < 2^256 <= 2p + 38, so at
    most two conditional subtractions of p are needed."""
    if _DIAG[-1]:
        rows = list(a)
        for _ in range(2):
            d, borrow = _sub_borrow(rows, P_LIMBS)
            keep = borrow.astype(jnp.bool_)
            rows = [jnp.where(keep, r, dr) for r, dr in zip(rows, d)]
        return jnp.stack(rows)
    rows = a
    for _ in range(2):
        d, borrow = _sub_borrow_scan(rows, P_LIMBS)
        rows = jnp.where(borrow.astype(jnp.bool_)[None], rows, d)
    return rows


def is_negative(a):
    """Canonical-parity sign bit (lsb of the canonical encoding)."""
    return canonicalize(a)[0] & 1


def is_zero(a):
    c = canonicalize(a)
    return jnp.all(c == 0, axis=0)


def eq(a, b):
    return is_zero(sub(a, b))


def cmov(a, b, cond):
    """Select b where cond (broadcast over the limb axis)."""
    return jnp.where(cond[None].astype(jnp.bool_), b, a)


def abs_(a):
    return cmov(a, neg(a), is_negative(a) == 1)


def cneg(a, cond):
    return cmov(a, neg(a), cond)


def to_bytes(a):
    """Canonical 32-byte little-endian encoding: (32, *batch) uint8."""
    c = canonicalize(a)
    lo = (c & jnp.uint32(0xFF)).astype(jnp.uint8)
    hi = ((c >> 8) & jnp.uint32(0xFF)).astype(jnp.uint8)
    return jnp.stack([lo, hi], axis=1).reshape((32,) + a.shape[1:])


def from_bytes(b):
    """(32, *batch) uint8 little-endian -> element; bit 255 is masked
    (reference field51/base/byte_conversion semantics)."""
    b = b.astype(jnp.uint32)
    pairs = b.reshape((NLIMBS, 2) + b.shape[1:])
    limbs = pairs[:, 0] | (pairs[:, 1] << 8)
    limbs = limbs.at[NLIMBS - 1].set(limbs[NLIMBS - 1] & 0x7FFF)
    return limbs
