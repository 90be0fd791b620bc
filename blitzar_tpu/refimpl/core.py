"""Pure-Python reference oracle for curve25519 / ristretto255 primitives.

This module is the bit-exactness anchor for the TPU implementation. It mirrors
the semantics of the reference library's cpu backend (see
/root/reference/sxt/ristretto/base/elligator.cc, sqrt_ratio_m1.cc,
byte_conversion.cc and sxt/seqcommit/generator/base_element.cc:30-45) using
plain Python integers. It is deliberately slow and simple: tests compare the
vectorized JAX/TPU implementation against this oracle, and this oracle is
itself pinned to the upstream end-to-end commitment vectors
(reference rust/tests/src/main.rs:26-48).

All algorithms here are the standard, public ristretto255 / libsodium
constructions; nothing is copied from the reference sources.
"""

from __future__ import annotations

import hashlib

# ---------------------------------------------------------------------------
# Field GF(2^255 - 19)
# ---------------------------------------------------------------------------

P = 2**255 - 19
L = 2**252 + 27742317777372353535851937790883648493  # curve25519 group order
D = (-121665 * pow(121666, P - 2, P)) % P
D2 = (2 * D) % P


def _sqrt_candidate(x: int) -> int:
    """Return r with r^2 == x or r^2 == -x (mod p), via the (p+3)/8 exponent."""
    return pow(x, (P + 3) // 8, P)


def fe_is_negative(x: int) -> int:
    return (x % P) & 1


def fe_abs(x: int) -> int:
    x %= P
    return P - x if x & 1 else x


def _fixed_root(x: int) -> int:
    """The canonical (non-negative) square root of x; raises if non-square."""
    r = _sqrt_candidate(x)
    if (r * r - x) % P != 0:
        r = (r * SQRT_M1) % P
    if (r * r - x) % P != 0:
        raise ValueError("not a square")
    return fe_abs(r)


# sqrt(-1): fixed to the even (non-negative) root, which matches the
# libsodium/dalek constant. Verified end-to-end by the pinned rust vectors.
SQRT_M1 = fe_abs(pow(2, (P - 1) // 4, P))
assert (SQRT_M1 * SQRT_M1 + 1) % P == 0

ONE_MINUS_D_SQ = (1 - D * D) % P
D_MINUS_ONE_SQ = ((D - 1) * (D - 1)) % P
# sqrt(a*d - 1) with a = -1: used by elligator. The *negative* (odd) root is
# the libsodium convention; pinned by the upstream rust end-to-end vectors.
SQRT_AD_MINUS_ONE = (-_fixed_root((-D - 1) % P)) % P
# 1/sqrt(a - d) with a = -1.
INVSQRT_A_MINUS_D = pow(_fixed_root((-1 - D) % P), P - 2, P)


def sqrt_ratio_m1(u: int, v: int):
    """ristretto255 SQRT_RATIO_M1: returns (was_square, x).

    x = sqrt(u/v) if u/v is square, else sqrt(sqrt(-1)*u/v); x is non-negative.
    Semantics match reference sxt/ristretto/base/sqrt_ratio_m1.cc.
    """
    u %= P
    v %= P
    v3 = (v * v % P) * v % P
    v7 = (v3 * v3 % P) * v % P
    x = (u * v7) % P
    x = pow(x, (P - 5) // 8, P)
    x = x * u % P * v3 % P
    vxx = x * x % P * v % P
    has_m_root = (vxx - u) % P == 0
    has_p_root = (vxx + u) % P == 0
    has_f_root = (vxx + u * SQRT_M1) % P == 0
    if has_p_root or has_f_root:
        x = x * SQRT_M1 % P
    return (has_m_root or has_p_root), fe_abs(x)


# ---------------------------------------------------------------------------
# Edwards curve (a = -1, d): extended coordinates (X, Y, Z, T), x*y = T/Z
# ---------------------------------------------------------------------------

IDENTITY = (0, 1, 1, 0)


def pt_add(p, q):
    """Unified twisted-Edwards addition (complete for a=-1)."""
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    A = (Y1 - X1) * (Y2 - X2) % P
    B = (Y1 + X1) * (Y2 + X2) % P
    C = T1 * D2 % P * T2 % P
    Dv = 2 * Z1 * Z2 % P
    E = (B - A) % P
    F = (Dv - C) % P
    G = (Dv + C) % P
    H = (B + A) % P
    return (E * F % P, G * H % P, F * G % P, E * H % P)


def pt_double(p):
    X1, Y1, Z1, _ = p
    A = X1 * X1 % P
    B = Y1 * Y1 % P
    C = 2 * Z1 * Z1 % P
    H = (A + B) % P
    E = (H - (X1 + Y1) * (X1 + Y1)) % P
    G = (A - B) % P
    F = (C + G) % P
    return (E * F % P, G * H % P, F * G % P, E * H % P)


def pt_neg(p):
    X, Y, Z, T = p
    return ((-X) % P, Y, Z, (-T) % P)


def pt_scalar_mul(k: int, p):
    acc = IDENTITY
    while k:
        if k & 1:
            acc = pt_add(acc, p)
        p = pt_double(p)
        k >>= 1
    return acc


def pt_eq(p, q) -> bool:
    """Group-element equality (projective, ristretto torsion-safe via encode)."""
    return ristretto_encode(p) == ristretto_encode(q)


# ---------------------------------------------------------------------------
# Ristretto255 encode / decode
# ---------------------------------------------------------------------------


def ristretto_encode(p) -> bytes:
    """Canonical 32-byte ristretto encoding (reference byte_conversion.cc to_bytes)."""
    X, Y, Z, T = p
    u1 = (Z + Y) * (Z - Y) % P
    u2 = X * Y % P
    _, inv_sqrt = sqrt_ratio_m1(1, u1 * u2 % P * u2 % P)
    den1 = inv_sqrt * u1 % P
    den2 = inv_sqrt * u2 % P
    z_inv = den1 * den2 % P * T % P
    ix = X * SQRT_M1 % P
    iy = Y * SQRT_M1 % P
    eden = den1 * INVSQRT_A_MINUS_D % P
    t_z_inv = T * z_inv % P
    rotate = fe_is_negative(t_z_inv)
    if rotate:
        x_, y_, den_inv = iy, ix, eden
    else:
        x_, y_, den_inv = X, Y, den2
    if fe_is_negative(x_ * z_inv % P):
        y_ = (-y_) % P
    s = fe_abs(den_inv * (Z - y_) % P)
    return int(s).to_bytes(32, "little")


def ristretto_decode(data: bytes):
    """Decode 32 bytes to a point; returns None when invalid."""
    if len(data) != 32:
        return None
    s = int.from_bytes(data, "little")
    # canonical & non-negative check
    if s >= P or (s & 1):
        return None
    ss = s * s % P
    u1 = (1 - ss) % P
    u2 = (1 + ss) % P
    u1u1 = u1 * u1 % P
    u2u2 = u2 * u2 % P
    v = (-(D * u1u1) - u2u2) % P
    was_square, inv_sqrt = sqrt_ratio_m1(1, v * u2u2 % P)
    den_x = inv_sqrt * u2 % P
    den_y = inv_sqrt * den_x % P * v % P
    X = fe_abs(2 * s * den_x % P)
    Y = u1 * den_y % P
    Z = 1
    T = X * Y % P
    if (not was_square) or fe_is_negative(T) or Y == 0:
        return None
    return (X, Y, Z, T)


# ---------------------------------------------------------------------------
# Elligator map + canonical generator derivation
# ---------------------------------------------------------------------------


def apply_elligator(t: int):
    """ristretto255 one-way map of a field element to a point.

    Mirrors reference sxt/ristretto/base/elligator.cc (libsodium's
    ristretto255_elligator).
    """
    t %= P
    r = SQRT_M1 * t % P * t % P
    u = (r + 1) * ONE_MINUS_D_SQ % P
    c = (-1) % P
    rpd = (r + D) % P
    v = (c - r * D) % P * rpd % P
    was_square, s = sqrt_ratio_m1(u, v)
    if not was_square:
        s = (-fe_abs(s * t % P)) % P
        c = r
    n = c * ((r - 1) % P) % P * D_MINUS_ONE_SQ % P
    n = (n - v) % P
    w0 = 2 * s * v % P
    w1 = n * SQRT_AD_MINUS_ONE % P
    ss = s * s % P
    w2 = (1 - ss) % P
    w3 = (1 + ss) % P
    return (w0 * w3 % P, w2 * w1 % P, w1 * w3 % P, w0 * w2 % P)


M64 = (1 << 64) - 1


class Xorshift128p:
    """xorshift128+ exactly as reference base/num/fast_random_number_generator.h."""

    def __init__(self, seed1: int, seed2: int):
        self.a = seed1 & M64
        self.b = seed2 & M64

    def next(self) -> int:
        t = self.a
        s = self.b
        self.a = s
        t ^= (t << 23) & M64
        t ^= t >> 17
        t ^= s ^ (s >> 26)
        self.b = t
        return (t + s) & M64


def random_field_element(rng: Xorshift128p) -> int:
    """4 rng outputs -> 32 LE bytes -> field element (top bit masked).

    Mirrors reference sxt/field51/random/element.cc (from_bytes ignores bit 255).
    """
    raw = b"".join(rng.next().to_bytes(8, "little") for _ in range(4))
    return (int.from_bytes(raw, "little") & ((1 << 255) - 1)) % P


def compute_base_element(index: int):
    """Canonical generator for a row index.

    Mirrors reference seqcommit/generator/base_element.cc:30-45:
    rng = xorshift128+(index+1, index+2); two field elements -> elligator each,
    then point addition (ristretto FROM_UNIFORM_BYTES structure).
    """
    rng = Xorshift128p(index + 1, index + 2)
    r0 = random_field_element(rng)
    r1 = random_field_element(rng)
    return pt_add(apply_elligator(r1), apply_elligator(r0))


def get_generators(n: int, offset: int = 0):
    return [compute_base_element(i) for i in range(offset, offset + n)]


def one_commitments(n: int):
    """one_commits[i] = sum_{j<i} G_j (c_0 = identity)."""
    out = [IDENTITY]
    acc = IDENTITY
    for i in range(n - 1):
        acc = pt_add(acc, compute_base_element(i))
        out.append(acc)
    return out[:n]


# ---------------------------------------------------------------------------
# Naive MSM / Pedersen commitment oracle
# ---------------------------------------------------------------------------


def decode_scalar(data: bytes, is_signed: bool):
    """Decode an exponent-sequence entry: returns (abs_value, sign)."""
    v = int.from_bytes(data, "little")
    nbits = 8 * len(data)
    if is_signed and v >= 1 << (nbits - 1):
        return (1 << nbits) - v, -1
    return v, 1


def naive_msm(scalars, points):
    """sum_i scalars[i] * points[i]; scalars are python ints (may be negative)."""
    acc = IDENTITY
    for s, g in zip(scalars, points):
        if s == 0:
            continue
        term = pt_scalar_mul(abs(s), g)
        if s < 0:
            term = pt_neg(term)
        acc = pt_add(acc, term)
    return acc


def pedersen_commitment(data_rows, nbytes: int, is_signed: bool, generators=None):
    """One Pedersen commitment: data_rows is a list of per-row byte values (ints)."""
    n = len(data_rows)
    if generators is None:
        generators = get_generators(n)
    scalars = []
    for v in data_rows:
        raw = int(v).to_bytes(nbytes, "little", signed=False)
        a, sgn = decode_scalar(raw, is_signed)
        scalars.append(sgn * a)
    return naive_msm(scalars, generators[:n])
