"""ristretto255 encoding layer over the Edwards curve, batched for TPU.

Canonical 32-byte encode/decode plus the elligator one-way map used by the
canonical generator derivation. Mirrors the semantics of reference
sxt/ristretto/base/{byte_conversion,elligator,sqrt_ratio_m1}.cc (libsodium's
ristretto255), re-expressed as batched vector programs.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import fp25519 as F
from ..refimpl import core as _ref
from .edwards25519 import PointP3


def _c(value: int, batch_ndim: int):
    return F.from_int_const(value, (1,) * batch_ndim)


def _cfull(value: int, like):
    """Constant at the operand's FULL batch shape — required inside Pallas
    kernel bodies (Mosaic cannot broadcast (1, 1) vector tiles)."""
    return F.from_int_const(value, like.shape[1:])


def sqrt_ratio_m1(u, v):
    """Batched SQRT_RATIO_M1: (was_square, x) with x non-negative."""
    sqrtm1 = _cfull(_ref.SQRT_M1, v if v.ndim >= u.ndim else u)
    v3 = F.mul(F.sq(v), v)
    x = F.mul(F.mul(F.sq(v3), v), u)  # u * v^7
    x = F.pow22523(x)
    x = F.mul(F.mul(x, v3), u)  # u * v^3 * (u v^7)^((p-5)/8)
    vxx = F.mul(F.sq(x), v)
    has_m = F.is_zero(F.sub(vxx, u))
    has_p = F.is_zero(F.add(vxx, u))
    has_f = F.is_zero(F.add(vxx, F.mul(u, sqrtm1)))
    x = F.cmov(x, F.mul(x, sqrtm1), has_p | has_f)
    return has_m | has_p, F.abs_(x)


def encode(p: PointP3):
    """Canonical ristretto255 encoding -> (32, *batch) uint8."""
    nd = p.x.ndim - 1
    sqrtm1 = _c(_ref.SQRT_M1, nd)
    invsqrt_amd = _c(_ref.INVSQRT_A_MINUS_D, nd)
    one = _c(1, nd)

    u1 = F.mul(F.add(p.z, p.y), F.sub(p.z, p.y))
    u2 = F.mul(p.x, p.y)
    _, inv_sqrt = sqrt_ratio_m1(one, F.mul(u1, F.sq(u2)))
    den1 = F.mul(inv_sqrt, u1)
    den2 = F.mul(inv_sqrt, u2)
    z_inv = F.mul(F.mul(den1, den2), p.t)
    ix = F.mul(p.x, sqrtm1)
    iy = F.mul(p.y, sqrtm1)
    eden = F.mul(den1, invsqrt_amd)
    rotate = F.is_negative(F.mul(p.t, z_inv)) == 1
    x_ = F.cmov(p.x, iy, rotate)
    y_ = F.cmov(p.y, ix, rotate)
    den_inv = F.cmov(den2, eden, rotate)
    y_ = F.cneg(y_, F.is_negative(F.mul(x_, z_inv)) == 1)
    s = F.abs_(F.mul(den_inv, F.sub(p.z, y_)))
    return F.to_bytes(s)


def decode(data):
    """(32, *batch) uint8 -> (PointP3, valid_mask). Invalid slots hold junk."""
    nd = data.ndim - 1
    one = _c(1, nd)
    d_const = _c(_ref.D, nd)

    # canonical check: value < p and even (reference byte_conversion is_canonical)
    s_limbs = _parse_255(data)
    top_bit = (data[31] >> 7).astype(jnp.uint32)
    canonical = (
        (top_bit == 0)
        & ((data[0] & 1) == 0)
        & jnp.all(F.canonicalize(s_limbs) == s_limbs, axis=0)
    )

    ss = F.sq(s_limbs)
    u1 = F.sub(one, ss)
    u2 = F.add(one, ss)
    u1u1 = F.sq(u1)
    u2u2 = F.sq(u2)
    v = F.sub(F.neg(F.mul(d_const, u1u1)), u2u2)
    was_square, inv_sqrt = sqrt_ratio_m1(one, F.mul(v, u2u2))
    den_x = F.mul(inv_sqrt, u2)
    den_y = F.mul(F.mul(inv_sqrt, den_x), v)
    x = F.abs_(F.mul_small(F.mul(s_limbs, den_x), 2))
    y = F.mul(u1, den_y)
    z = jnp.broadcast_to(one, x.shape)
    t = F.mul(x, y)
    valid = (
        canonical & was_square & (F.is_negative(t) == 0) & jnp.logical_not(F.is_zero(y))
    )
    return PointP3(x, y, z, t), valid


def _parse_255(data):
    """(32, *batch) uint8 LE -> limbs with bit 255 masked."""
    return F.from_bytes(data)


def elligator(t_limbs) -> PointP3:
    """Batched ristretto255 one-way map of a field element. Constants are
    built at full batch shape so the body is Pallas-kernelizable
    (ops/pallas_point.py elligator_form)."""
    sqrtm1 = _cfull(_ref.SQRT_M1, t_limbs)
    one = _cfull(1, t_limbs)
    d_const = _cfull(_ref.D, t_limbs)
    one_minus_dsq = _cfull(_ref.ONE_MINUS_D_SQ, t_limbs)
    d_minus_one_sq = _cfull(_ref.D_MINUS_ONE_SQ, t_limbs)
    sqrt_ad_m1 = _cfull(_ref.SQRT_AD_MINUS_ONE, t_limbs)

    r = F.mul(F.mul(sqrtm1, t_limbs), t_limbs)
    u = F.mul(F.add(r, one), one_minus_dsq)
    neg_one = F.neg(one)
    rpd = F.add(r, d_const)
    v = F.mul(F.sub(neg_one, F.mul(r, d_const)), rpd)
    was_square, s = sqrt_ratio_m1(u, v)
    wasnt = jnp.logical_not(was_square)
    s_prime = F.neg(F.abs_(F.mul(s, t_limbs)))
    s = F.cmov(s, s_prime, wasnt)
    c = F.cmov(neg_one, r, wasnt)
    n = F.mul(F.mul(c, F.sub(r, one)), d_minus_one_sq)
    n = F.sub(n, v)
    w0 = F.mul(F.mul_small(s, 2), v)
    w1 = F.mul(n, sqrt_ad_m1)
    ss = F.sq(s)
    w2 = F.sub(one, ss)
    w3 = F.add(one, ss)
    return PointP3(F.mul(w0, w3), F.mul(w2, w1), F.mul(w1, w3), F.mul(w0, w2))
