"""curve25519 in twisted-Edwards form (a = -1), extended coordinates.

Batched group law over (16, *batch)-limb field elements. The unified addition
is complete (handles identity and doubling), which is what makes the MSM
tree-reduction mask-free: padding slots are filled with the identity.

Mirrors the semantics of reference sxt/curve21/operation/{add,double}.h
(libsodium's unified Edwards formulas) without the p1p1/cached intermediate
types — on TPU every op is a fused batched vector program, so the staging
types would only obscure XLA's view.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..fields import fp25519 as F
from ..refimpl.core import D as _D_INT


class PointP3(NamedTuple):
    """Extended coordinates: x*y = t*z, point = (x/z, y/z)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    t: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[1:]


_P = 2**255 - 19
D2_INT = (2 * _D_INT) % _P
# 1/2 mod p (used to reconstruct x, y from a niels triple)
INV2_INT = (_P + 1) // 2
# (2d)^-1 mod p (recovers t = x*y from the pre-scaled stored coordinate)
INV_D2_INT = pow(D2_INT, _P - 2, _P)


class Niels(NamedTuple):
    """Affine precomputed form: (a, b, t2d) = (y + x, y - x, 2d * x * y),
    z = 1 implied — the storage form of partition-table entries (the analog
    of libsodium's ge25519_precomp / the reference's compact_element,
    curve21/type/compact_element.h). Pre-scaling the t coordinate by 2d
    makes the mixed add (madd) of an extended accumulator and a table entry
    exactly 7 muls — the hot op of the fused lookup kernel
    (ops/pallas_point.py)."""

    a: jnp.ndarray
    b: jnp.ndarray
    t: jnp.ndarray

# curve-protocol attributes (shared with curves/weierstrass.py's WCurve) so
# the MSM engine can take this module itself as its static `curve` argument
Point = PointP3
make_point = PointP3
coord_count = 4
nlimbs = F.NLIMBS
name = "curve25519"





def identity(batch_shape=()) -> PointP3:
    zero = F.zeros(batch_shape)
    one = F.from_int_const(1, batch_shape)
    return PointP3(zero, one, one, zero)


def _add_impl(p: PointP3, q: PointP3) -> PointP3:
    """Unified twisted-Edwards addition (add-2008-hwcd-3, a = -1)."""
    a = F.mul(F.sub(p.y, p.x), F.sub(q.y, q.x))
    b = F.mul(F.add(p.y, p.x), F.add(q.y, q.x))
    c = F.mul_const(F.mul(p.t, q.t), D2_INT)
    d = F.mul_small(F.mul(p.z, q.z), 2)
    e = F.sub(b, a)
    f = F.sub(d, c)
    g = F.add(d, c)
    h = F.add(b, a)
    return PointP3(F.mul(e, f), F.mul(g, h), F.mul(f, g), F.mul(e, h))


def _niels_add_impl(n1: Niels, n2: Niels) -> PointP3:
    """Sum of two niels-form (z = 1) points -> extended. Same unified
    add-2008-hwcd-3 law as _add_impl with Z1 = Z2 = 1 and the (y±x) sums
    precomputed in the representation: 7 muls + 1 const-mul (vs 9 + 1 + 1).
    Both stored t's carry a 2d factor, so C = t1*t2/(2d). Complete — the
    identity is (1, 1, 0)."""
    a = F.mul(n1.b, n2.b)
    b = F.mul(n1.a, n2.a)
    c = F.mul_const(F.mul(n1.t, n2.t), INV_D2_INT)
    e = F.sub(b, a)
    f = F.sub_from_const(2, c)
    g = F.add_const(c, 2)
    h = F.add(b, a)
    return PointP3(F.mul(e, f), F.mul(g, h), F.mul(f, g), F.mul(e, h))


def _madd_impl(p: PointP3, n: Niels) -> PointP3:
    """Mixed add: extended + niels table entry (z2 = 1, t2 pre-scaled by
    2d) -> extended. 7 muls, no constant mul (libsodium ge25519_madd).
    Complete for the same reason the unified add is."""
    a = F.mul(F.sub(p.y, p.x), n.b)
    b = F.mul(F.add(p.y, p.x), n.a)
    c = F.mul(p.t, n.t)  # = 2d * T1 * t2
    d = F.mul_small(p.z, 2)
    e = F.sub(b, a)
    f = F.sub(d, c)
    g = F.add(d, c)
    h = F.add(b, a)
    return PointP3(F.mul(e, f), F.mul(g, h), F.mul(f, g), F.mul(e, h))


class Cached(NamedTuple):
    """Projective precomputed form: (a, b, z, t2d) = (y+x, y-x, z, 2d*t) —
    the z-unnormalized analog of Niels (libsodium ge25519_cached). Built
    from extended coordinates with just two adds and one const-mul, so it
    is the table form for STREAMED (build-per-query) MSMs, where the niels
    form's batch inversion would dominate the build."""

    a: jnp.ndarray
    b: jnp.ndarray
    z: jnp.ndarray
    t: jnp.ndarray


def to_cached(p: PointP3) -> Cached:
    return Cached(
        F.add(p.y, p.x), F.sub(p.y, p.x), p.z, F.mul_const(p.t, D2_INT)
    )


def cached_to_p3(c: Cached) -> PointP3:
    """(a, b, z, 2d*t) -> extended (x, y, z, t) with x*y = t*z."""
    x = F.mul_const(F.sub(c.a, c.b), INV2_INT)
    y = F.mul_const(F.add(c.a, c.b), INV2_INT)
    return PointP3(x, y, c.z, F.mul_const(c.t, INV_D2_INT))


def _cadd_impl(p: PointP3, c: Cached) -> PointP3:
    """Mixed add: extended + cached table entry -> extended. 8 muls + one
    small-mul (libsodium ge25519_add). Complete."""
    a = F.mul(F.sub(p.y, p.x), c.b)
    b = F.mul(F.add(p.y, p.x), c.a)
    cc = F.mul(p.t, c.t)  # = 2d * T1 * T2
    zz = F.mul(p.z, c.z)
    d = F.mul_small(zz, 2)
    e = F.sub(b, a)
    f = F.sub(d, cc)
    g = F.add(d, cc)
    h = F.add(b, a)
    return PointP3(F.mul(e, f), F.mul(g, h), F.mul(f, g), F.mul(e, h))


def niels_to_p3(n: Niels) -> PointP3:
    """(a, b, 2d*t) -> (x, y, 1, t) with x = (a-b)/2, y = (a+b)/2."""
    x = F.mul_const(F.sub(n.a, n.b), INV2_INT)
    y = F.mul_const(F.add(n.a, n.b), INV2_INT)
    one = F.from_int_const(1, x.shape[1:])
    return PointP3(x, y, one, F.mul_const(n.t, INV_D2_INT))


def niels_add(n1: Niels, n2: Niels) -> PointP3:
    """Dispatch like add(): Pallas kernel on TPU for large batches."""
    from ..ops import pallas_point as pp

    if (
        n1.a.shape == n2.a.shape
        and _batch_lanes_arr(n1.a) >= pp.MIN_LANES
        and pp.use_pallas()
    ):
        return pp.niels_add(n1, n2)
    return _niels_add_impl(n1, n2)


def _batch_lanes_arr(c) -> int:
    n = 1
    for d in c.shape[1:]:
        n *= int(d)
    return n


def _double_impl(p: PointP3) -> PointP3:
    a = F.sq(p.x)
    b = F.sq(p.y)
    c = F.mul_small(F.sq(p.z), 2)
    h = F.add(a, b)
    e = F.sub(h, F.sq(F.add(p.x, p.y)))
    g = F.sub(a, b)
    f = F.add(c, g)
    return PointP3(F.mul(e, f), F.mul(g, h), F.mul(f, g), F.mul(e, h))


def _batch_lanes(p: PointP3) -> int:
    n = 1
    for d in p.x.shape[1:]:
        n *= int(d)
    return n


def add(p: PointP3, q: PointP3) -> PointP3:
    """Dispatch: Pallas kernel on TPU for large equal-shape batches (one
    Mosaic-compiled body instead of ~10^4 inlined HLO ops per add — see
    ops/pallas_point.py), plain jnp otherwise."""
    from ..ops import pallas_point as pp

    if (
        p.x.shape == q.x.shape
        and _batch_lanes(p) >= pp.MIN_LANES
        and pp.use_pallas()
    ):
        return pp.add(p, q)
    return _add_impl(p, q)


def double(p: PointP3) -> PointP3:
    from ..ops import pallas_point as pp

    if _batch_lanes(p) >= pp.MIN_LANES and pp.use_pallas():
        return pp.double(p)
    return _double_impl(p)


def neg(p: PointP3) -> PointP3:
    return PointP3(F.neg(p.x), p.y, p.z, F.neg(p.t))


def cneg(p: PointP3, cond) -> PointP3:
    """Conditionally negate (cond broadcast over the batch shape)."""
    return PointP3(F.cneg(p.x, cond), p.y, p.z, F.cneg(p.t, cond))


def is_identity(p: PointP3):
    """Per-lane identity test: X == 0 and Y == Z (reference
    curve21/property/identity.cc)."""
    return F.is_zero(p.x) & F.eq(p.y, p.z)


def is_on_curve(p: PointP3):
    """Per-lane curve-membership test in homogeneous coordinates
    ((Y^2 - X^2) * Z^2 == Z^4 + d * X^2 * Y^2, reference
    curve21/property/curve.cc), plus the extended-coordinate invariant
    X*Y == Z*T that the p3 representation carries."""
    x2, y2, z2 = F.sq(p.x), F.sq(p.y), F.sq(p.z)
    lhs = F.mul(F.sub(y2, x2), z2)
    rhs = F.add(F.sq(z2), F.mul_const(F.mul(x2, y2), _D_INT))
    t_ok = F.eq(F.mul(p.x, p.y), F.mul(p.z, p.t))
    return F.eq(lhs, rhs) & t_ok


def select(p: PointP3, q: PointP3, cond) -> PointP3:
    """Pointwise select: q where cond else p."""
    return PointP3(
        F.cmov(p.x, q.x, cond),
        F.cmov(p.y, q.y, cond),
        F.cmov(p.z, q.z, cond),
        F.cmov(p.t, q.t, cond),
    )


def stack(points, axis=1):
    """Stack a list of equal-shape points along a new batch axis."""
    return PointP3(*(jnp.stack(cs, axis=axis) for cs in zip(*points)))


def reshape_batch(p: PointP3, shape) -> PointP3:
    return PointP3(*(c.reshape((F.NLIMBS,) + tuple(shape)) for c in p))


def index_batch(p: PointP3, idx) -> PointP3:
    """Index/slice the batch axes (limb axis untouched)."""
    return PointP3(*(c[(slice(None),) + (idx if isinstance(idx, tuple) else (idx,))] for c in p))


def tree_reduce(p: PointP3, axis_size: int) -> PointP3:
    """Sum points along the LAST batch axis by halving; identity-absorbing.

    The unified add is complete, so callers pad with identity() instead of
    masking. Work is ~axis_size adds total across log2 levels, each level a
    full-width batched add (this is the TPU dual of the reference's per-thread
    serial bucket walks, reference multiexp/bucket_method/accumulation_kernel.h).
    """
    cur = p
    size = axis_size
    while size > 1:
        if size % 2 == 1:
            pad = identity(cur.batch_shape[:-1] + (1,))
            cur = PointP3(*(jnp.concatenate([c, pc], axis=-1) for c, pc in zip(cur, pad)))
            size += 1
        lo = index_batch(cur, (Ellipsis, slice(0, size, 2)))
        hi = index_batch(cur, (Ellipsis, slice(1, size, 2)))
        cur = add(lo, hi)
        size //= 2
    return index_batch(cur, (Ellipsis, 0))
