"""Batched short-Weierstrass (a = 0) group law over Montgomery-form fields.

One parameterized implementation covers bls12-381 G1, bn254 G1, and Grumpkin
(the reference carries three hand-written copies: sxt/curve_g1, sxt/curve_bng1,
sxt/curve_gk). Addition/doubling are the *complete* projective formulas of
Renes-Costello-Batina 2016 for a = 0 (the same formula family as reference
curve_g1/operation/add.h:46-105), so identity and doubling need no branches —
which is what lets the MSM engine pad with identities and tree-reduce at full
vector width.

Points are ``PointP2(x, y, z)`` with each coordinate a (nlimbs, *batch) uint32
limb array in Montgomery form; identity is (0, 1, 0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..fields import params
from ..fields.mont import MontField
from ..refimpl import weierstrass as ref


class PointP2(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[1:]


class WCurve:
    """Curve instance; hashable (by identity) so it can be a jit static arg."""

    Point = PointP2
    coord_count = 3

    def __init__(self, name: str, field: MontField, b: int, oracle: ref.WCurveRef):
        self.name = name
        self.field = field
        self.b = b % field.modulus
        self.b3 = 3 * b % field.modulus
        self.oracle = oracle
        self.nlimbs = field.nlimbs

    def __repr__(self):
        return f"WCurve({self.name})"

    def make_point(self, *coords) -> PointP2:
        return PointP2(*coords)

    # -- constants -----------------------------------------------------------

    def identity(self, batch_shape=()) -> PointP2:
        F = self.field
        return PointP2(F.zeros(batch_shape), F.one(batch_shape), F.zeros(batch_shape))

    # -- group law -------------------------------------------------------------

    def _batch_lanes(self, p: PointP2) -> int:
        n = 1
        for d in p.x.shape[1:]:
            n *= int(d)
        return n

    def add(self, p: PointP2, q: PointP2) -> PointP2:
        """Dispatch: Pallas kernel on TPU (one Mosaic-compiled body — see
        ops/pallas_point.py), plain jnp otherwise."""
        from ..ops import pallas_point as pp

        if (
            p.x.shape == q.x.shape
            and self._batch_lanes(p) >= pp.MIN_LANES
            and pp.use_pallas()
        ):
            return pp.wadd(self, p, q)
        return self._add_impl(p, q)

    def double(self, p: PointP2) -> PointP2:
        from ..ops import pallas_point as pp

        if self._batch_lanes(p) >= pp.MIN_LANES and pp.use_pallas():
            return pp.wdouble(self, p)
        return self._double_impl(p)

    def _add_impl(self, p: PointP2, q: PointP2) -> PointP2:
        """Complete addition, a = 0 (Renes-Costello-Batina Algorithm 7)."""
        F = self.field
        t0 = F.mul(p.x, q.x)
        t1 = F.mul(p.y, q.y)
        t2 = F.mul(p.z, q.z)
        t3 = F.mul(F.add(p.x, p.y), F.add(q.x, q.y))
        t3 = F.sub(t3, F.add(t0, t1))  # x1y2 + x2y1
        t4 = F.mul(F.add(p.y, p.z), F.add(q.y, q.z))
        t4 = F.sub(t4, F.add(t1, t2))  # y1z2 + y2z1
        x3 = F.mul(F.add(p.x, p.z), F.add(q.x, q.z))
        y3 = F.sub(x3, F.add(t0, t2))  # x1z2 + x2z1
        t0 = F.add(F.add(t0, t0), t0)  # 3*x1x2
        t2 = F.mul_const(t2, self.b3)
        z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        y3 = F.mul_const(y3, self.b3)
        x3 = F.sub(F.mul(t3, t1), F.mul(t4, y3))
        y3 = F.add(F.mul(t1, z3), F.mul(y3, t0))
        z3 = F.add(F.mul(z3, t4), F.mul(t0, t3))
        return PointP2(x3, y3, z3)

    def _double_impl(self, p: PointP2) -> PointP2:
        """Complete doubling, a = 0 (Renes-Costello-Batina Algorithm 9)."""
        F = self.field
        t0 = F.mul(p.y, p.y)
        z3 = F.add(t0, t0)
        z3 = F.add(z3, z3)
        z3 = F.add(z3, z3)  # 8*y^2
        t1 = F.mul(p.y, p.z)
        t2 = F.mul_const(F.mul(p.z, p.z), self.b3)
        x3 = F.mul(t2, z3)
        y3 = F.add(t0, t2)
        z3 = F.mul(t1, z3)
        t1 = F.add(t2, t2)
        t2 = F.add(t1, t2)
        t0 = F.sub(t0, t2)
        y3 = F.add(x3, F.mul(t0, y3))
        x3 = F.mul(t0, F.mul(p.x, p.y))
        x3 = F.add(x3, x3)
        return PointP2(x3, y3, z3)

    def neg(self, p: PointP2) -> PointP2:
        return PointP2(p.x, self.field.neg(p.y), p.z)

    def cneg(self, p: PointP2, cond) -> PointP2:
        F = self.field
        return PointP2(p.x, F.cmov(p.y, F.neg(p.y), cond), p.z)

    def select(self, p: PointP2, q: PointP2, cond) -> PointP2:
        F = self.field
        return PointP2(F.cmov(p.x, q.x, cond), F.cmov(p.y, q.y, cond), F.cmov(p.z, q.z, cond))

    # -- batch plumbing (mirrors curves/edwards25519.py) -----------------------

    def reshape_batch(self, p: PointP2, shape) -> PointP2:
        return PointP2(*(c.reshape((self.nlimbs,) + tuple(shape)) for c in p))

    def index_batch(self, p: PointP2, idx) -> PointP2:
        return PointP2(
            *(c[(slice(None),) + (idx if isinstance(idx, tuple) else (idx,))] for c in p)
        )

    def tree_reduce(self, p: PointP2, axis_size: int) -> PointP2:
        cur = p
        size = axis_size
        while size > 1:
            if size % 2 == 1:
                pad = self.identity(cur.batch_shape[:-1] + (1,))
                cur = PointP2(
                    *(jnp.concatenate([c, pc], axis=-1) for c, pc in zip(cur, pad))
                )
                size += 1
            lo = self.index_batch(cur, (Ellipsis, slice(0, size, 2)))
            hi = self.index_batch(cur, (Ellipsis, slice(1, size, 2)))
            cur = self.add(lo, hi)
            size //= 2
        return self.index_batch(cur, (Ellipsis, 0))

    # -- conversion ------------------------------------------------------------

    def from_affine_ints(self, pts) -> PointP2:
        """List of (x, y) int tuples or None -> (n,) batched projective points."""
        F = self.field
        xs, ys, zs = [], [], []
        for pt in pts:
            if pt is None:
                xs.append(0), ys.append(1), zs.append(0)
            else:
                xs.append(pt[0]), ys.append(pt[1]), zs.append(1)
        return PointP2(F.from_ints(xs), F.from_ints(ys), F.from_ints(zs))

    def to_affine_ints(self, p: PointP2):
        """(n,) batched points -> list of (x, y) int tuples / None (identity)."""
        F = self.field
        zinv = F.inv(p.z)
        xs = F.to_ints(F.mul(p.x, zinv))
        ys = F.to_ints(F.mul(p.y, zinv))
        inf = np.asarray(F.is_zero(p.z))
        return [None if inf[i] else (xs[i], ys[i]) for i in range(len(xs))]

    def to_affine(self, p: PointP2):
        """Batched projective -> (x_mont, y_mont, infinity_mask); identity maps
        to x = y = 0 with the mask set (reference bn254/grumpkin affine output
        convention, cbindings/blitzar_api.h:87-106)."""
        F = self.field
        zinv = F.inv(p.z)  # 0 -> 0, so identity yields (0, 0)
        return F.mul(p.x, zinv), F.mul(p.y, zinv), F.is_zero(p.z)

    def is_on_curve(self, p: PointP2):
        """y^2 z = x^3 + b z^3 (projective curve equation), batched."""
        F = self.field
        lhs = F.mul(F.mul(p.y, p.y), p.z)
        bmont = F._const(self.b * self.field.r % self.field.modulus, p.x.ndim - 1)
        rhs = F.add(F.mul(F.mul(p.x, p.x), p.x), F.mul(bmont, F.mul(F.mul(p.z, p.z), p.z)))
        return F.eq(lhs, rhs)


BLS12381_G1 = WCurve("bls12_381_g1", params.BLS12381_FP, 4, ref.BLS12381_G1)
BN254_G1 = WCurve("bn254_g1", params.BN254_FP, 3, ref.BN254_G1)
GRUMPKIN = WCurve("grumpkin", params.BN254_FR, -17, ref.GRUMPKIN)


import functools

import jax


@functools.partial(jax.jit, static_argnames=())
def _bls_decompress_jit(x_mont, want_largest, inf):
    """x (nlimbs, n) Montgomery; want_largest/inf (n,) bool. Returns
    projective coords + per-point validity (y^2 = x^3 + 4 solvable)."""
    curve = BLS12381_G1
    F = curve.field
    y2 = F.add(
        F.mul(F.mul(x_mont, x_mont), x_mont),
        jnp.broadcast_to(
            F._const(curve.b * F.r % F.modulus, x_mont.ndim - 1), x_mont.shape
        ),
    )
    y = F.sqrt_3mod4(y2)
    ok = F.eq(F.mul(y, y), y2)
    largest = F.gt_const_std(y, (F.modulus - 1) // 2)
    y = F.cmov(y, F.neg(y), largest != want_largest)
    one = F.one(x_mont.shape[1:])
    zero = F.zeros(x_mont.shape[1:])
    x_out = F.cmov(x_mont, zero, inf)
    y_out = F.cmov(y, one, inf)
    z_out = F.cmov(one, zero, inf)
    valid = ok | inf
    return x_out, y_out, z_out, valid


def decompress_bls12_381(data: np.ndarray):
    """(n, 48) uint8 zcash-format compressed encodings -> (PointP2 batch,
    (n,) bool valid). Device-side sqrt chain + sign selection (reference
    curve_g1/operation/compression.cc decompression direction); the host
    only shuffles flag bits and byte order."""
    data = np.asarray(data, np.uint8).reshape(-1, 48)
    flags = data[:, 0]
    compressed = (flags & 0b1000_0000) != 0
    inf = (flags & 0b0100_0000) != 0
    want_largest = (flags & 0b0010_0000) != 0
    xb = data.copy()
    xb[:, 0] &= 0b0001_1111
    # canonicality (zkcrypto G1Affine::from_compressed semantics; the
    # reference only implements the compress direction,
    # curve_g1/operation/compression.cc): the x payload must be < p, and an
    # infinity encoding must carry a clear sort bit and an all-zero payload
    p_be = np.frombuffer(ref.BLS12381_P.to_bytes(48, "big"), np.uint8)
    diff = xb.astype(np.int16) - p_be.astype(np.int16)
    nz = diff != 0
    first = np.argmax(nz, axis=1)
    x_lt_p = np.where(
        nz.any(axis=1), diff[np.arange(xb.shape[0]), first] < 0, False
    )
    x_zero = (xb == 0).all(axis=1)
    canonical = np.where(inf, ~want_largest & x_zero, x_lt_p)
    x_le = np.ascontiguousarray(xb[:, ::-1].T)  # (48, n) little-endian
    F = BLS12381_G1.field
    x_mont = F.from_bytes_le(jnp.asarray(x_le))
    x_out, y_out, z_out, valid = _bls_decompress_jit(
        x_mont, jnp.asarray(want_largest), jnp.asarray(inf)
    )
    valid = np.asarray(valid) & compressed & canonical
    return PointP2(x_out, y_out, z_out), valid


def compress_bls12_381(p: PointP2) -> np.ndarray:
    """(n,) bls12-381 G1 batch -> (n, 48) uint8 zcash-format compressed
    encodings (reference curve_g1/operation/compression.cc:34-60)."""
    curve = BLS12381_G1
    F = curve.field
    x_mont, y_mont, inf = curve.to_affine(p)
    x_std = np.asarray(F.to_bytes_le(x_mont))  # (48, n) LE
    y_std = np.asarray(F.to_bytes_le(y_mont))
    n = x_std.shape[1]
    out = x_std[::-1].T.copy()  # big-endian rows
    y_ints = [
        sum(int(y_std[i, j]) << (8 * i) for i in range(y_std.shape[0]))
        for j in range(n)
    ]
    inf = np.asarray(inf)
    half = (ref.BLS12381_P - 1) // 2
    for j in range(n):
        if inf[j]:
            out[j] = 0
            out[j, 0] = 0b1100_0000
        else:
            out[j, 0] |= 0b1000_0000
            if y_ints[j] > half:
                out[j, 0] |= 0b0010_0000
    return out
