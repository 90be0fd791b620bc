"""Pallas kernel conformance vs the plain jnp group law, in interpret mode —
the driver-conformance style of the reference (reference
proof/inner_product/driver_test.h: CPU oracle vs GPU driver), here plain-XLA
oracle vs Mosaic kernel semantics."""

import numpy as np
import pytest

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import edwards25519 as ed
from blitzar_tpu.curves import weierstrass as wc
from blitzar_tpu.ops import pallas_point as pp


@pytest.fixture(scope="module")
def points():
    return gen.ristretto_generators(160)


def test_edwards_add_double_interpret(points):
    p = ed.index_batch(points, (slice(0, 80),))
    q = ed.index_batch(points, (slice(80, 160),))
    r_kernel = pp.add(p, q, interpret=True)
    r_plain = ed._add_impl(p, q)
    for c1, c2 in zip(r_kernel, r_plain):
        assert (np.asarray(c1) == np.asarray(c2)).all()

    d_kernel = pp.double(p, interpret=True)
    d_plain = ed._double_impl(p)
    for c1, c2 in zip(d_kernel, d_plain):
        assert (np.asarray(c1) == np.asarray(c2)).all()


def test_edwards_combine_interpret(points):
    num_bits, o = 8, 2
    prods = ed.reshape_batch(points, (10, 16))
    prods = ed.index_batch(prods, (slice(0, o), slice(0, num_bits)))
    got = pp.doubling_combine(prods, num_bits, interpret=True)
    # plain ladder
    acc = ed.index_batch(prods, (Ellipsis, num_bits - 1))
    for b in range(num_bits - 2, -1, -1):
        acc = ed._double_impl(acc)
        acc = ed._add_impl(acc, ed.index_batch(prods, (Ellipsis, b)))
    for c1, c2 in zip(got, acc):
        assert (np.asarray(c1) == np.asarray(c2)).all()


@pytest.mark.parametrize(
    "curve", [wc.BN254_G1, wc.BLS12381_G1, wc.GRUMPKIN], ids=lambda c: c.name
)
def test_weierstrass_add_double_interpret(curve):
    pts = curve.oracle.random_points(6, seed=13) + [None, None]
    batch = curve.from_affine_ints(pts)
    r_kernel = pp.wadd(curve, batch, batch, interpret=True)
    r_plain = curve._add_impl(batch, batch)
    for c1, c2 in zip(r_kernel, r_plain):
        assert (np.asarray(c1) == np.asarray(c2)).all()

    d_kernel = pp.wdouble(curve, batch, interpret=True)
    d_plain = curve._double_impl(batch)
    for c1, c2 in zip(d_kernel, d_plain):
        assert (np.asarray(c1) == np.asarray(c2)).all()
