"""Property tests for the vectorized GF(2^255-19) core vs Python ints."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from blitzar_tpu.fields import fp25519 as F
from blitzar_tpu.refimpl.core import P
from blitzar_tpu.utils.limbs import ints_to_limbs, limbs_to_ints

rng = random.Random(97834978)


def rand_vals(n, bound=2**256):
    # stored-invariant values: any value < 2^256
    return [rng.randrange(bound) for _ in range(n)]


def to_dev(vals):
    return jnp.asarray(ints_to_limbs(vals, F.NLIMBS))


def from_dev(arr):
    return limbs_to_ints(np.asarray(arr))


N = 33  # deliberately non-round batch


def test_add_sub_neg():
    a, b = rand_vals(N), rand_vals(N)
    da, db = to_dev(a), to_dev(b)
    assert [v % P for v in from_dev(F.add(da, db))] == [(x + y) % P for x, y in zip(a, b)]
    assert [v % P for v in from_dev(F.sub(da, db))] == [(x - y) % P for x, y in zip(a, b)]
    assert [v % P for v in from_dev(F.neg(da))] == [(-x) % P for x in a]


def test_mul_sq():
    a, b = rand_vals(N), rand_vals(N)
    da, db = to_dev(a), to_dev(b)
    assert [v % P for v in from_dev(F.mul(da, db))] == [x * y % P for x, y in zip(a, b)]
    assert [v % P for v in from_dev(F.sq(da))] == [x * x % P for x in a]


def test_mul_edge_cases():
    vals = [0, 1, P - 1, P, P + 1, 2**256 - 1, 2**255 - 19, 2**255, 19, 38]
    da = to_dev(vals)
    db = to_dev(list(reversed(vals)))
    got = [v % P for v in from_dev(F.mul(da, db))]
    want = [x * y % P for x, y in zip(vals, reversed(vals))]
    assert got == want


def test_invert_pow22523():
    a = [v or 1 for v in rand_vals(9)]
    da = to_dev(a)
    inv = jax.jit(F.invert)(da)
    assert [v % P for v in from_dev(inv)] == [pow(x, P - 2, P) for x in a]
    p225 = jax.jit(F.pow22523)(da)
    assert [v % P for v in from_dev(p225)] == [pow(x, (P - 5) // 8, P) for x in a]


def test_canonicalize_bytes_roundtrip():
    vals = rand_vals(N) + [0, 1, P - 1, P, 2 * P - 1, 2 * P, 2**256 - 1]
    da = to_dev(vals)
    canon = from_dev(F.canonicalize(da))
    assert canon == [v % P for v in vals]
    b = F.to_bytes(da)
    assert b.shape == (32, len(vals))
    for j, v in enumerate(vals):
        assert bytes(np.asarray(b[:, j])) == (v % P).to_bytes(32, "little")
    back = F.from_bytes(b)
    assert from_dev(back) == [v % P for v in vals]


def test_sign_helpers():
    vals = [0, 1, 2, P - 1, P + 2, 7]
    da = to_dev(vals)
    assert list(np.asarray(F.is_negative(da))) == [(v % P) & 1 for v in vals]
    assert [v % P for v in from_dev(F.abs_(da))] == [
        (P - v % P) if (v % P) & 1 else v % P for v in vals
    ]
    assert list(np.asarray(F.is_zero(da))) == [v % P == 0 for v in vals]


def test_batch_shapes():
    # 2-D batch shape (limb axis leading)
    vals = rand_vals(12)
    da = to_dev(vals).reshape(F.NLIMBS, 3, 4)
    out = F.mul(da, da).reshape(F.NLIMBS, 12)
    assert [v % P for v in from_dev(out)] == [x * x % P for x in vals]
