"""Generic Montgomery field vs Python ints, all four instances."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from blitzar_tpu.fields.params import BLS12381_FP, BN254_FP, BN254_FR, SCALAR25519

rng = random.Random(97834978)
FIELDS = [SCALAR25519, BN254_FP, BN254_FR, BLS12381_FP]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_ring_ops(f):
    m = f.modulus
    vals_a = [0, 1, m - 1, rng.randrange(m), rng.randrange(m), rng.randrange(m)]
    vals_b = [m - 1, 0, 1, rng.randrange(m), rng.randrange(m), 2]
    a, b = f.from_ints(vals_a), f.from_ints(vals_b)
    assert f.to_ints(f.add(a, b)) == [(x + y) % m for x, y in zip(vals_a, vals_b)]
    assert f.to_ints(f.sub(a, b)) == [(x - y) % m for x, y in zip(vals_a, vals_b)]
    assert f.to_ints(f.mul(a, b)) == [x * y % m for x, y in zip(vals_a, vals_b)]
    assert f.to_ints(f.neg(a)) == [(-x) % m for x in vals_a]


@pytest.mark.parametrize("f", [SCALAR25519, BLS12381_FP], ids=lambda f: f.name)
def test_inv_and_pow(f):
    m = f.modulus
    vals = [1, 2, m - 1, rng.randrange(1, m)]
    a = f.from_ints(vals)
    assert f.to_ints(f.inv(a)) == [pow(x, m - 2, m) for x in vals]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_bytes_roundtrip_and_reduction(f):
    m = f.modulus
    # values deliberately >= m (unreduced byte inputs must reduce mod m)
    vals = [0, 1, m - 1, m, m + 12345, (1 << f.radix_bits) - 1, rng.randrange(1 << f.radix_bits)]
    raw = np.zeros((f.nbytes, len(vals)), np.uint8)
    for j, v in enumerate(vals):
        raw[:, j] = list(int(v).to_bytes(f.nbytes, "little"))
    el = f.from_bytes_le(jnp.asarray(raw))
    assert f.to_ints(el) == [v % m for v in vals]
    back = np.asarray(f.to_bytes_le(el))
    for j, v in enumerate(vals):
        assert bytes(back[:, j]) == (v % m).to_bytes(f.nbytes, "little")


def test_sqrt_3mod4():
    f = BLS12381_FP
    m = f.modulus
    squares = [pow(rng.randrange(1, m), 2, m) for _ in range(4)]
    r = f.to_ints(f.sqrt_3mod4(f.from_ints(squares)))
    for root, s in zip(r, squares):
        assert root * root % m == s


def test_inner_product_and_tree_sum():
    f = SCALAR25519
    m = f.modulus
    n = 13
    va = [rng.randrange(m) for _ in range(n)]
    vb = [rng.randrange(m) for _ in range(n)]
    a, b = f.from_ints(va), f.from_ints(vb)
    got = f.to_ints(f.inner_product(a, b, n)[:, None])[0]
    assert got == sum(x * y for x, y in zip(va, vb)) % m
