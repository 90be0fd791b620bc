"""Short-Weierstrass curves (bls12-381 G1 / bn254 G1 / Grumpkin) vs the
pure-Python oracle, mirroring the reference's per-curve operation tests
(reference sxt/curve_g1/operation/add.t.cc, sxt/curve_bng1, sxt/curve_gk)."""

import numpy as np
import pytest

from blitzar_tpu.curves import weierstrass as wc
from blitzar_tpu.msm import engine
from blitzar_tpu.refimpl import weierstrass as ref

CURVES = [wc.BLS12381_G1, wc.BN254_G1, wc.GRUMPKIN]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_add_double_neg_vs_oracle(curve):
    orc = curve.oracle
    pts = orc.random_points(4, seed=1) + [None]
    batch_a = curve.from_affine_ints(pts)
    batch_b = curve.from_affine_ints(pts[::-1])

    got = curve.to_affine_ints(curve.add(batch_a, batch_b))
    want = [orc.add(a, b) for a, b in zip(pts, pts[::-1])]
    assert got == want

    got = curve.to_affine_ints(curve.double(batch_a))
    want = [orc.add(a, a) for a in pts]
    assert got == want

    got = curve.to_affine_ints(curve.neg(batch_a))
    assert got == [orc.neg(a) for a in pts]

    assert np.asarray(curve.is_on_curve(batch_a)).all()


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_generator_on_curve(curve):
    assert curve.oracle.is_on_curve(curve.oracle.gen)
    g = curve.from_affine_ints([curve.oracle.gen])
    assert np.asarray(curve.is_on_curve(g)).all()
    # 2G + G == 3G and G - G == identity
    g3 = curve.add(curve.double(g), g)
    assert curve.to_affine_ints(g3) == [curve.oracle.mul(3, curve.oracle.gen)]
    zero = curve.add(g, curve.neg(g))
    assert curve.to_affine_ints(zero) == [None]


@pytest.mark.parametrize("curve", CURVES, ids=lambda c: c.name)
def test_msm_generic_vs_oracle(curve):
    orc = curve.oracle
    rng = np.random.default_rng(97834978)
    n, num_outputs, nbytes = 12, 2, 32
    pts = orc.random_points(n, seed=2)
    batch = curve.from_affine_ints(pts)
    data = [
        rng.integers(0, 256, size=(n, nbytes), dtype=np.uint8)
        for _ in range(num_outputs)
    ]
    out = engine.msm(batch, data, [nbytes] * num_outputs, [False] * num_outputs, curve=curve)
    got = curve.to_affine_ints(out)
    for o in range(num_outputs):
        scalars = [
            int.from_bytes(bytes(data[o][i]), "little") for i in range(n)
        ]
        assert got[o] == orc.msm(scalars, pts), f"output {o}"


def test_msm_signed_small_nbytes():
    curve = wc.BN254_G1
    orc = curve.oracle
    rng = np.random.default_rng(3)
    n, nbytes = 9, 4
    pts = orc.random_points(n, seed=3)
    batch = curve.from_affine_ints(pts)
    raw = rng.integers(-(2**31), 2**31, size=(n,), dtype=np.int64)
    data = np.frombuffer(
        raw.astype("<i4").tobytes(), dtype=np.uint8
    ).reshape(n, nbytes)
    out = engine.msm(batch, [data], [nbytes], [True], curve=curve)
    assert curve.to_affine_ints(out) == [orc.msm([int(v) for v in raw], pts)]


def test_bls12_381_compression_vs_oracle():
    curve = wc.BLS12381_G1
    pts = curve.oracle.random_points(3, seed=4)
    # include both y parities and the identity
    pts = pts + [curve.oracle.neg(pts[0]), None]
    batch = curve.from_affine_ints(pts)
    got = wc.compress_bls12_381(batch)
    for j, pt in enumerate(pts):
        assert bytes(got[j]) == ref.compress_bls12_381(pt), f"point {j}"
        assert ref.decompress_bls12_381(bytes(got[j])) == pt

    # device-side decompression roundtrip (reference compression.cc is
    # bidirectional)
    back, valid = wc.decompress_bls12_381(got)
    assert valid.all()
    assert curve.to_affine_ints(back) == pts
    # invalid x (not on curve) flagged
    bad = got.copy()
    bad[0] = 0
    bad[0, 0] = 0b1000_0000
    bad[0, 47] = 5  # x = 5: 125+4 is a QR? oracle says...
    from blitzar_tpu.refimpl.weierstrass import BLS12381_P, _sqrt_mod

    expect_valid = _sqrt_mod(5**3 + 4, BLS12381_P) is not None
    _, valid2 = wc.decompress_bls12_381(bad)
    assert bool(valid2[0]) == expect_valid


def test_bls12_381_decompress_rejects_noncanonical():
    # zkcrypto G1Affine::from_compressed canonicality: x >= p, infinity with
    # a set sort bit, and infinity with a nonzero payload are all invalid
    from blitzar_tpu.refimpl.weierstrass import BLS12381_P

    curve = wc.BLS12381_G1
    pt = curve.oracle.random_points(1, seed=9)[0]
    good = wc.compress_bls12_381(curve.from_affine_ints([pt]))

    # x' = x + p: same point mod p but non-canonical bytes
    x_plus_p = pt[0] + BLS12381_P
    assert x_plus_p < 1 << 381
    noncanon = np.frombuffer(x_plus_p.to_bytes(48, "big"), np.uint8).copy()
    noncanon[0] |= good[0, 0] & 0b1110_0000  # copy the original flag bits
    _, v = wc.decompress_bls12_381(noncanon[None])
    assert not v[0]

    inf_bad_sort = np.zeros((1, 48), np.uint8)
    inf_bad_sort[0, 0] = 0b1110_0000  # compressed + infinity + sort
    _, v = wc.decompress_bls12_381(inf_bad_sort)
    assert not v[0]

    inf_bad_payload = np.zeros((1, 48), np.uint8)
    inf_bad_payload[0, 0] = 0b1100_0000
    inf_bad_payload[0, 47] = 1  # nonzero x payload
    _, v = wc.decompress_bls12_381(inf_bad_payload)
    assert not v[0]

    inf_ok = np.zeros((1, 48), np.uint8)
    inf_ok[0, 0] = 0b1100_0000
    pts, v = wc.decompress_bls12_381(inf_ok)
    assert v[0] and curve.to_affine_ints(pts) == [None]
