"""Pin the pure-Python oracle to external bit-exactness vectors."""

from blitzar_tpu.refimpl import core as R
from vectors import (
    ED25519_BASEPOINT_X,
    RISTRETTO_BASEPOINT_MULTIPLES,
    RUST_DATA,
    RUST_EXPECTED,
    RUST_NBYTES,
)


def test_rust_end_to_end_commitment_vectors():
    gens = R.get_generators(4)
    for row, expected in zip(RUST_DATA, RUST_EXPECTED):
        c = R.pedersen_commitment(row, RUST_NBYTES, False, gens)
        assert R.ristretto_encode(c) == expected


def test_ristretto_basepoint_multiples():
    By = 4 * pow(5, R.P - 2, R.P) % R.P
    B = (ED25519_BASEPOINT_X, By, 1, ED25519_BASEPOINT_X * By % R.P)
    p = R.IDENTITY
    for k, expected_hex in enumerate(RISTRETTO_BASEPOINT_MULTIPLES):
        assert R.ristretto_encode(p).hex() == expected_hex, k
        p = R.pt_add(p, B)


def test_ristretto_decode_roundtrip():
    for i in range(8):
        g = R.compute_base_element(i)
        enc = R.ristretto_encode(g)
        p = R.ristretto_decode(enc)
        assert p is not None
        assert R.ristretto_encode(p) == enc


def test_double_matches_add():
    g = R.compute_base_element(3)
    assert R.pt_eq(R.pt_double(g), R.pt_add(g, g))


def test_signed_scalars():
    gens = R.get_generators(3)
    # -2*G0 + 3*G1 - 1*G2 via two's complement bytes
    c1 = R.pedersen_commitment([0x1_0000 - 2, 3, 0x1_0000 - 1], 2, True, gens)
    c2 = R.naive_msm([-2, 3, -1], gens)
    assert R.pt_eq(c1, c2)
