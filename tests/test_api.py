"""Public API surface vs upstream vectors (reference cbindings/*.t.cc style)."""

import numpy as np
import pytest

from blitzar_tpu import api
from blitzar_tpu.refimpl import core as R
from vectors import RUST_DATA, RUST_EXPECTED


@pytest.fixture(autouse=True)
def fresh_backend():
    api.reset_backend_for_testing()
    yield
    api.reset_backend_for_testing()


def _descriptors():
    out = []
    for row in RUST_DATA:
        data = np.concatenate(
            [np.frombuffer(int(v).to_bytes(4, "little"), np.uint8) for v in row]
        )
        out.append(api.SequenceDescriptor(element_nbytes=4, n=4, data=data))
    return out


def test_rust_vector_through_api():
    api.init(num_precomputed_generators=10)
    got = api.compute_curve25519_commitments(_descriptors())
    assert [bytes(g) for g in got] == RUST_EXPECTED


def test_with_generators_and_offset():
    api.init()
    gens = api.get_ristretto255_generators(4, offset=2)
    data = np.frombuffer((3).to_bytes(2, "little") + (5).to_bytes(2, "little"), np.uint8)
    got = api.compute_curve25519_commitments(
        [api.SequenceDescriptor(2, 2, data)], generators=gens
    )
    want = R.ristretto_encode(
        R.naive_msm([3, 5], [R.compute_base_element(2), R.compute_base_element(3)])
    )
    assert bytes(got[0]) == want


def test_one_commit_and_compress_roundtrip():
    api.init()
    oc = api.get_curve25519_one_commit(6)
    enc = api.compress_ristretto255(api.get_ristretto255_generators(6))
    pts, valid = api.decompress_ristretto255(enc)
    assert valid.all()
    acc = R.IDENTITY
    for i in range(6):
        acc = R.pt_add(acc, R.compute_base_element(i))
    oc_b = type(oc)(*(c[:, None] for c in oc))
    assert bytes(api.compress_ristretto255(oc_b)[0]) == R.ristretto_encode(acc)


def test_double_init_raises():
    api.init()
    with pytest.raises(RuntimeError):
        api.init()


def test_descriptor_validation():
    # reference pedersen.cc:55 release asserts + the signed-width contract
    # (exponent_sequence.h:40: if signed, element_nbytes must be <= 16)
    api.init()
    data = np.zeros(33, np.uint8)
    with pytest.raises(ValueError):
        api.compute_curve25519_commitments(
            [api.SequenceDescriptor(33, 1, data)]
        )
    with pytest.raises(ValueError):
        api.compute_curve25519_commitments(
            [api.SequenceDescriptor(0, 1, data)]
        )
    with pytest.raises(ValueError):
        api.compute_curve25519_commitments(
            [api.SequenceDescriptor(32, 1, data[:32], is_signed=True)]
        )


def test_checks_mode_on_curve(monkeypatch):
    # BLITZAR_TPU_CHECKS=1: results validated on-curve after every MSM
    # (the sanitizer-equivalent test mode; tools/ci.sh runs a pass with it)
    monkeypatch.setenv("BLITZAR_TPU_CHECKS", "1")
    api.init()
    data = np.frombuffer((7).to_bytes(2, "little") + (9).to_bytes(2, "little"), np.uint8)
    got = api.compute_curve25519_commitments([api.SequenceDescriptor(2, 2, data)])
    want = R.ristretto_encode(
        R.naive_msm([7, 9], [R.compute_base_element(0), R.compute_base_element(1)])
    )
    assert bytes(got[0]) == want
