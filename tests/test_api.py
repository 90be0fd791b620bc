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
