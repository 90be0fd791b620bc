"""Inner-product argument prove/verify roundtrip, mirroring the reference
driver-conformance suite (reference sxt/proof/inner_product/driver_test.h and
proof_computation.t.cc): non-power-of-two lengths, n == 1 special case, and
tamper rejection."""

import numpy as np
import pytest

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import edwards25519 as ed
from blitzar_tpu.msm import engine
from blitzar_tpu.proof import inner_product as ipa
from blitzar_tpu.proof.transcript import Transcript


def _setup(n, seed):
    rng = np.random.default_rng(seed)
    np_ = 1 << ipa.ceil_log2(n)
    g_vector = gen.ristretto_generators(np_)
    q_value = gen.ristretto_generators(1, offset=np_)
    a = [int(rng.integers(0, 2**63)) for _ in range(n)]
    b = [int(rng.integers(0, 2**63)) for _ in range(n)]
    return g_vector, q_value, a, b


def _a_commit(a, g_vector, n):
    data = np.zeros((n, 32), np.uint8)
    for i, v in enumerate(a):
        data[i] = np.frombuffer(int(v).to_bytes(32, "little"), np.uint8)
    return engine.msm(ed.index_batch(g_vector, (slice(0, n),)), [data], [32], [False])


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_prove_verify_roundtrip(n):
    g_vector, q_value, a, b = _setup(n, seed=10 + n)
    l_vec, r_vec, ap = ipa.prove_inner_product(
        Transcript(b"test"), a, b, g_vector, q_value
    )
    assert l_vec.shape == (ipa.ceil_log2(n), 32)
    product = sum(x * y for x, y in zip(a, b)) % ipa.ORDER
    a_commit = _a_commit(a, g_vector, n)
    assert ipa.verify_inner_product(
        Transcript(b"test"), b, product, a_commit, l_vec, r_vec, ap,
        g_vector, q_value,
    )


def test_verify_rejects_tampering():
    n = 4
    g_vector, q_value, a, b = _setup(n, seed=42)
    l_vec, r_vec, ap = ipa.prove_inner_product(
        Transcript(b"test"), a, b, g_vector, q_value
    )
    product = sum(x * y for x, y in zip(a, b)) % ipa.ORDER
    a_commit = _a_commit(a, g_vector, n)

    # wrong product
    assert not ipa.verify_inner_product(
        Transcript(b"test"), b, (product + 1) % ipa.ORDER, a_commit,
        l_vec, r_vec, ap, g_vector, q_value,
    )
    # wrong ap
    assert not ipa.verify_inner_product(
        Transcript(b"test"), b, product, a_commit, l_vec, r_vec,
        (ap + 1) % ipa.ORDER, g_vector, q_value,
    )
    # wrong transcript domain
    assert not ipa.verify_inner_product(
        Transcript(b"other"), b, product, a_commit, l_vec, r_vec, ap,
        g_vector, q_value,
    )
    # wrong round count
    assert not ipa.verify_inner_product(
        Transcript(b"test"), b, product, a_commit, l_vec[:1], r_vec[:1], ap,
        g_vector, q_value,
    )
