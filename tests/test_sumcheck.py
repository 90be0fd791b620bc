"""Sumcheck prover/verifier tests, mirroring the reference driver-conformance
suite (reference sxt/proof/sumcheck/driver_test.h, verification.t.cc): the
prover's rounds verify, the final claim matches an independent pure-Python MLE
evaluation, non-power-of-2 n works, and tampering is rejected."""

import numpy as np
import pytest

from blitzar_tpu.proof import sumcheck as sc
from blitzar_tpu.proof.transcript import Transcript


def _true_sum(mles, product_table, product_terms, n, m):
    total = 0
    for i in range(n):
        first = 0
        for mult, num_terms in product_table:
            prod = mult
            for t in product_terms[first : first + num_terms]:
                prod = prod * mles[t][i] % m
            total = (total + prod) % m
            first += num_terms
    return total


def _mle_eval(row, eval_point, m):
    """Evaluate an MLE by repeated folds (the prover's own fold semantics:
    data' = (1-r)*lo + r*hi over the zero-padded power-of-2 table)."""
    num_vars = max(sc.ceil_log2(len(row)), 1)
    data = list(row) + [0] * ((1 << num_vars) - len(row))
    for r in eval_point:
        mid = len(data) // 2
        data = [
            ((1 - r) * data[i] + r * data[mid + i]) % m for i in range(mid)
        ]
    return data[0]


def _problem(n, num_mles, codec, seed):
    rng = np.random.default_rng(seed)
    m = codec.field.modulus
    mles = [[int(rng.integers(0, 2**62)) for _ in range(n)] for _ in range(num_mles)]
    # products: mle0, 2*mle0*mle1, and (if present) mle1*mle2
    product_table = [(1, 1), (2, 2)]
    product_terms = [0, 0, 1]
    if num_mles > 2:
        product_table.append((m - 3, 2))
        product_terms += [1, 2]
    return mles, product_table, product_terms, m


@pytest.mark.parametrize("codec", [sc.SCALAR25519_CODEC, sc.FIELDGK_CODEC], ids=lambda c: c.name)
@pytest.mark.parametrize("n", [1, 2, 3, 8])
def test_prove_verify_roundtrip(codec, n):
    mles, product_table, product_terms, m = _problem(n, 2, codec, seed=n)
    polys, eval_point = sc.prove_sum(
        sc.ReferenceSumcheckTranscript(Transcript(b"test"), codec),
        mles, product_table, product_terms, n, codec,
    )
    num_vars = max(sc.ceil_log2(n), 1)
    assert len(polys) == num_vars and len(eval_point) == num_vars

    claimed = _true_sum(mles, product_table, product_terms, n, m)
    ok, eval_point_v, final = sc.verify_sumcheck_no_evaluation(
        claimed,
        sc.ReferenceSumcheckTranscript(Transcript(b"test"), codec),
        polys, max(t for _, t in product_table), num_vars, codec,
    )
    assert ok
    assert eval_point_v == eval_point

    # final expected sum == sum_products mult * prod_j MLE_j(eval_point)
    evals = [_mle_eval(row, eval_point, m) for row in mles]
    want, first = 0, 0
    for mult, num_terms in product_table:
        prod = mult
        for t in product_terms[first : first + num_terms]:
            prod = prod * evals[t] % m
        want = (want + prod) % m
        first += num_terms
    assert final == want


def test_verify_rejects_bad_sum_and_tamper():
    codec = sc.SCALAR25519_CODEC
    n = 4
    mles, product_table, product_terms, m = _problem(n, 3, codec, seed=99)
    polys, _ = sc.prove_sum(
        sc.ReferenceSumcheckTranscript(Transcript(b"test"), codec),
        mles, product_table, product_terms, n, codec,
    )
    claimed = _true_sum(mles, product_table, product_terms, n, m)
    degree = max(t for _, t in product_table)

    ok, _, _ = sc.verify_sumcheck_no_evaluation(
        (claimed + 1) % m,
        sc.ReferenceSumcheckTranscript(Transcript(b"test"), codec),
        polys, degree, len(polys), codec,
    )
    assert not ok

    bad = [list(p) for p in polys]
    bad[1][0] = (bad[1][0] + 1) % m
    ok, _, _ = sc.verify_sumcheck_no_evaluation(
        claimed,
        sc.ReferenceSumcheckTranscript(Transcript(b"test"), codec),
        bad, degree, len(bad), codec,
    )
    assert not ok


@pytest.mark.parametrize(
    "codec", [sc.SCALAR25519_CODEC, sc.FIELDGK_CODEC], ids=lambda c: c.name
)
def test_sharded_matches_single_device(codec):
    import jax

    from blitzar_tpu.proof import sumcheck_sharded as scs

    n = 37  # non-power-of-2, pads to 64 over 8 devices
    mles, product_table, product_terms, m = _problem(n, 3, codec, seed=55)
    mesh = scs.make_mesh(jax.devices()[:8])
    polys_s, eval_s = scs.prove_sum_sharded(
        mesh,
        sc.ReferenceSumcheckTranscript(Transcript(b"test"), codec),
        mles, product_table, product_terms, n, codec,
    )
    polys, eval_ = sc.prove_sum(
        sc.ReferenceSumcheckTranscript(Transcript(b"test"), codec),
        mles, product_table, product_terms, n, codec,
    )
    assert polys_s == polys
    assert eval_s == eval_


def test_chunked_matches_resident():
    """Forced-small-budget chunked prover == resident prover, bit-for-bit
    (reference chunked_gpu_driver.t.cc checks the chunked driver against the
    single-device driver the same way)."""
    codec = sc.SCALAR25519_CODEC
    n = 24  # pads to 32; budget forces several streamed rounds, ragged tail
    mles, product_table, product_terms, m = _problem(n, 3, codec, seed=77)
    polys_res, eval_res = sc.prove_sum(
        sc.ReferenceSumcheckTranscript(Transcript(b"test"), codec),
        mles, product_table, product_terms, n, codec,
    )
    polys_chk, eval_chk = sc.prove_sum(
        sc.ReferenceSumcheckTranscript(Transcript(b"test"), codec),
        mles, product_table, product_terms, n, codec,
        device_budget_elements=36,  # << 3*32: streams chunk=3 (ragged tails)
    )
    assert polys_chk == polys_res
    assert eval_chk == eval_res


@pytest.mark.parametrize(
    "codec", [sc.SCALAR25519_CODEC, sc.FIELDGK_CODEC], ids=lambda c: c.name
)
def test_byte_rows_fast_path_matches_int_path(codec):
    """The ABI byte-row MLE input (capi path, vectorized device conversion)
    must match the python-int input bit-for-bit. scalar25519 bytes are
    standard-form LE; fieldgk bytes are Montgomery residues (the reference's
    transcript quirk, transcript_utility.cc:33-37)."""
    n = 6
    mles, product_table, product_terms, m = _problem(n, 3, codec, seed=31)
    f = codec.field
    rows = np.zeros((len(mles), n, 32), np.uint8)
    for mi, row in enumerate(mles):
        for i, v in enumerate(row):
            if codec is sc.FIELDGK_CODEC:
                v = v % m * f.r % m  # ABI carries Montgomery residues
            rows[mi, i] = np.frombuffer(
                int(v % (1 << 256)).to_bytes(32, "little"), np.uint8
            )
    polys_int, eval_int = sc.prove_sum(
        sc.ReferenceSumcheckTranscript(Transcript(b"test"), codec),
        mles, product_table, product_terms, n, codec,
    )
    polys_bytes, eval_bytes = sc.prove_sum(
        sc.ReferenceSumcheckTranscript(Transcript(b"test"), codec),
        rows, product_table, product_terms, n, codec,
    )
    assert polys_bytes == polys_int
    assert eval_bytes == eval_int


def test_callback_transcript():
    codec = sc.SCALAR25519_CODEC
    n = 2
    mles, product_table, product_terms, m = _problem(n, 2, codec, seed=7)
    seen = []

    def cb(polynomial):
        seen.append(list(polynomial))
        return 12345

    polys, eval_point = sc.prove_sum(
        sc.CallbackSumcheckTranscript(cb),
        mles, product_table, product_terms, n, codec,
    )
    assert eval_point == [12345]
    assert seen == polys
