"""Interpret-mode equality for the generic-MontField Pallas kernels
(ADVICE r4: mont_sum_round / mont_fold_round had no automated coverage).

Opt-in tier like test_pallas_kernels: even at the minimum one-step/128-lane
shape the diag-mode schoolbook inlines to a graph XLA:CPU takes >25 min to
compile on this 1-core host, so these cannot live in the default profile.
Default-profile coverage of the same kernels is ON-HARDWARE instead: the
TPU benchmark rows gate on correctness before emitting timings
(benchmarks/run_benchmarks.py — sumcheck verifier-chain exercises
mont_sum_round/mont_fold_round; the IPA verify equality exercises
mont_mul_ew end-to-end)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from blitzar_tpu.fields import params
from blitzar_tpu.ops import pallas_point as pp
from blitzar_tpu.proof import sumcheck as sc

pytestmark = pytest.mark.skipif(
    os.environ.get("BLITZAR_TPU_RUN_INTERPRET", "") in ("", "0"),
    reason="interpret-mode kernel tier: set BLITZAR_TPU_RUN_INTERPRET=1",
)

F = params.SCALAR25519
W = 128  # pp.LANES: smallest legal block — the interpret graph at the
# production MONT_SUM_BLK=1024 takes >15 min to compile on this host
M = 3
DEGREE = 3
TERMS = ((0, 1, 2), (1, 2, 0))


@pytest.fixture(autouse=True)
def _small_block(monkeypatch):
    monkeypatch.setattr(pp, "MONT_SUM_BLK", W)


@pytest.fixture(scope="module")
def mont_arrays():
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 2**62, size=(2 * M * W,), dtype=np.uint64)
    arr = F.from_ints([int(v) for v in vals])
    lo = arr[:, : M * W].reshape(F.nlimbs, M, W)
    hi = arr[:, M * W :].reshape(F.nlimbs, M, W)
    return lo, hi


def test_mont_sum_round_interpret_matches_sum_terms(mont_arrays):
    lo, hi = mont_arrays
    mults = F.from_ints([3, 5])
    got = np.asarray(
        pp.mont_sum_round(F, lo, hi, mults, TERMS, DEGREE, interpret=True)
    )
    want = np.asarray(sc._sum_terms(F, lo, hi, mults, TERMS, DEGREE))
    assert (got == want).all()


def test_mont_fold_round_interpret_matches_inline(mont_arrays):
    lo, hi = mont_arrays
    r = F.from_ints([123456789])
    omr = F.from_ints([(1 - 123456789) % F.modulus])
    got = np.asarray(pp.mont_fold_round(F, lo, hi, r, omr, interpret=True))
    want = np.asarray(
        F.add(F.mul(omr[:, None], lo), F.mul(r[:, None], hi))
    )
    assert (got == want).all()


def test_mont_mul_ew_interpret_matches_inline(mont_arrays):
    lo, hi = mont_arrays
    a = lo[:, 0]
    b = hi[:, 0]
    got = np.asarray(pp.mont_mul_ew(F, a, b, interpret=True))
    want = np.asarray(F.mul(a, b))
    assert (got == want).all()
    # broadcast (nl, 1) scale operand
    s = F.from_ints([987654321])
    got_b = np.asarray(pp.mont_mul_ew(F, a, s, interpret=True))
    want_b = np.asarray(F.mul(a, jnp.broadcast_to(s, a.shape)))
    assert (got_b == want_b).all()
