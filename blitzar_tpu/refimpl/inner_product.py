"""Pure-Python inner-product-argument oracle.

Implements the reference algorithm directly (explicit per-round generator
fold, reference proof/inner_product/proof_computation.cc:61-155 and
cpu_driver.cc): the straightforward O(n) fold of points and scalars per
round. The device prover (proof/inner_product.py) uses a different
formulation (fixed-generator-basis MSMs, no point fold), so agreement
between the two is a real cross-implementation check; frozen vectors from
this oracle are pinned in tests/test_inner_product.py."""

from __future__ import annotations

from ..proof.transcript import Transcript
from . import core as R

ORDER = 2**252 + 27742317777372353535851937790883648493


def _inner(a, b):
    return sum(x * y for x, y in zip(a, b)) % ORDER


def _msm(scalars, points):
    acc = (0, 1, 1, 0)
    for s, p in zip(scalars, points):
        if s % ORDER:
            acc = R.pt_add(acc, R.pt_scalar_mul(s % ORDER, p))
    return acc


def prove_inner_product(transcript: Transcript, a, b, g, q):
    """a, b: lists of ints; g: list of np_ = 2^ceil(lg n) extended points;
    q: extended point. Returns (l_bytes list, r_bytes list, ap int)."""
    n = len(a)
    num_rounds = max(int(n - 1).bit_length(), 0)
    np_ = 1 << num_rounds
    a = [v % ORDER for v in a] + [0] * (np_ - n)
    b = [v % ORDER for v in b] + [0] * (np_ - n)
    g = list(g)
    assert len(g) == np_

    transcript.append_message(b"domain-sep", b"inner product proof v1")
    transcript.append_u64(b"n", n)
    if n == 1:
        return [], [], a[0]

    l_out, r_out = [], []
    while len(a) > 1:
        mid = len(a) // 2
        a_lo, a_hi = a[:mid], a[mid:]
        b_lo, b_hi = b[:mid], b[mid:]
        g_lo, g_hi = g[:mid], g[mid:]
        c_l = _inner(a_lo, b_hi)
        c_r = _inner(a_hi, b_lo)
        l_pt = R.pt_add(_msm(a_lo, g_hi), R.pt_scalar_mul(c_l, q) if c_l else (0, 1, 1, 0))
        r_pt = R.pt_add(_msm(a_hi, g_lo), R.pt_scalar_mul(c_r, q) if c_r else (0, 1, 1, 0))
        l_bytes = R.ristretto_encode(l_pt)
        r_bytes = R.ristretto_encode(r_pt)
        l_out.append(l_bytes)
        r_out.append(r_bytes)
        transcript.append_message(b"L", l_bytes)
        transcript.append_message(b"R", r_bytes)
        x = transcript.challenge_scalar(b"x", ORDER)
        xinv = pow(x, -1, ORDER)
        a = [(x * lo + xinv * hi) % ORDER for lo, hi in zip(a_lo, a_hi)]
        b = [(xinv * lo + x * hi) % ORDER for lo, hi in zip(b_lo, b_hi)]
        g = [
            R.pt_add(R.pt_scalar_mul(xinv, lo), R.pt_scalar_mul(x, hi))
            for lo, hi in zip(g_lo, g_hi)
        ]
    return l_out, r_out, a[0]


def verify_inner_product(transcript: Transcript, b, product, a_commit,
                         l_list, r_list, ap, g, q) -> bool:
    """Naive verification by replaying the fold: checks
    ap * b_final * Q + ap * G_final == P' where P' accumulates
    a_commit + product*Q + sum x_i^2 L_i + x_i^-2 R_i."""
    n = len(b)
    num_rounds = max(int(n - 1).bit_length(), 0)
    np_ = 1 << num_rounds
    b = [v % ORDER for v in b] + [0] * (np_ - n)
    g = list(g)

    transcript.append_message(b"domain-sep", b"inner product proof v1")
    transcript.append_u64(b"n", n)
    p_acc = R.pt_add(a_commit, R.pt_scalar_mul(product % ORDER, q))
    for l_bytes, r_bytes in zip(l_list, r_list):
        transcript.append_message(b"L", l_bytes)
        transcript.append_message(b"R", r_bytes)
        x = transcript.challenge_scalar(b"x", ORDER)
        xinv = pow(x, -1, ORDER)
        l_pt = R.ristretto_decode(l_bytes)
        r_pt = R.ristretto_decode(r_bytes)
        if l_pt is None or r_pt is None:
            return False
        p_acc = R.pt_add(p_acc, R.pt_scalar_mul(x * x % ORDER, l_pt))
        p_acc = R.pt_add(p_acc, R.pt_scalar_mul(pow(xinv, 2, ORDER), r_pt))
        mid = len(b) // 2
        b = [(xinv * lo + x * hi) % ORDER for lo, hi in zip(b[:mid], b[mid:])]
        g = [
            R.pt_add(R.pt_scalar_mul(xinv, lo), R.pt_scalar_mul(x, hi))
            for lo, hi in zip(g[:mid], g[mid:])
        ]
    expected = R.pt_add(
        R.pt_scalar_mul(ap * b[0] % ORDER, q), R.pt_scalar_mul(ap % ORDER, g[0])
    )
    return R.pt_eq(expected, p_acc)
