"""Sumcheck prover + verifier for products of multilinear extensions.

Mirrors reference sxt/proof/sumcheck: the round loop of
proof_computation.h:32-69, the expand/fold math of cpu_driver.h and
polynomial_utility.h, the transcript protocol of reference_transcript.h
(domain "sumcheck proof v1", labels "n"/"k"/"P"/"R"), and the host-only
verifier verification.h:30-79. Supported fields (reference
cbindings/base/field_id_utility.h:30-41): the curve25519 scalar field and the
Grumpkin base field (= bn254 Fr).

TPU mapping: MLEs are zero-padded to 2^num_variables once, which makes the
reference's partial_expand_products / partial-fold branches (for non-power-of-2
n) fall out of the same full-width code path. Each round's polynomial is a
fused batched map-reduce: per product, the coefficients of
prod_j (a_j + b_j X) are built by an incremental linear convolution vectorized
over the half-cube axis (the lane dual of reference polynomial_mapper.h /
sum_gpu.h:60-149), then tree-summed. Fold is one full-width
mle' = (1-r)*lo + r*hi (reference fold_gpu.h).

Transcript byte contract: for scalar25519, elements enter the transcript as
canonical little-endian bytes and challenges are 256-bit draws reduced mod l
(reference transcript_utility.cc:28-31). For fieldgk the reference appends raw
*Montgomery-form* limb bytes and stores challenges through an extra
R^-1 twist (transcript_utility.cc:33-37: the squeezed bytes are treated as a
Montgomery element and converted with to_bytes_le in place, so the semantic
challenge is raw * R^-2 mod r); both quirks are reproduced bit-for-bit.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..fields import params
from ..fields.mont import MontField
from .transcript import Transcript

MAX_DEGREE = 5  # reference proof/sumcheck/constant.h:25


# ---------------------------------------------------------------------------
# field codecs: how elements cross the transcript boundary
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FieldCodec:
    name: str
    field: MontField

    def element_to_transcript_bytes(self, value: int) -> bytes:
        raise NotImplementedError

    def challenge_from_bytes(self, raw: bytes) -> int:
        raise NotImplementedError


@functools.partial(jax.jit, static_argnames=("field",))
def _from_bytes_field_jit(field, flat):
    """Jitted byte->Montgomery conversion: the eager version dispatches
    every mont-reduce primitive with full-width intermediates resident —
    ~6 GB of transients for a 3 x 2^20 MLE table."""
    return field.from_bytes_le(flat)


class _Scalar25519Codec(FieldCodec):
    def element_to_transcript_bytes(self, value: int) -> bytes:
        return (value % self.field.modulus).to_bytes(32, "little")

    def challenge_from_bytes(self, raw: bytes) -> int:
        return int.from_bytes(raw, "little") % self.field.modulus

    def mles_to_device(self, rows: np.ndarray, n_pad: int):
        """(num_mles, n, 32) uint8 ABI byte rows -> (nlimbs, num_mles,
        n_pad) Montgomery array; scalar25519 ABI bytes are standard-form LE
        values, reduced mod l on device (no per-element Python ints)."""
        num_mles, n, nb = rows.shape
        if n < n_pad:
            rows = np.pad(rows, ((0, 0), (0, n_pad - n), (0, 0)))
        flat = np.ascontiguousarray(rows.reshape(num_mles * n_pad, nb).T)
        arr = _from_bytes_field_jit(self.field, jnp.asarray(flat))
        return arr.reshape(self.field.nlimbs, num_mles, n_pad)


class _FieldGkCodec(FieldCodec):
    """Grumpkin base field: raw Montgomery limb bytes in, R^-2-twisted
    challenges out (see module docstring)."""

    def element_to_transcript_bytes(self, value: int) -> bytes:
        m = value % self.field.modulus * self.field.r % self.field.modulus
        return m.to_bytes(32, "little")

    def challenge_from_bytes(self, raw: bytes) -> int:
        rinv = pow(self.field.r, -1, self.field.modulus)
        return int.from_bytes(raw, "little") * rinv * rinv % self.field.modulus

    def mles_to_device(self, rows: np.ndarray, n_pad: int):
        """fieldgk ABI bytes ARE canonical Montgomery residues, so loading
        is a pure limb-width reinterpretation."""
        from ..utils import limbs as limb_util

        num_mles, n, nb = rows.shape
        if n < n_pad:
            rows = np.pad(rows, ((0, 0), (0, n_pad - n), (0, 0)))
        l16 = limb_util.bytes_le_to_limbs(
            rows.reshape(num_mles * n_pad, nb), self.field.nlimbs
        )
        return jnp.asarray(l16).reshape(self.field.nlimbs, num_mles, n_pad)


SCALAR25519_CODEC = _Scalar25519Codec("scalar25519", params.SCALAR25519)
FIELDGK_CODEC = _FieldGkCodec("fieldgk", params.BN254_FR)

CODECS = {"scalar25519": SCALAR25519_CODEC, "grumpkin": FIELDGK_CODEC}


# ---------------------------------------------------------------------------
# transcripts
# ---------------------------------------------------------------------------


class SumcheckTranscript:
    """Abstract round-challenge source (reference sumcheck_transcript.h)."""

    def init(self, num_variables: int, round_degree: int) -> None: ...

    def round_challenge(self, polynomial: list[int]) -> int: ...


class ReferenceSumcheckTranscript(SumcheckTranscript):
    """Merlin-backed transcript (reference reference_transcript.h:27-44)."""

    def __init__(self, transcript: Transcript, codec: FieldCodec):
        self.transcript = transcript
        self.codec = codec

    def init(self, num_variables: int, round_degree: int) -> None:
        self.transcript.append_message(b"domain-sep", b"sumcheck proof v1")
        self.transcript.append_u64(b"n", num_variables)
        self.transcript.append_u64(b"k", round_degree)

    def round_challenge(self, polynomial: list[int]) -> int:
        data = b"".join(
            self.codec.element_to_transcript_bytes(c) for c in polynomial
        )
        self.transcript.append_message(b"P", data)
        raw = self.transcript.challenge_bytes(b"R", 32)
        return self.codec.challenge_from_bytes(raw)


class CallbackSumcheckTranscript(SumcheckTranscript):
    """Wrap a user callback drawing challenges (reference
    cbindings/backend/callback_sumcheck_transcript.h:26-40)."""

    def __init__(self, callback):
        self.callback = callback

    def init(self, num_variables: int, round_degree: int) -> None:
        pass

    def round_challenge(self, polynomial: list[int]) -> int:
        return self.callback(polynomial)


# ---------------------------------------------------------------------------
# jitted round kernels
# ---------------------------------------------------------------------------


def _structure(product_table, product_terms):
    """Static nested tuple of per-product MLE-index tuples."""
    out = []
    first = 0
    for _, num_terms in product_table:
        out.append(tuple(int(t) for t in product_terms[first : first + num_terms]))
        first += num_terms
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("field", "terms_struct", "degree", "mid"))
def _sum_round(field: MontField, mles, mults, terms_struct, degree: int, mid: int):
    """Round polynomial coefficients.

    mles: (nlimbs, num_mles, 2*mid) Montgomery; mults: (nlimbs, num_products).
    Returns (nlimbs, degree+1): sum_i sum_products mult * coeffs of
    prod_j (a_j + b_j X) with a_j = mle[t_j, i], b_j = mle[t_j, mid+i] - a_j
    (reference polynomial_utility.h expand_products, vectorized over i).
    """
    poly = [field.zeros(()) for _ in range(degree + 1)]
    for prod_index, terms in enumerate(terms_struct):
        a0 = mles[:, terms[0], :mid]
        b0 = field.sub(mles[:, terms[0], mid:], a0)
        p = [a0, b0]
        for t in terms[1:]:
            a = mles[:, t, :mid]
            b = field.sub(mles[:, t, mid:], a)
            new_p = [field.mul(p[0], a)]
            for k in range(1, len(p)):
                new_p.append(
                    field.add(field.mul(p[k], a), field.mul(p[k - 1], b))
                )
            new_p.append(field.mul(p[-1], b))
            p = new_p
        mult = mults[:, prod_index]
        for k, coeff in enumerate(p):
            total = field.tree_sum(coeff, mid)
            poly[k] = field.add(poly[k], field.mul(mult, total))
    return jnp.stack(poly, axis=-1)


@functools.partial(jax.jit, static_argnames=("field", "mid"))
def _fold_round(field: MontField, mles, r, one_m_r, mid: int):
    """mle' = (1-r)*lo + r*hi, full width (reference cpu_driver.h fold)."""
    lo = mles[:, :, :mid]
    hi = mles[:, :, mid:]
    return field.add(
        field.mul(one_m_r[:, None], lo), field.mul(r[:, None], hi)
    )


# -- dynamic-mid variants: arrays stay full width with the live fold in the
# first 2*mid lanes, mid is a TRACED scalar — ONE compiled (sum, fold) pair
# serves every round (the static-mid versions above compile per round:
# ~40 shape-specialized programs for a 2^20 proof; they remain in use by
# the sharded per-device path and tests) -------------------------------------


def _sum_terms(field: MontField, lo, hi, mults, terms_struct, degree: int):
    """Shared product-expansion body: (nlimbs, num_mles, C) lo/hi halves ->
    (nlimbs, degree+1) coefficient sums (used by the chunked kernels and
    the dynamic-mid round below)."""
    chunk = lo.shape[-1]
    poly = [field.zeros(()) for _ in range(degree + 1)]
    for prod_index, terms in enumerate(terms_struct):
        a0 = lo[:, terms[0]]
        b0 = field.sub(hi[:, terms[0]], a0)
        p = [a0, b0]
        for t in terms[1:]:
            a = lo[:, t]
            b = field.sub(hi[:, t], a)
            new_p = [field.mul(p[0], a)]
            for k in range(1, len(p)):
                new_p.append(
                    field.add(field.mul(p[k], a), field.mul(p[k - 1], b))
                )
            new_p.append(field.mul(p[-1], b))
            p = new_p
        mult = mults[:, prod_index]
        for k, coeff in enumerate(p):
            total = field.tree_sum(coeff, chunk)
            poly[k] = field.add(poly[k], field.mul(mult, total))
    return jnp.stack(poly, axis=-1)


# width of one lax.map step in the dynamic-mid round: bounds the product
# expansion's temps (the unchunked full-width expansion peaked at ~22 GB of
# HLO temps at 2^20 x deg 3)
_DYN_SUM_CHUNK = 1 << 16


def _sum_body(field: MontField, mles, mults, terms_struct, degree: int, mid):
    """Round-coefficient computation with mles (nlimbs, num_mles, W), live
    values in the first 2*mid entries and mid TRACED. Lanes at or beyond mid
    are zeroed in both halves (zero products contribute nothing), then the
    expansion runs in fixed-width lax.map chunks so temps stay chunk-sized."""
    from ..utils import lanes as _lanes

    nl, m, width = mles.shape
    mid = jnp.asarray(mid, jnp.int32)
    i = jnp.arange(width, dtype=jnp.int32)
    valid = (i < mid)[None, None]
    # hi[j] = mles[j + mid]: a SHIFT, not a gather (XLA:TPU general gathers
    # run on the scalar core — ~15-20 s for one (16, 3, 2^20) gather)
    hi_all = _lanes.shift_down(mles, mid)
    zero = jnp.uint32(0)
    lo_m = jnp.where(valid, mles, zero)
    hi_m = jnp.where(valid, hi_all, zero)
    from ..ops import pallas_point as pp

    if pp.mont_sum_round_fits(field, m, width, degree):
        # whole expansion in VMEM: the inline-XLA skew multiply
        # materializes (nl, nl, lanes) outer products in HBM per multiply
        return pp.mont_sum_round(field, lo_m, hi_m, mults, terms_struct, degree)
    c = min(width, _DYN_SUM_CHUNK)
    nc = width // c
    if nc <= 1:
        return _sum_terms(field, lo_m, hi_m, mults, terms_struct, degree)
    lo_ch = jnp.moveaxis(lo_m.reshape(nl, m, nc, c), 2, 0)
    hi_ch = jnp.moveaxis(hi_m.reshape(nl, m, nc, c), 2, 0)

    def chunk(args):
        lo_c, hi_c = args
        return _sum_terms(field, lo_c, hi_c, mults, terms_struct, degree)

    parts = lax.map(chunk, (lo_ch, hi_ch))  # (nc, nlimbs, degree+1)
    return field.tree_sum(jnp.moveaxis(parts, 0, -1), nc)


def _fold_body(field: MontField, mles, r, one_m_r, mid):
    """Fold keeping full width: lanes beyond the folded mid zeroed."""
    from ..utils import lanes as _lanes

    nl, m, width = mles.shape
    mid = jnp.asarray(mid, jnp.int32)
    i = jnp.arange(width, dtype=jnp.int32)
    hi = _lanes.shift_down(mles, mid)
    from ..ops import pallas_point as pp

    if pp.mont_sum_round_fits(field, m, width, 0):
        folded = pp.mont_fold_round(field, mles, hi, r, one_m_r)
    else:
        folded = field.add(
            field.mul(one_m_r[:, None], mles), field.mul(r[:, None], hi)
        )
    return jnp.where((i < mid)[None, None], folded, jnp.uint32(0))


@functools.partial(jax.jit, static_argnames=("field", "terms_struct", "degree"))
def _sum_round_dyn(field: MontField, mles, mults, terms_struct, degree: int, mid):
    return _sum_body(field, mles, mults, terms_struct, degree, mid)


@functools.partial(jax.jit, static_argnames=("field",))
def _fold_round_dyn(field: MontField, mles, r, one_m_r, mid):
    return _fold_body(field, mles, r, one_m_r, mid)


# -- fused per-round programs: ONE device dispatch per Fiat-Shamir round.
# Round k's fold (with challenge r_{k-1}) and round k's coefficient sum run
# in a single program whose output coefficients are already converted to
# STANDARD form, so the host does no eager device math between rounds: each
# round is exactly one program call + one small D2H + the transcript
# (reference sumcheck pays the same per-round sync,
# proof/sumcheck/proof_computation.h:32-69 — but its rounds are plain O(n)
# folds; ours must not add tunnel round trips on top). -----------------------


@functools.partial(jax.jit, static_argnames=("field", "terms_struct", "degree"))
def _round_step_dyn(
    field: MontField, mles, mults, r, one_m_r, terms_struct, degree: int, mid_prev
):
    folded = _fold_body(field, mles, r, one_m_r, mid_prev)
    mid = jnp.asarray(mid_prev, jnp.int32) // 2
    coeffs = _sum_body(field, folded, mults, terms_struct, degree, mid)
    return folded, field.from_mont(coeffs)


# Round 0 reuses the SAME step program with an identity fold: r = 0,
# 1-r = 1 and mid_prev = full width, so the fold computes
# 1*mles + 0*shift(mles, W) = mles exactly (Montgomery one is an exact
# multiplicative identity) and the sum runs at mid = W/2. One trace+compile
# serves every round — a second multi-minute warm-up program for round 0
# alone was the single largest warm_s term.


@functools.partial(jax.jit, static_argnames=("field", "terms_struct", "degree"))
def _sum_round_chunk(field: MontField, lo, hi, mults, terms_struct, degree: int):
    """Chunked round polynomial: same math as _sum_round over one
    (lo, hi) half-cube slice pair — per-chunk partial coefficient sums are
    exact mod-field additions, so accumulating them reproduces the resident
    round bit-for-bit (reference chunked_gpu_driver.h:38-134 streams MLE
    chunks the same way)."""
    chunk = lo.shape[-1]
    poly = [field.zeros(()) for _ in range(degree + 1)]
    for prod_index, terms in enumerate(terms_struct):
        a0 = lo[:, terms[0]]
        b0 = field.sub(hi[:, terms[0]], a0)
        p = [a0, b0]
        for t in terms[1:]:
            a = lo[:, t]
            b = field.sub(hi[:, t], a)
            new_p = [field.mul(p[0], a)]
            for k in range(1, len(p)):
                new_p.append(
                    field.add(field.mul(p[k], a), field.mul(p[k - 1], b))
                )
            new_p.append(field.mul(p[-1], b))
            p = new_p
        mult = mults[:, prod_index]
        for k, coeff in enumerate(p):
            total = field.tree_sum(coeff, chunk)
            poly[k] = field.add(poly[k], field.mul(mult, total))
    return jnp.stack(poly, axis=-1)


@functools.partial(jax.jit, static_argnames=("field",))
def _fold_round_chunk(field: MontField, lo, hi, r, one_m_r):
    return field.add(
        field.mul(one_m_r[:, None], lo), field.mul(r[:, None], hi)
    )


@functools.partial(jax.jit, static_argnames=("field",))
def _combine_partials(field: MontField, parts):
    """(nchunks, nlimbs, degree+1) partial coefficient sums -> summed."""
    acc = parts[0]
    for i in range(1, parts.shape[0]):
        acc = field.add(acc, parts[i])
    return acc


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------


def ceil_log2(n: int) -> int:
    return max(int(n - 1).bit_length(), 0)


# device budget for resident MLE data, in field elements (num_mles * n_pad);
# above it the prover streams host-resident chunks per round (reference
# chunked_gpu_driver.h streams while data > 25% of device memory). 2^24
# elements ~= 1 GB for 16-limb fields. Env-overridable for testing.
def _device_budget_elements() -> int:
    import os

    return int(
        os.environ.get("BLITZAR_TPU_SUMCHECK_BUDGET_ELEMENTS", str(1 << 24))
    )


def prove_sum(
    transcript: SumcheckTranscript,
    mles,
    product_table,
    product_terms,
    n: int,
    codec: FieldCodec = SCALAR25519_CODEC,
    device_budget_elements: int | None = None,
):
    """Returns (round_polynomials, evaluation_point).

    mles: (num_mles, n) int array-like (column-major n x num_mles in the
    reference API, reference blitzar_api.h:146-151 — callers pass rows here).
    product_table: [(multiplier int, num_terms)], product_terms: flat MLE
    indices. round_polynomials: list of num_variables lists, each of
    round_degree+1 coefficient ints (reference prove_sum,
    proof/sumcheck/proof_computation.h:32-69).

    When the padded MLE table exceeds ``device_budget_elements`` the early
    rounds stream host-resident chunk pairs through the device (identical
    results — mod-field addition is exact under re-association) and fall
    back to the resident path once the folded data fits, mirroring the
    reference's chunked_gpu_driver.h:53-71 memory-fraction switch.
    """
    field = codec.field
    assert n > 0
    num_variables = max(ceil_log2(n), 1)
    n_pad = 1 << num_variables
    degree = max(num_terms for _, num_terms in product_table)
    assert degree <= MAX_DEGREE
    budget = (
        device_budget_elements
        if device_budget_elements is not None
        else _device_budget_elements()
    )

    if (
        isinstance(mles, np.ndarray)
        and mles.dtype == np.uint8
        and mles.ndim == 3
    ):
        # (num_mles, n, 32) ABI byte rows: vectorized device-side conversion
        num_mles = mles.shape[0]
        assert mles.shape[1] == n
        full = codec.mles_to_device(mles, n_pad)
    else:
        mles = [[int(v) % field.modulus for v in row] for row in mles]
        num_mles = len(mles)
        flat: list[int] = []
        for row in mles:
            assert len(row) == n
            flat.extend(row + [0] * (n_pad - n))
        full = field.from_ints(flat).reshape(field.nlimbs, num_mles, n_pad)
    mults = field.from_ints([m for m, _ in product_table])
    terms_struct = _structure(product_table, product_terms)

    transcript.init(num_variables, degree)

    polynomials: list[list[int]] = []
    evaluation_point: list[int] = []
    cur = n_pad

    arr_host = None
    arr = None
    if num_mles * n_pad > budget:
        arr_host = np.asarray(full)
        del full
    else:
        arr = full

    while arr_host is not None:
        # streamed rounds: chunk pairs (lo, hi) -> partial coeff sums
        mid = cur // 2
        chunk = max(1, budget // (4 * num_mles))  # lo+hi resident, 2x slack
        chunk = min(chunk, mid)
        nchunks = -(-mid // chunk)
        parts = []
        for c in range(nchunks):
            c0, c1 = c * chunk, min((c + 1) * chunk, mid)
            if c1 - c0 != chunk:  # ragged tail: pad with zeros (adds nothing)
                lo = np.zeros((field.nlimbs, num_mles, chunk), np.uint32)
                hi = np.zeros_like(lo)
                lo[:, :, : c1 - c0] = arr_host[:, :, c0:c1]
                hi[:, :, : c1 - c0] = arr_host[:, :, mid + c0 : mid + c1]
            else:
                lo = arr_host[:, :, c0:c1]
                hi = arr_host[:, :, mid + c0 : mid + c1]
            parts.append(
                _sum_round_chunk(
                    field, jnp.asarray(lo), jnp.asarray(hi), mults,
                    terms_struct, degree,
                )
            )
        coeffs = _combine_partials(field, jnp.stack(parts))
        poly_ints = field.to_ints(coeffs)
        polynomials.append(poly_ints)
        r = transcript.round_challenge(poly_ints)
        evaluation_point.append(r)
        r_mont = field.from_ints([r])
        one_m_r = field.from_ints([(1 - r) % field.modulus])
        new_host = np.empty((field.nlimbs, num_mles, mid), np.uint32)
        for c in range(nchunks):
            c0, c1 = c * chunk, min((c + 1) * chunk, mid)
            folded = _fold_round_chunk(
                field,
                jnp.asarray(arr_host[:, :, c0:c1]),
                jnp.asarray(arr_host[:, :, mid + c0 : mid + c1]),
                r_mont, one_m_r,
            )
            new_host[:, :, c0:c1] = np.asarray(folded)
        arr_host = new_host
        cur = mid
        if (
            len(polynomials) == num_variables
            or num_mles * cur <= budget
            or cur <= 2
        ):
            arr = jnp.asarray(arr_host)
            arr_host = None

    # resident rounds: arr KEEPS its width (live fold in the first 2*mid
    # lanes, zeros beyond) and mid is traced — ONE fused fold+sum program per
    # round (round 0 is sum-only), whose output is already standard-form, so
    # each round costs one dispatch + one small D2H + the host transcript
    nl = field.nlimbs

    def _mont_np(v: int) -> np.ndarray:
        m = v % field.modulus * field.r % field.modulus
        return np.array(
            [(m >> (16 * i)) & 0xFFFF for i in range(nl)], np.uint32
        ).reshape(nl, 1)

    def _ints_from_std(std: np.ndarray) -> list[int]:
        return [
            sum(int(std[i, j]) << (16 * i) for i in range(nl))
            for j in range(std.shape[1])
        ]

    # identity fold for the first resident round (see _round_step_dyn note)
    r_np, one_m_r_np = _mont_np(0), _mont_np(1)
    for _ in range(num_variables - len(polynomials)):
        mid = cur // 2 if cur > 1 else 1
        if cur == 1:
            # single-variable base case: pad with a zero half
            arr = jnp.concatenate([arr, field.zeros((num_mles, 1))], axis=-1)
            cur, mid = 2, 1
        # this call folds the PREVIOUS round (at 2*mid; an identity fold on
        # the first iteration) then sums at mid
        arr, coeffs_std = _round_step_dyn(
            field, arr, mults, r_np, one_m_r_np, terms_struct, degree, 2 * mid
        )
        poly_ints = _ints_from_std(np.asarray(coeffs_std))
        polynomials.append(poly_ints)
        r = transcript.round_challenge(poly_ints)
        evaluation_point.append(r)
        r_np = _mont_np(r)
        one_m_r_np = _mont_np((1 - r) % field.modulus)
        cur = mid
    return polynomials, evaluation_point


# ---------------------------------------------------------------------------
# verifier (host-only, reference verification.h:30-79)
# ---------------------------------------------------------------------------


def sum_polynomial_01(polynomial: list[int], modulus: int) -> int:
    """f(0) + f(1) = 2*c0 + c1 + ... (reference polynomial_utility.h)."""
    if not polynomial:
        return 0
    return (polynomial[0] + sum(polynomial)) % modulus


def evaluate_polynomial(polynomial: list[int], x: int, modulus: int) -> int:
    e = 0
    for c in reversed(polynomial):
        e = (e * x + c) % modulus
    return e


def verify_sumcheck_no_evaluation(
    expected_sum: int,
    transcript: SumcheckTranscript,
    round_polynomials,
    round_degree: int,
    num_variables: int,
    codec: FieldCodec = SCALAR25519_CODEC,
):
    """Returns (ok, evaluation_point, final_expected_sum). Checks every round's
    f(0)+f(1) against the running expected sum; the caller is responsible for
    the final MLE evaluation check (hence "no evaluation")."""
    m = codec.field.modulus
    assert num_variables > 0 and round_degree > 0
    if len(round_polynomials) != num_variables or any(
        len(p) != round_degree + 1 for p in round_polynomials
    ):
        return False, [], expected_sum
    transcript.init(num_variables, round_degree)
    evaluation_point = []
    expected = expected_sum % m
    for polynomial in round_polynomials:
        if sum_polynomial_01(polynomial, m) != expected:
            return False, evaluation_point, expected
        r = transcript.round_challenge(polynomial)
        evaluation_point.append(r)
        expected = evaluate_polynomial(polynomial, r, m)
    return True, evaluation_point, expected
