"""Bulletproofs-style inner-product argument over ristretto255.

Mirrors reference sxt/proof/inner_product/proof_computation.cc:61-155 (round
structure, transcript protocol: domain "inner product proof v1", labels
"n"/"L"/"R"/"x") and the fold math of cpu_driver.cc / fold.cc:

  round (mid = np/2):
    cL = <a_lo, b_hi>, cR = <a_hi, b_lo>
    L = <a_lo, G_hi> + cL*Q        R = <a_hi, G_lo> + cR*Q
    x = challenge;  a' = x*a_lo + x^-1*a_hi;  b' = x^-1*b_lo + x*b_hi
    G' = x^-1*G_lo + x*G_hi

TPU mapping: the O(n) work of every round — the two sub-MSMs and the scalar
folds — runs jitted on device; only the 64 bytes of L/R and the challenge
cross to the host per round (Fiat-Shamir forces that round trip, reference
proof_computation.cc:92-104). a/b live on device as Montgomery limb arrays.

The generator fold (reference generator_fold.h:33-46: per-round
G' = x^-1*G_lo + x*G_hi, a joint signed-digit scalar walk over every
surviving generator) is ELIMINATED rather than ported: each round-k folded
generator is a known linear combination of the ORIGINAL generators,
G^(k)[i] = sum_{j mod n_k == i} mu_j * G_j, where mu_j is the product of the
previous rounds' challenges (x or x^-1 according to which half index j sat
in). So L_k = <a_lo, G_hi^(k)> is an MSM over the FIXED original generator
set with exponents a[(j mod n_k) - mid] * mu_j — and a fixed generator set
is exactly what the partition-table engine's fused lookup kernel serves
(msm/fixed.py). Per round: O(n) device scalar muls to form exponents +
one two-output fixed-table query; mu folds with two broadcast muls. No
point scalar-multiplications at all outside the MSM kernel. The L/R values
are mathematically identical to the reference's, so transcripts match
byte-for-byte.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import edwards25519 as ed
from ..curves import ristretto as rst
from ..fields import params
from ..msm import engine
from .transcript import Transcript

S = params.SCALAR25519
ORDER = params.L25519


# ---------------------------------------------------------------------------
# host-side scalar plumbing
# ---------------------------------------------------------------------------


def scalars_to_ints(values) -> list[int]:
    """Accept (n, 32) uint8 LE rows, list of 32-byte objects, or ints."""
    out = []
    for v in values:
        if isinstance(v, int):
            out.append(v % ORDER)
        elif isinstance(v, (bytes, bytearray)):
            out.append(int.from_bytes(v, "little") % ORDER)
        else:
            out.append(int.from_bytes(bytes(np.asarray(v, np.uint8)), "little") % ORDER)
    return out


def _scalar_rows(values) -> np.ndarray:
    """Normalize scalar input to (n, 32) uint8 LE rows WITHOUT per-element
    Python int round trips (an (n, 32) uint8 array — the ABI layout — passes
    straight through; 2^20-scalar proofs were paying three Python loops)."""
    if (
        isinstance(values, np.ndarray)
        and values.dtype == np.uint8
        and values.ndim == 2
        and values.shape[1] == 32
    ):
        return values
    ints = scalars_to_ints(values)
    rows = np.zeros((len(ints), 32), np.uint8)
    for i, v in enumerate(ints):
        rows[i] = np.frombuffer(int(v).to_bytes(32, "little"), np.uint8)
    return rows


# jitted: eager from_bytes_le / inner_product dispatch each mont-reduce
# primitive with full-width intermediates resident (several GB at 2^20 —
# OOMs next to a live handle table); under jit XLA fuses them down to the
# output size
_from_bytes_jit = jax.jit(lambda rows_t: S.from_bytes_le(rows_t))
_inner_product_jit = jax.jit(
    lambda a, b: S.inner_product(a, b, a.shape[-1])[..., None]
)
_to_bytes_jit = jax.jit(lambda a: S.to_bytes_le(a))


def _mont_from_rows(rows: np.ndarray, length: int):
    """(n, 32) uint8 LE rows -> (nlimbs, length) Montgomery array
    (zero-padded), reduced mod l on device."""
    if rows.shape[0] < length:
        rows = np.pad(rows, ((0, length - rows.shape[0]), (0, 0)))
    return _from_bytes_jit(jnp.asarray(rows.T))


def ceil_log2(n: int) -> int:
    return max(int(n - 1).bit_length(), 0)


def _scalar_bits_le(x: int, nbits: int = 256) -> np.ndarray:
    return np.array([(x >> i) & 1 for i in range(nbits)], dtype=np.uint32)


# ---------------------------------------------------------------------------
# jitted round kernels (static over np, so each fold size compiles once and
# the program is reused across proofs)
# ---------------------------------------------------------------------------


def _smul(a, b):
    """Full-width elementwise Montgomery mul, routed through the Pallas
    diag-mode kernel on TPU (ops/pallas_point.mont_mul_ew — inline-XLA skew
    multiplies materialize HBM outer products and dominated the IPA round);
    b may be (nl, 1) for a broadcast scale."""
    from ..ops import pallas_point as pp

    w = a.shape[-1]
    if (
        a.ndim == 2
        and b.ndim == 2
        and b.shape[-1] in (1, w)
        and pp.mont_mul_fits(S, w)
    ):
        return pp.mont_mul_ew(S, a, b)
    return S.mul(a, b)


def _round_exponents_body(a, b, mu, mid, np_: int):
    """One round's MSM exponents over the ORIGINAL generator basis.

    a, b: (nl, np_) Montgomery vectors — the folded round values live in the
    first n_k = 2*mid entries, zeros beyond; mu: (nl, np_) per-original-
    generator fold multipliers; mid: TRACED int32 (one compiled program
    serves every round — the per-round shape-specialized variant cost ~20
    multi-minute XLA compiles per proof size). Returns the (2, np_, 32)
    byte exponents [e_L; e_R] for the fixed-G MSM and the (2, 1, 32) byte
    scalars [cL; cR] for Q, where

      e_L[j] = mu[j] * a_lo[(j mod n_k) - mid]   if (j mod n_k) >= mid else 0
      e_R[j] = mu[j] * a_hi[(j mod n_k)]         if (j mod n_k) <  mid else 0

    (L = <a_lo, G_hi^(k)> and G_hi^(k)[i] = sum_{j mod n_k == mid+i}
    mu_j G_j — see module docstring.)"""
    from ..utils import lanes as _lanes

    nl = a.shape[0]
    mid = jnp.asarray(mid, jnp.int32)
    j = jnp.arange(np_, dtype=jnp.int32)
    n_k = 2 * mid
    zero = jnp.uint32(0)

    # all index arithmetic is shifts/periodic tilings — XLA:TPU general
    # gathers run on the scalar core and cost seconds at 2^20 (utils/lanes)
    # base_l[u] = a[u - mid] for mid <= u < n_k (the a_lo pattern at the hi
    # slots of one period), then tiled periodically across np_
    base_l = jnp.where((j < n_k)[None], _lanes.shift_up(a, mid), zero)
    e_l = _smul(mu, _lanes.tile_periodic(base_l, n_k))
    # base_r[u] = a[mid + u] for u < mid (the a_hi pattern at the lo slots)
    base_r = jnp.where((j < mid)[None], _lanes.shift_down(a, mid), zero)
    e_r = _smul(mu, _lanes.tile_periodic(base_r, n_k))

    # cL = <a_lo, b_hi> = sum_{i < mid} a[i] * b[i + mid]; cR symmetric
    valid = (j < mid)[None]
    b_sh = _lanes.shift_down(b, mid)
    a_sh = _lanes.shift_down(a, mid)
    c_l = S.tree_sum(jnp.where(valid, _smul(a, b_sh), zero), np_)[..., None]
    c_r = S.tree_sum(jnp.where(valid, _smul(a_sh, b), zero), np_)[..., None]

    g_bytes = jnp.stack([S.to_bytes_le(e_l).T, S.to_bytes_le(e_r).T])
    q_bytes = jnp.stack([S.to_bytes_le(c_l).T, S.to_bytes_le(c_r).T])
    return g_bytes, q_bytes


@functools.partial(jax.jit, static_argnames=("np_",))
def _round_exponents(a, b, mu, mid, np_: int):
    return _round_exponents_body(a, b, mu, mid, np_)


@jax.jit
def _add_encode(p: ed.PointP3, q: ed.PointP3):
    return rst.encode(ed.add(p, q)).T  # (2, 32)


# above this size the per-round fixed-G MSM streams build+query per chunk
# instead of holding a persistent w=8 table in HBM
_STREAM_COMMIT_MIN = 1 << 21


def _commit_to_fold(a, b, mu, g_handle, g_stream, q_handle, mid: int, np_: int):
    """L and R for one round (reference gpu_driver.cc:49-65):
    L = <a_lo, G_hi> + cL*Q, R = <a_hi, G_lo> + cR*Q — both computed as
    fixed-table MSMs over the original generators (module docstring).
    Returns (2, 32) uint8 [L, R]."""
    from ..msm import fixed as _fixed

    g_bytes, q_bytes = _round_exponents(a, b, mu, mid, np_)
    if g_handle is not None:
        n_table_g = g_handle.num_groups * g_handle.window_width
        if n_table_g > np_:
            g_bytes = jnp.pad(g_bytes, ((0, 0), (0, n_table_g - np_), (0, 0)))
        part = _fixed._query_jit(
            g_handle.t_split, g_bytes, g_handle.window_width, 2, 256, ed
        )
    else:
        part = _fixed._streaming_query_jit(
            g_stream, g_bytes, None, 8, 2, 256, ed
        )
    n_table = q_handle.num_groups * q_handle.window_width
    q_bytes = jnp.pad(q_bytes, ((0, 0), (0, n_table - 1), (0, 0)))
    qpart = _fixed._query_jit(
        q_handle.t_split, q_bytes, q_handle.window_width, 2, 256, ed
    )
    return _add_encode(part, qpart)


def _fold_vectors_body(a, b, mu, x_mont, xinv_mont, mid):
    """Fold the scalar vectors and the generator multipliers. a, b stay
    np_-wide (folded values in the first mid entries, zeros beyond — so ONE
    compiled program serves every round, mid traced); mu stays np_-wide
    (mu_j *= x^-1 where j sat in the lo half of its block, x where hi)."""
    from ..utils import lanes as _lanes

    nl, np_ = mu.shape
    mid = jnp.asarray(mid, jnp.int32)
    j = jnp.arange(np_, dtype=jnp.int32)
    zero = jnp.uint32(0)

    keep = (j < mid)[None]
    a_sh = _lanes.shift_down(a, mid)
    b_sh = _lanes.shift_down(b, mid)
    a_next = jnp.where(
        keep, S.add(_smul(a, x_mont), _smul(a_sh, xinv_mont)), zero
    )
    b_next = jnp.where(
        keep, S.add(_smul(b, xinv_mont), _smul(b_sh, x_mont)), zero
    )

    # mu factor: xinv on each period's lo half, x on its hi half — built as
    # one period then tiled (no gather)
    n_k = 2 * mid
    xinv_b = jnp.broadcast_to(xinv_mont, (nl, np_))
    x_b = jnp.broadcast_to(x_mont, (nl, np_))
    base_f = jnp.where(keep, xinv_b, jnp.where((j < n_k)[None], x_b, zero))
    factor = _lanes.tile_periodic(base_f, n_k)
    mu_next = _smul(mu, factor)
    return a_next, b_next, mu_next


@jax.jit
def _fold(a, b, mu, x_mont, xinv_mont, mid):
    return _fold_vectors_body(a, b, mu, x_mont, xinv_mont, mid)


# -- fused per-round programs: ONE device dispatch per Fiat-Shamir round on
# the resident-handle path. Round k's vector fold (challenge x_{k-1}), its
# exponent forming, both fixed-table queries, the point add, and the
# ristretto encode run as a single compiled program; only the 64 bytes of
# L/R and the next challenge cross the link per round (the reference also
# syncs per round, proof_computation.cc:92-104, but its rounds are O(n)
# folds — ours must not stack tunnel round trips on top of the queries). ----


def _lr_from_state(tg, tq, a, b, mu, mid, np_, ww_g, ww_q, ntg, ntq):
    from ..msm import fixed as _fixed

    g_bytes, q_bytes = _round_exponents_body(a, b, mu, mid, np_)
    if ntg > np_:
        g_bytes = jnp.pad(g_bytes, ((0, 0), (0, ntg - np_), (0, 0)))
    q_bytes = jnp.pad(q_bytes, ((0, 0), (0, ntq - 1), (0, 0)))
    part = _fixed._query_jit(tg, g_bytes, ww_g, 2, 256, ed)
    qpart = _fixed._query_jit(tq, q_bytes, ww_q, 2, 256, ed)
    return rst.encode(ed.add(part, qpart)).T  # (2, 32)


# Round 0 reuses the step program with an identity fold (x = x^-1 = 1 and
# mid_prev = np_): the fold computes 1*a + 1*shift(a, np_) = a exactly
# (the shift past the live width is all zeros and Montgomery one is an
# exact identity; the mu factor tiles to all-ones), so ONE trace+compile
# serves every round — the separate round-0 program was a second
# multi-minute warm-up cost.
@functools.partial(
    jax.jit, static_argnames=("np_", "ww_g", "ww_q", "ntg", "ntq")
)
def _ipa_step_jit(
    tg, tq, a, b, mu, x_mont, xinv_mont, mid_prev,
    np_: int, ww_g: int, ww_q: int, ntg: int, ntq: int,
):
    a, b, mu = _fold_vectors_body(a, b, mu, x_mont, xinv_mont, mid_prev)
    mid = jnp.asarray(mid_prev, jnp.int32) // 2
    lr = _lr_from_state(tg, tq, a, b, mu, mid, np_, ww_g, ww_q, ntg, ntq)
    return a, b, mu, lr


@functools.partial(jax.jit, static_argnames=("nbits",))
def _scalar_mul_point(p: ed.PointP3, bits, nbits: int) -> ed.PointP3:
    """k*P for a single point batch via double-and-add over public bits."""
    ident = ed.identity(p.batch_shape)

    def step(acc, bit):
        acc = ed.double(acc)
        sel = jnp.broadcast_to(bit == 1, p.batch_shape)
        return ed.add(acc, ed.select(ident, p, sel)), None

    acc, _ = jax.lax.scan(step, ident, jnp.flip(bits[:nbits]))
    return acc


_decode_jit = jax.jit(rst.decode)


@functools.partial(jax.jit, static_argnames=("nbits",))
def _verify_final_jit(g_part, qlr_part, q_value, a_commit, bits, nbits: int):
    """Verification epilogue as ONE program: expected = g_part + qlr_part,
    commit = product*Q + a_commit, both ristretto-encoded. Run eagerly,
    the point adds + the two encodes (inversion chains) + the 253-step
    ladder dispatched per-primitive through the device tunnel — ~15 s of
    RTTs at 2^20 (tools/ipa_verify_probe.py attribution)."""
    expected = ed.add(g_part, qlr_part)
    q_prod = _scalar_mul_point(q_value, bits, nbits)
    commit = ed.add(q_prod, a_commit)
    return jnp.stack([rst.encode(expected).T[0], rst.encode(commit).T[0]])


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------


def _init_transcript(transcript: Transcript, n: int):
    transcript.append_message(b"domain-sep", b"inner product proof v1")
    transcript.append_u64(b"n", n)


def _round_challenge(transcript: Transcript, l_bytes: bytes, r_bytes: bytes) -> int:
    transcript.append_message(b"L", l_bytes)
    transcript.append_message(b"R", r_bytes)
    return transcript.challenge_scalar(b"x", ORDER)


def prove_inner_product(
    transcript: Transcript,
    a_vector,
    b_vector,
    g_vector: ed.PointP3,
    q_value: ed.PointP3,
):
    """Returns (l_vector (rounds, 32) uint8, r_vector (rounds, 32) uint8,
    ap_value int). g_vector must have np = 2^ceil_log2(n) points; q_value is a
    (1,)-batch point (reference prove_inner_product,
    proof_computation.cc:61-107)."""
    a_rows = _scalar_rows(a_vector)
    b_rows = _scalar_rows(b_vector)
    n = a_rows.shape[0]
    assert n > 0 and b_rows.shape[0] == n
    num_rounds = ceil_log2(n)
    np_ = 1 << num_rounds
    assert g_vector.x.shape[-1] == np_, "g_vector must have 2^ceil(lg n) entries"

    _init_transcript(transcript, n)
    if n == 1:
        return (
            np.zeros((0, 32), np.uint8),
            np.zeros((0, 32), np.uint8),
            int.from_bytes(bytes(a_rows[0]), "little") % ORDER,
        )

    from ..msm import fixed as _fixed

    a = _mont_from_rows(a_rows, np_)
    b = _mont_from_rows(b_rows, np_)
    mu = S.one((np_,))
    if np_ < _STREAM_COMMIT_MIN:
        from ..msm import engine as _engine

        g_handle = _engine._cached_handle(g_vector, np_, ed, _fixed)
        g_stream = None
    else:
        g_handle = None
        g_stream = [jnp.asarray(c) for c in g_vector]
    q_handle = _fixed.MultiexpHandle(q_value, window_width=4, n=1)

    l_out = np.zeros((num_rounds, 32), np.uint8)
    r_out = np.zeros((num_rounds, 32), np.uint8)
    cur = np_

    def _mont_np(v: int) -> np.ndarray:
        m = v % ORDER * S.r % ORDER
        return np.array(
            [(m >> (16 * i)) & 0xFFFF for i in range(S.nlimbs)], np.uint32
        ).reshape(S.nlimbs, 1)

    if g_handle is not None:
        # fused path: one program per round, challenges enter as host numpy
        # limbs (transferred with the call, no eager H2D ops between rounds)
        tg, ww_g = g_handle.t_split, g_handle.window_width
        ntg = g_handle.num_groups * g_handle.window_width
        tq, ww_q = q_handle.t_split, q_handle.window_width
        ntq = q_handle.num_groups * q_handle.window_width
        # identity fold for round 0 (see _ipa_step_jit note)
        x_np, xinv_np = _mont_np(1), _mont_np(1)
        for round_index in range(num_rounds):
            mid = cur // 2
            a, b, mu, lr_dev = _ipa_step_jit(
                tg, tq, a, b, mu, x_np, xinv_np, 2 * mid,
                np_, ww_g, ww_q, ntg, ntq,
            )
            lr = np.asarray(lr_dev)
            l_out[round_index] = lr[0]
            r_out[round_index] = lr[1]
            x = _round_challenge(transcript, bytes(lr[0]), bytes(lr[1]))
            xinv = pow(x, -1, ORDER)
            x_np, xinv_np = _mont_np(x), _mont_np(xinv)
            cur = mid
        # the loop folds lazily (inside the NEXT round's program); apply the
        # final round's fold so ap = a[0] is correct
        a, _, _ = _fold(a, b, mu, x_np, xinv_np, 1)
    else:
        # streaming path (np_ >= _STREAM_COMMIT_MIN): per-chunk build+query
        # keeps peak memory bounded; rounds stay unfused
        for round_index in range(num_rounds):
            mid = cur // 2
            lr = np.asarray(
                _commit_to_fold(a, b, mu, g_handle, g_stream, q_handle, mid, np_)
            )
            l_out[round_index] = lr[0]
            r_out[round_index] = lr[1]
            x = _round_challenge(transcript, bytes(lr[0]), bytes(lr[1]))
            xinv = pow(x, -1, ORDER)
            a, b, mu = _fold(a, b, mu, S.from_ints([x]), S.from_ints([xinv]), mid)
            cur = mid

    ap_value = S.to_ints(a[:, :1])[0]
    return l_out, r_out, ap_value


# ---------------------------------------------------------------------------
# verifier
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("np_",))
def _g_exponents_jit(allinv_ap_mont, xsq_rev_mont, np_: int):
    """g_exponents (nlimbs, np_): entry j = allinv*ap * prod over set bits k
    of j of x_sq[rounds-1-k] (the doubling-concatenation order of reference
    verification_computation.cc:28-44), as ONE fused program — the eager
    per-width doubling loop dispatched log(np_) unfused full-width muls."""
    nl, rounds = xsq_rev_mont.shape
    j = jnp.arange(np_, dtype=jnp.uint32)
    arr = jnp.broadcast_to(allinv_ap_mont, (nl, np_))
    one = jnp.broadcast_to(S.one(())[:, None], (nl, np_))
    for k in range(rounds):
        bit = ((j >> k) & 1) == 1
        factor = jnp.where(
            bit[None], jnp.broadcast_to(xsq_rev_mont[:, k : k + 1], (nl, np_)), one
        )
        arr = _smul(arr, factor)
    return arr


def _compute_g_exponents_device(allinv_ap: int, x_sq: list[int]):
    """g_exponents as a (nlimbs, np) Montgomery array (block i gets
    multiplier x_sq in reverse round order)."""
    rounds = len(x_sq)
    return _g_exponents_jit(
        S.from_ints([allinv_ap]),
        S.from_ints(list(reversed(x_sq))),
        1 << rounds,
    )


def verify_inner_product(
    transcript: Transcript,
    b_vector,
    product,
    a_commit: ed.PointP3,
    l_vector,
    r_vector,
    ap_value,
    g_vector: ed.PointP3,
    q_value: ed.PointP3,
) -> bool:
    """Reference verify_inner_product (proof_computation.cc:112-155) +
    compute_verification_exponents (verification_computation.cc:80-123):
    one MSM over [Q | G | L | R] with exponents
    [<g_exps, b>, g_exps, -x_i^2, -x_i^-2], compared against
    compress(product*Q + a_commit)."""
    b_rows = _scalar_rows(b_vector)
    n = b_rows.shape[0]
    assert n > 0
    num_rounds = ceil_log2(n)
    np_ = 1 << num_rounds
    ap = scalars_to_ints([ap_value])[0]
    product_int = scalars_to_ints([product])[0]
    l_vector = np.asarray(l_vector, np.uint8).reshape(-1, 32)
    r_vector = np.asarray(r_vector, np.uint8).reshape(-1, 32)
    if l_vector.shape[0] != num_rounds or r_vector.shape[0] != num_rounds:
        return False

    _init_transcript(transcript, n)
    x_vec = [
        _round_challenge(transcript, bytes(l_vector[i]), bytes(r_vector[i]))
        for i in range(num_rounds)
    ]

    if n == 1:
        g_exp_arr = S.from_ints([ap])
        exp_ints_lr: list[int] = []
    else:
        x_sq = [x * x % ORDER for x in x_vec]
        allinv = 1
        for x in x_vec:
            allinv = allinv * pow(x, -1, ORDER) % ORDER
        g_exp_arr = _compute_g_exponents_device(allinv * ap % ORDER, x_sq)
        exp_ints_lr = [(-v) % ORDER for v in x_sq] + [
            (-pow(x * x % ORDER, -1, ORDER)) % ORDER for x in x_vec
        ]

    b_arr = _mont_from_rows(b_rows, n)
    prod_check = S.to_ints(_inner_product_jit(g_exp_arr[:, :n], b_arr))[0]

    # decompress L/R; reject invalid encodings (jitted: the eager decode's
    # sqrt chains dispatch per-primitive — ~6 s of tunnel RTTs)
    if num_rounds:
        lr_pts, lr_valid = _decode_jit(
            jnp.asarray(np.concatenate([l_vector, r_vector]).T)
        )
        if not bool(np.asarray(lr_valid).all()):
            return False
    else:
        lr_pts = ed.identity((0,))

    # split the verification MSM: the G term reuses the SAME fixed-generator
    # engine (and, after a prove over these generators, the SAME cached
    # handle table) as the prover; the [Q | L | R] term is a tiny 1+2r-point
    # MSM on the small-n path. One concatenated dynamic MSM over np_ + 41
    # points would stream a fresh table build next to the resident handle —
    # slower and enough to exhaust HBM at 2^20 (reference does one combined
    # MSM because its dynamic engine has no table to reuse,
    # proof_computation.cc:139-154).
    g_exp_bytes = np.ascontiguousarray(np.asarray(_to_bytes_jit(g_exp_arr)).T)
    g_part = engine.msm(g_vector, [g_exp_bytes], [32], [False])

    qlr = ed.PointP3(
        *(
            jnp.concatenate([qc, lrc], axis=-1)
            for qc, lrc in zip(q_value, lr_pts)
        )
    )
    qlr_bytes = np.zeros((1 + 2 * num_rounds, 32), np.uint8)
    qlr_bytes[0] = np.frombuffer(prod_check.to_bytes(32, "little"), np.uint8)
    for i, v in enumerate(exp_ints_lr):
        qlr_bytes[1 + i] = np.frombuffer(v.to_bytes(32, "little"), np.uint8)
    qlr_part = engine.msm(qlr, [qlr_bytes], [32], [False])

    # expected = g_part + qlr_part vs commit = product*Q + a_commit, in one
    # fused program (see _verify_final_jit)
    enc = np.asarray(
        _verify_final_jit(
            g_part, qlr_part, q_value, a_commit,
            jnp.asarray(_scalar_bits_le(product_int)), 253,
        )
    )
    return bytes(enc[0]) == bytes(enc[1])
