"""Bulletproofs-style inner-product argument over ristretto255.

Mirrors reference sxt/proof/inner_product/proof_computation.cc:61-155 (round
structure, transcript protocol: domain "inner product proof v1", labels
"n"/"L"/"R"/"x") and the fold math of cpu_driver.cc / fold.cc:

  round (mid = np/2):
    cL = <a_lo, b_hi>, cR = <a_hi, b_lo>
    L = <a_lo, G_hi> + cL*Q        R = <a_hi, G_lo> + cR*Q
    x = challenge;  a' = x*a_lo + x^-1*a_hi;  b' = x^-1*b_lo + x*b_hi
    G' = x^-1*G_lo + x*G_hi

TPU mapping: the O(n) work of every round — the two sub-MSMs, the scalar
folds, and the generator fold — runs jitted on device; only the 64 bytes of
L/R and the challenge cross to the host per round (Fiat-Shamir forces that
round trip, reference proof_computation.cc:92-104). a/b live on device as
Montgomery limb arrays; the two L/R sub-MSMs are fused into ONE two-output
bucket MSM over [G | Q]. The generator fold is a 256-step batched
double-and-add scan — the vector-lane dual of the reference's per-thread
joint signed-digit walk (reference generator_fold.h:33-46).
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


def ceil_log2(n: int) -> int:
    return max(int(n - 1).bit_length(), 0)


def _scalar_bits_le(x: int, nbits: int = 256) -> np.ndarray:
    return np.array([(x >> i) & 1 for i in range(nbits)], dtype=np.uint32)


def _mont_from_ints(ints, length: int):
    """Python ints -> (nlimbs, length) Montgomery array, zero-padded.
    Byte rows are built on the host and converted on device — S.from_ints'
    per-value python loop is minutes at n = 2^20."""
    rows = np.zeros((length, 32), np.uint8)
    for i, v in enumerate(ints):
        rows[i] = np.frombuffer(int(v).to_bytes(32, "little"), np.uint8)
    return S.from_bytes_le(jnp.asarray(rows.T))


# ---------------------------------------------------------------------------
# jitted round kernels (static over np, so each fold size compiles once and
# the program is reused across proofs)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("mid",))
def _commit_scalars(a, b, mid: int):
    """Scalar prep for one round's L/R: returns the (2, np_, 32) byte
    scalars for the G-part MSM (output 0 = [0 | a_lo], output 1 =
    [a_hi | 0]) and the (2, 1, 32) byte scalars [cL; cR] for Q."""
    a_lo, a_hi = a[:, :mid], a[:, mid:]
    b_lo, b_hi = b[:, :mid], b[:, mid:]
    c_l = S.inner_product(a_lo, b_hi, mid)[..., None]
    c_r = S.inner_product(a_hi, b_lo, mid)[..., None]
    zeros = S.zeros((mid,))
    s0 = jnp.concatenate([zeros, a_lo], axis=-1)
    s1 = jnp.concatenate([a_hi, zeros], axis=-1)
    g_bytes = jnp.stack([S.to_bytes_le(s0).T, S.to_bytes_le(s1).T])
    q_bytes = jnp.stack([S.to_bytes_le(c_l).T, S.to_bytes_le(c_r).T])
    return g_bytes, q_bytes


@jax.jit
def _add_encode(p: ed.PointP3, q: ed.PointP3):
    return rst.encode(ed.add(p, q)).T  # (2, 32)


@functools.partial(jax.jit, static_argnames=("mid",))
def _small_g_msm(g: ed.PointP3, g_bytes, mid: int):
    """Small-round G-part MSM: in-jit w=4 table build + query."""
    from ..msm import fixed as _fixed

    w = 4
    np_ = 2 * mid
    n_pad = max(-(-np_ // w) * w, w)
    if n_pad > np_:
        pad_pt = ed.identity((n_pad - np_,))
        g = ed.PointP3(
            *(jnp.concatenate([gc, pc], axis=-1) for gc, pc in zip(g, pad_pt))
        )
        g_bytes = jnp.pad(g_bytes, ((0, 0), (0, n_pad - np_), (0, 0)))
    table = _fixed._build_table(g, w, ed)
    t_split = _fixed._split_table_jit(table, ed)
    return _fixed._query_jit(t_split, g_bytes, w, 2, 256, ed)


# above this size the G-part MSM streams build+query per chunk so the
# largest rounds never hold a full table in HBM (2^19-point rounds OOM'd
# the in-jit build)
_STREAM_COMMIT_MIN = 8192


def _commit_to_fold(a, b, g: ed.PointP3, q_handle, mid: int):
    """L and R for one round (reference gpu_driver.cc:49-65):
    L = <a_lo, G_hi> + cL*Q, R = <a_hi, G_lo> + cR*Q.

    The G-part of large rounds runs through the memory-bounded streamed
    build+query MSM (msm/fixed.py); the two cQ terms query a tiny fixed
    handle built once per proof. Returns (2, 32) uint8 [L, R]."""
    from ..msm import fixed as _fixed

    g_bytes, q_bytes = _commit_scalars(a, b, mid)
    if 2 * mid >= _STREAM_COMMIT_MIN:
        part = _fixed._streaming_query_jit(list(g), g_bytes, 8, 2, 256, ed)
    else:
        part = _small_g_msm(g, g_bytes, mid)
    n_table = q_handle.num_groups * q_handle.window_width
    q_bytes = jnp.pad(q_bytes, ((0, 0), (0, n_table - 1), (0, 0)))
    qpart = _fixed._query_jit(
        q_handle.t_split, q_bytes, q_handle.window_width, 2, 256, ed
    )
    return _add_encode(part, qpart)


@functools.partial(jax.jit, static_argnames=("mid",))
def _fold(a, b, g: ed.PointP3, x_mont, xinv_mont, x_bits, xinv_bits, mid: int):
    """Fold scalars and generators: halves every array.

    x_bits/xinv_bits: (256,) uint32 bit decompositions of the challenge and
    its inverse for the generator double-and-add (host knows x, so bits are
    computed there — they are public transcript values, not secrets).
    """
    a_lo, a_hi = a[:, :mid], a[:, mid:]
    b_lo, b_hi = b[:, :mid], b[:, mid:]
    a_next = S.add(S.mul(x_mont, a_lo), S.mul(xinv_mont, a_hi))
    b_next = S.add(S.mul(xinv_mont, b_lo), S.mul(x_mont, b_hi))

    g_lo = ed.index_batch(g, (slice(0, mid),))
    g_hi = ed.index_batch(g, (slice(mid, 2 * mid),))
    ident = ed.identity((mid,))

    def step(acc, bits):
        bit_lo, bit_hi = bits
        acc = ed.double(acc)
        acc = ed.add(acc, ed.select(ident, g_lo, jnp.broadcast_to(bit_lo == 1, (mid,))))
        acc = ed.add(acc, ed.select(ident, g_hi, jnp.broadcast_to(bit_hi == 1, (mid,))))
        return acc, None

    # scan MSB -> LSB; G' = xinv*G_lo + x*G_hi
    bits = (jnp.flip(xinv_bits[:253]), jnp.flip(x_bits[:253]))
    g_next, _ = jax.lax.scan(step, ident, bits)
    return a_next, b_next, g_next


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
    a_ints = scalars_to_ints(a_vector)
    b_ints = scalars_to_ints(b_vector)
    n = len(a_ints)
    assert n > 0 and len(b_ints) == n
    num_rounds = ceil_log2(n)
    np_ = 1 << num_rounds
    assert g_vector.x.shape[-1] == np_, "g_vector must have 2^ceil(lg n) entries"

    _init_transcript(transcript, n)
    if n == 1:
        return (
            np.zeros((0, 32), np.uint8),
            np.zeros((0, 32), np.uint8),
            a_ints[0],
        )

    from ..msm import fixed as _fixed

    a = _mont_from_ints(a_ints, np_)
    b = _mont_from_ints(b_ints, np_)
    g = g_vector
    q_handle = _fixed.MultiexpHandle(q_value, window_width=4, n=1)

    l_out = np.zeros((num_rounds, 32), np.uint8)
    r_out = np.zeros((num_rounds, 32), np.uint8)
    cur = np_
    for round_index in range(num_rounds):
        mid = cur // 2
        lr = np.asarray(_commit_to_fold(a, b, g, q_handle, mid))
        l_out[round_index] = lr[0]
        r_out[round_index] = lr[1]
        x = _round_challenge(transcript, bytes(lr[0]), bytes(lr[1]))
        xinv = pow(x, -1, ORDER)
        a, b, g = _fold(
            a,
            b,
            g,
            S.from_ints([x]),
            S.from_ints([xinv]),
            jnp.asarray(_scalar_bits_le(x)),
            jnp.asarray(_scalar_bits_le(xinv)),
            mid,
        )
        cur = mid

    ap_value = S.to_ints(a)[0]
    return l_out, r_out, ap_value


# ---------------------------------------------------------------------------
# verifier
# ---------------------------------------------------------------------------


def _compute_g_exponents_device(allinv_ap: int, x_sq: list[int]):
    """g_exponents as a (nlimbs, np) Montgomery array built by log(np)
    doubling concatenations (reference verification_computation.cc:28-44:
    block i gets multiplier x_sq in reverse round order)."""
    arr = S.from_ints([allinv_ap])
    for m in reversed(x_sq):
        m_mont = S.from_ints([m])
        arr = jnp.concatenate([arr, S.mul(m_mont, arr)], axis=-1)
    return arr


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
    b_ints = scalars_to_ints(b_vector)
    n = len(b_ints)
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

    b_arr = _mont_from_ints(b_ints, n)
    prod_check = S.to_ints(
        S.inner_product(g_exp_arr[:, :n], b_arr, n)[..., None]
    )[0]

    # decompress L/R; reject invalid encodings
    if num_rounds:
        lr_pts, lr_valid = rst.decode(
            jnp.asarray(np.concatenate([l_vector, r_vector]).T)
        )
        if not bool(np.asarray(lr_valid).all()):
            return False
    else:
        lr_pts = ed.identity((0,))

    generators = ed.PointP3(
        *(
            jnp.concatenate([qc, gc, lrc], axis=-1)
            for qc, gc, lrc in zip(q_value, g_vector, lr_pts)
        )
    )
    exp_bytes = np.zeros((1 + np_ + 2 * num_rounds, 32), np.uint8)
    exp_bytes[0] = np.frombuffer(prod_check.to_bytes(32, "little"), np.uint8)
    exp_bytes[1 : 1 + np_] = np.asarray(S.to_bytes_le(g_exp_arr)).T
    for i, v in enumerate(exp_ints_lr):
        exp_bytes[1 + np_ + i] = np.frombuffer(v.to_bytes(32, "little"), np.uint8)

    expected = engine.msm(generators, [exp_bytes], [32], [False])
    expected_bytes = bytes(np.asarray(rst.encode(expected)).T[0])

    # commit = product*Q + a_commit
    q_prod = _scalar_mul_point(q_value, jnp.asarray(_scalar_bits_le(product_int)), 253)
    commit = ed.add(q_prod, a_commit)
    commit_bytes = bytes(np.asarray(rst.encode(commit)).T[0])
    return expected_bytes == commit_bytes
