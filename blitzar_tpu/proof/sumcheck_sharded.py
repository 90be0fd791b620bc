"""Mesh-sharded sumcheck prover — multi-chip analog of the reference's
chunked_gpu_driver (reference proof/sumcheck/chunked_gpu_driver.h:38-134),
which streams MLE chunks across devices and reduces partials.

Sharding layout: MLE tables are stored cyclically — index i = l*D + s lives on
device s at local offset l (shape (nlimbs, num_mles, L, D), last axis
sharded). A sumcheck round pairs index i with i + n/2; since D divides n/2
while L >= 2, every pair is device-local and the fold requires ZERO
communication. The round polynomial is a local map-reduce followed by one
all_gather of (degree+1) field elements per device — O(D * degree)
communication per round, independent of n (the same partials-then-reduce
shape as the reference's reduction_gpu combine, sum_gpu.h:60-149). When the
local length drops below 2, the remaining log2(D) rounds run replicated on a
single device (they touch <= D elements).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..fields.mont import MontField
from . import sumcheck as _sc

AXIS = "mle"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


@functools.partial(
    jax.jit,
    static_argnames=("field", "terms_struct", "degree", "local_mid", "mesh"),
)
def _sharded_sum(field: MontField, arr, mults, terms_struct, degree: int, local_mid: int, mesh: Mesh):
    """arr: (nlimbs, M, 2*local_mid, D) cyclic-sharded -> (nlimbs, degree+1)
    replicated round polynomial."""

    def local(a, m):
        a = a[..., 0]  # (nlimbs, M, 2*local_mid)
        coeffs = _sc._sum_round(field, a, m, terms_struct, degree, local_mid)
        gathered = jax.lax.all_gather(coeffs, AXIS)  # (D, nlimbs, degree+1)
        return field.tree_sum(jnp.moveaxis(gathered, 0, -1), gathered.shape[0])

    spec = P(None, None, None, AXIS)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=P(),
        check_vma=False,
    )(arr, mults)


@functools.partial(jax.jit, static_argnames=("field", "local_mid", "mesh"))
def _sharded_fold(field: MontField, arr, r, one_m_r, local_mid: int, mesh: Mesh):
    """Zero-communication fold: (nlimbs, M, 2*local_mid, D) ->
    (nlimbs, M, local_mid, D)."""

    def local(a, rr, omr):
        a = a[..., 0]
        folded = _sc._fold_round(field, a, rr, omr, local_mid)
        return folded[..., None]

    spec = P(None, None, None, AXIS)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, P(), P()),
        out_specs=spec,
        check_vma=False,
    )(arr, r, one_m_r)


def prove_sum_sharded(
    mesh: Mesh,
    transcript: _sc.SumcheckTranscript,
    mles,
    product_table,
    product_terms,
    n: int,
    codec: _sc.FieldCodec = _sc.SCALAR25519_CODEC,
):
    """Drop-in for proof.sumcheck.prove_sum, sharded over `mesh`."""
    field = codec.field
    assert n > 0
    d = mesh.size
    num_variables = max(_sc.ceil_log2(n), 1)
    n_pad = 1 << num_variables
    if n_pad < 4 * d:
        return _sc.prove_sum(transcript, mles, product_table, product_terms, n, codec)

    mles = [[int(v) % field.modulus for v in row] for row in mles]
    num_mles = len(mles)
    degree = max(num_terms for _, num_terms in product_table)
    flat: list[int] = []
    for row in mles:
        assert len(row) == n
        flat.extend(row + [0] * (n_pad - n))
    # cyclic layout: index i = l*D + s -> [..., l, s]
    arr = field.from_ints(flat).reshape(field.nlimbs, num_mles, n_pad // d, d)
    mults = field.from_ints([m for m, _ in product_table])
    terms_struct = _sc._structure(product_table, product_terms)

    transcript.init(num_variables, degree)
    polynomials: list[list[int]] = []
    evaluation_point: list[int] = []

    local_len = n_pad // d
    round_index = 0
    # sharded phase: pairs are device-local while local_len >= 2
    while local_len >= 2 and round_index < num_variables:
        local_mid = local_len // 2
        coeffs = _sharded_sum(field, arr, mults, terms_struct, degree, local_mid, mesh)
        poly_ints = field.to_ints(coeffs)
        polynomials.append(poly_ints)
        r = transcript.round_challenge(poly_ints)
        evaluation_point.append(r)
        round_index += 1
        if round_index < num_variables:
            r_mont = field.from_ints([r])
            one_m_r = field.from_ints([(1 - r) % field.modulus])
            arr = _sharded_fold(field, arr, r_mont, one_m_r, local_mid, mesh)
            local_len = local_mid

    # replicated tail: <= D elements left; finish on the plain path
    if round_index < num_variables:
        # back to natural order: (l, s) -> i = l*D + s
        tail = jnp.reshape(arr, (field.nlimbs, num_mles, local_len * d))
        cur = local_len * d
        while round_index < num_variables:
            mid = cur // 2
            coeffs = _sc._sum_round(field, tail, mults, terms_struct, degree, mid)
            poly_ints = field.to_ints(coeffs)
            polynomials.append(poly_ints)
            r = transcript.round_challenge(poly_ints)
            evaluation_point.append(r)
            round_index += 1
            if round_index < num_variables:
                r_mont = field.from_ints([r])
                one_m_r = field.from_ints([(1 - r) % field.modulus])
                tail = _sc._fold_round(field, tail, r_mont, one_m_r, mid)
                cur = mid
    return polynomials, evaluation_point
