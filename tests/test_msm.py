"""MSM engine vs the naive oracle — mirrors the reference's
exercise_multiexponentiation property suite (reference
multiexp/test/multiexponentiation.cc): edge cases + randomized problems
against a naive host sum, deterministic seeds."""

import random

import pytest

import jax.numpy as jnp
import numpy as np

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import edwards25519 as ed
from blitzar_tpu.curves import ristretto as rst
from blitzar_tpu.msm import engine
from blitzar_tpu.refimpl import core as R
from vectors import RUST_DATA, RUST_EXPECTED

rng = random.Random(97834978)

N_GENS = 40
ORACLE_GENS = [R.compute_base_element(i) for i in range(N_GENS)]
DEV_GENS = gen.ristretto_generators(N_GENS)


def encode_np(p: ed.PointP3):
    raw = np.asarray(rst.encode(p))
    return [bytes(raw[:, j]) for j in range(raw.shape[1])]


def run_case(seq_values, nbytes_list, signed_list):
    """seq_values: list of per-output lists of signed python ints."""
    data_list = []
    for vals, nbytes, is_signed in zip(seq_values, nbytes_list, signed_list):
        rows = np.zeros((len(vals), nbytes), dtype=np.uint8)
        for i, v in enumerate(vals):
            raw = int(v) % (1 << (8 * nbytes))
            rows[i] = list(raw.to_bytes(nbytes, "little"))
        data_list.append(rows)
    got = engine.msm(DEV_GENS, data_list, nbytes_list, signed_list)
    want = [
        R.ristretto_encode(R.naive_msm(vals, ORACLE_GENS[: len(vals)]))
        for vals in seq_values
    ]
    assert encode_np(got) == want


def test_rust_vectors_end_to_end():
    data_list = [
        np.array([list(int(v).to_bytes(4, "little")) for v in row], dtype=np.uint8)
        for row in RUST_DATA
    ]
    got = engine.msm(DEV_GENS, data_list, [4, 4, 4], [False] * 3)
    assert encode_np(got) == RUST_EXPECTED


def test_edge_cases():
    run_case([[0, 0, 0]], [1], [False])  # all zeros
    run_case([[1], [2], [255]], [1, 1, 1], [False] * 3)
    run_case([[2**64 - 1] * 3], [8], [False])  # max uint64
    run_case([[1, 0, 1, 0, 1]], [1], [False])


def test_signed_and_mixed():
    run_case([[-1, 1, -2]], [2], [True])
    run_case([[-128], [127]], [1, 1], [True, True])
    # mixed signed/unsigned outputs with different nbytes
    run_case([[-5, 3], [200, 100]], [4, 1], [True, False])


def test_empty_sequence_list():
    # no outputs at all (reference exercise: f(rng, {}) with empty inputs)
    got = engine.msm(DEV_GENS, [], [], [])
    assert got.x.shape[-1] == 0


def test_n_zero_descriptor_mixed_with_nonempty():
    run_case([[], [3, 4], []], [4, 4, 1], [False, False, False])
    run_case([[], [-3]], [2, 2], [True, True])


@pytest.mark.slow
def test_signed_16_byte_boundary():
    # element_nbytes = 16 is the widest signed width the ABI admits
    # (reference populate_exponent_sequence rejects signed > 16 bytes);
    # exercise the two's-complement boundary values
    bound = 1 << 127
    run_case([[-bound, bound - 1, -1, 1]], [16], [True])
    run_case([[-bound] * 3, [bound - 1] * 3], [16, 16], [True, True])


def test_ragged_lengths():
    # different sequence lengths across outputs (shorter ones zero-padded)
    run_case([[1, 2, 3, 4, 5, 6, 7], [9, 8], []], [2, 2, 2], [False] * 3)


@pytest.mark.slow
def test_random_problems():
    for trial in range(4):
        num_outputs = rng.randrange(1, 4)
        n = rng.randrange(1, N_GENS)
        nbytes_list, signed_list, seqs = [], [], []
        for _ in range(num_outputs):
            nbytes = rng.choice([1, 2, 4, 8, 16, 32])
            is_signed = rng.random() < 0.5
            bound = 1 << (8 * nbytes - 1)
            if is_signed:
                vals = [rng.randrange(-bound, bound) for _ in range(n)]
            else:
                vals = [rng.randrange(2 * bound) for _ in range(n)]
            nbytes_list.append(nbytes)
            signed_list.append(is_signed)
            seqs.append(vals)
        run_case(seqs, nbytes_list, signed_list)


@pytest.mark.slow
def test_skewed_buckets_multiround():
    # all scalars identical: one bucket holds every point -> multiple
    # while-loop rounds with tiny capacity
    #
    # NOTE: persistent-cache serialization of this sort+while_loop program
    # aborts XLA:CPU on some hosts (CHECK failure inside
    # put_executable_and_time) — compile it uncached.
    import jax

    cache_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        _run_skewed_buckets()
    finally:
        jax.config.update("jax_compilation_cache_dir", cache_dir)


def _run_skewed_buckets():
    n = 33
    rows = np.full((n, 1), 7, dtype=np.uint8)
    digits = engine.digit_decompose(jnp.asarray(rows[None]))
    got = engine.msm_jit(
        DEV_GENS if N_GENS >= n else None,
        digits,
        jnp.zeros((1, n), jnp.uint8),
        num_outputs=1,
        num_windows=1,
        capacity=8,
    )
    want = R.ristretto_encode(R.naive_msm([7] * n, ORACLE_GENS[:n]))
    assert encode_np(got) == [want]


@pytest.mark.slow
def test_small_n_promotes_to_cached_handle(monkeypatch):
    # the small-n streamed path runs a fresh generator set once; a SECOND
    # msm over the same live array must promote to a cached w=8 handle so
    # repeat-call workloads become query-only
    monkeypatch.setenv("BLITZAR_TPU_SMALL_MSM", "stream")
    pts = gen.ristretto_generators(16)
    engine._SMALL_SEEN.clear()
    engine._HANDLE_CACHE.clear()
    data = [np.arange(16, dtype=np.uint8).reshape(16, 1)]
    first = encode_np(engine.msm(pts, data, [1], [False]))
    assert not engine._handle_cached(pts, 16, ed)
    second = encode_np(engine.msm(pts, data, [1], [False]))
    assert engine._handle_cached(pts, 16, ed)
    third = encode_np(engine.msm(pts, data, [1], [False]))
    assert first == second == third
    want = R.ristretto_encode(R.naive_msm(list(range(16)), ORACLE_GENS[:16]))
    assert first == [want]
