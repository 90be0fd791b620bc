"""ONE conformance suite, every MSM engine (VERDICT r3 #6).

The reference runs a single exercise_multiexponentiation_fn property suite
over every driver (reference multiexp/test/multiexponentiation.cc:26-136,
proof/inner_product/driver_test.h); this is the same idea: a shared
edge-case list (zeros, +-1/2/3, max-uint, alternating, ragged lengths,
n = 0 outputs, signed mixes, the 16-byte two's-complement boundary,
chunk-crossing n) executed through each engine adapter and checked
per-output against the pure-Python oracle.

Cost design (this host has ONE core; every distinct shape is a fresh
multi-second XLA:CPU compile): the whole edge-case list is packed into a
SINGLE multi-output MSM problem per engine — uniform element width, one
compile per engine — exactly the shape a multi-column Pedersen workload has
in production. The empty-problem case is checked separately (no compile).

Engines covered: default dispatch (partition handle incl. the signed
two-mask query), small-n streamed, explicit streaming with chunk-crossing,
bucket (sort+segment), 1-D sharded, 2-D (outputs x points) sharded.
"""

import numpy as np
import pytest

import jax

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import edwards25519 as ed
from blitzar_tpu.curves import ristretto as rst
from blitzar_tpu.msm import engine, fixed, sharded
from blitzar_tpu.refimpl import core as R

N_GENS = 40
NBYTES = 16  # one width for the whole suite: one compiled program per engine
ORACLE_GENS = [R.compute_base_element(i) for i in range(N_GENS)]
DEV_GENS = gen.ristretto_generators(N_GENS)

# the shared edge-case list, one output each (reference
# multiexponentiation.cc:26-136). (values, is_signed)
EDGE_OUTPUTS = [
    ("zeros", [0, 0, 0], False),
    ("ones_twos", [1, 2, 3], False),
    ("u8_max", [255, 255], False),
    ("max_uint64", [2**64 - 1] * 3, False),
    ("max_uint128", [2**128 - 1], False),
    ("alternating", [1, 0, 1, 0, 1], False),
    ("ragged_long", [1, 2, 3, 4, 5, 6, 7], False),
    ("ragged_short", [9, 8], False),
    ("n_zero", [], False),
    ("signed_small", [-5, 3, -1, 1], True),
    ("signed_boundary", [-(1 << 127), (1 << 127) - 1, -1, 1], True),
    ("chunk_crossing", [(i * 2654435761) % (1 << 32) for i in range(N_GENS)], False),
]


def encode_np(p: ed.PointP3):
    raw = np.asarray(rst.encode(p))
    return [bytes(raw[:, j]) for j in range(raw.shape[1])]


def _problem(signed_ok: bool):
    outputs = [o for o in EDGE_OUTPUTS if signed_ok or not o[2]]
    data_list, nbytes_list, signed_list, names = [], [], [], []
    for name, vals, is_signed in outputs:
        rows = np.zeros((len(vals), NBYTES), dtype=np.uint8)
        for i, v in enumerate(vals):
            raw = int(v) % (1 << (8 * NBYTES))
            rows[i] = list(raw.to_bytes(NBYTES, "little"))
        data_list.append(rows)
        nbytes_list.append(NBYTES)
        signed_list.append(is_signed)
        names.append(name)
    want = [
        R.ristretto_encode(R.naive_msm(vals, ORACLE_GENS[: len(vals)]))
        for _, vals, _ in outputs
    ]
    return data_list, nbytes_list, signed_list, names, want


# ---------------------------------------------------------------------------
# engine adapters: (points, data_list, nbytes_list, signed_list) -> PointP3
# ---------------------------------------------------------------------------


def _default(points, data_list, nbytes_list, signed_list, monkeypatch):
    monkeypatch.delenv("BLITZAR_TPU_SMALL_MSM", raising=False)
    monkeypatch.delenv("BLITZAR_TPU_MSM_ENGINE", raising=False)
    return engine.msm(points, data_list, nbytes_list, signed_list)


def _small_stream(points, data_list, nbytes_list, signed_list, monkeypatch):
    monkeypatch.setenv("BLITZAR_TPU_SMALL_MSM", "stream")
    engine._SMALL_SEEN.clear()
    engine._HANDLE_CACHE.clear()
    return engine.msm(points, data_list, nbytes_list, signed_list)


def _streaming(points, data_list, nbytes_list, signed_list, monkeypatch):
    # chunk = 16 points so the padded n = 64 crosses chunk boundaries — the
    # reference exercises multi-chunk by shrinking split options the same way
    monkeypatch.setattr(fixed, "STREAM_CHUNK_POINTS", 16)
    scalars, signs, n = engine.prepare_scalars(data_list, nbytes_list, signed_list)
    n_pad = 8
    while n_pad < n:
        n_pad *= 2
    scalars = np.pad(scalars, ((0, 0), (0, n_pad - n), (0, 0)))
    signs = np.pad(signs, ((0, 0), (0, n_pad - n)))
    return fixed.streaming_multiexponentiation(
        points, scalars, signs=signs if any(signed_list) else None
    )


def _bucket(points, data_list, nbytes_list, signed_list, monkeypatch):
    monkeypatch.setenv("BLITZAR_TPU_MSM_ENGINE", "bucket")
    # persistent-cache serialization of the sort+while_loop program aborts
    # XLA:CPU on some hosts — compile it uncached (see test_msm.py)
    cache_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        return engine.msm(points, data_list, nbytes_list, signed_list)
    finally:
        jax.config.update("jax_compilation_cache_dir", cache_dir)


def _sharded1d(points, data_list, nbytes_list, signed_list, monkeypatch):
    mesh = sharded.make_mesh()
    return sharded.msm(mesh, points, data_list, nbytes_list, signed_list)


def _sharded2d(points, data_list, nbytes_list, signed_list, monkeypatch):
    mesh = sharded.make_mesh2d(2, 4)
    scalars, signs, n = engine.prepare_scalars(data_list, nbytes_list, signed_list)
    return sharded.msm_partition2d(mesh, points, scalars, n)


ENGINES = {
    "default": (_default, True),
    "small_stream": (_small_stream, True),
    "streaming": (_streaming, True),
    "bucket": (_bucket, True),
    "sharded1d": (_sharded1d, True),
    "sharded2d": (_sharded2d, False),  # the unsigned many-output path
}


@pytest.mark.parametrize(
    "engine_name",
    [
        # bucket: compiles its sort+while_loop program UNCACHED every run
        # (persistent-cache serialization aborts XLA:CPU) — ~5 min;
        # sharded1d: 8-device mesh compile of the full engine (~5 min; the
        # 2-D mesh case and test_msm_sharded keep fast-profile mesh
        # coverage). Both run in the full/CI profile.
        pytest.param(name, marks=pytest.mark.slow)
        if name in ("bucket", "sharded1d")
        else name
        for name in ENGINES
    ],
)
def test_conformance(engine_name, monkeypatch):
    if engine_name.startswith("sharded") and len(jax.devices()) < 8:
        pytest.skip("sharded engines need the 8-device CPU mesh")
    fn, signed_ok = ENGINES[engine_name]
    data_list, nbytes_list, signed_list, names, want = _problem(signed_ok)
    got = fn(DEV_GENS, data_list, nbytes_list, signed_list, monkeypatch)
    got_enc = encode_np(got)
    bad = [nm for nm, g, w in zip(names, got_enc, want) if g != w]
    assert not bad, f"{engine_name}: mismatched outputs {bad}"


@pytest.mark.parametrize("engine_name", ["default", "small_stream", "sharded1d"])
def test_conformance_empty(engine_name, monkeypatch):
    if engine_name.startswith("sharded") and len(jax.devices()) < 8:
        pytest.skip("sharded engines need the 8-device CPU mesh")
    fn, _ = ENGINES[engine_name]
    got = fn(DEV_GENS, [], [], [], monkeypatch)
    assert got.x.shape[-1] == 0
