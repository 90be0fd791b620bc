"""Sharded MSM on the virtual 8-device CPU mesh vs oracle."""

import numpy as np

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import edwards25519 as ed
from blitzar_tpu.curves import ristretto as rst
from blitzar_tpu.msm import sharded
from blitzar_tpu.refimpl import core as R

import jax


def encode_np(p: ed.PointP3):
    raw = np.asarray(rst.encode(p))
    return [bytes(raw[:, j]) for j in range(raw.shape[1])]


def test_sharded_msm_2d_outputs_axis_matches_oracle():
    """(2, 4) outputs x points mesh (reference distributes outputs over
    devices for many-output problems, bucket_method2/multiexponentiation.h:
    108-121)."""
    assert len(jax.devices()) == 8
    mesh = sharded.make_mesh2d(2, 4)
    n = 40
    oracle_gens = [R.compute_base_element(i) for i in range(n)]
    dev_gens = gen.ristretto_generators(n)
    rng = np.random.default_rng(1234)
    num_outputs = 3  # pads to 4 on the outputs axis
    scalars = rng.integers(0, 256, size=(num_outputs, n, 4), dtype=np.uint8)
    got = sharded.msm_partition2d(mesh, dev_gens, scalars, n)
    want = []
    for o in range(num_outputs):
        vals = [
            int.from_bytes(bytes(scalars[o, i]), "little") for i in range(n)
        ]
        want.append(R.ristretto_encode(R.naive_msm(vals, oracle_gens)))
    assert encode_np(got) == want


def test_sharded_msm_matches_oracle():
    assert len(jax.devices()) == 8
    mesh = sharded.make_mesh()
    n = 100  # not a multiple of 8: exercises padding
    oracle_gens = [R.compute_base_element(i) for i in range(n)]
    dev_gens = gen.ristretto_generators(n)
    rng = np.random.default_rng(97834978)
    vals = [int(v) for v in rng.integers(0, 2**32, size=n)]
    rows = np.array(
        [list(int(v).to_bytes(4, "little")) for v in vals], dtype=np.uint8
    )
    got = sharded.msm(mesh, dev_gens, [rows, rows[:50]], [4, 4], [False, False])
    want = [
        R.ristretto_encode(R.naive_msm(vals, oracle_gens)),
        R.ristretto_encode(R.naive_msm(vals[:50], oracle_gens[:50])),
    ]
    assert encode_np(got) == want
