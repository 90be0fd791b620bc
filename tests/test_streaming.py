"""Streaming build+query MSM (fixed.streaming_multiexponentiation) vs oracle,
with chunk boundaries forced small — the very-large-n path of engine.msm
(reference analog: pippenger2's table-slice streaming)."""

import numpy as np

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import ristretto as rst
from blitzar_tpu.msm import fixed
from blitzar_tpu.refimpl import core as refc


def test_streaming_matches_oracle(monkeypatch):
    monkeypatch.setattr(fixed, "STREAM_CHUNK_POINTS", 64)
    n, nbytes, num_outputs = 200, 4, 2
    points = gen.ristretto_generators(n)
    rng = np.random.default_rng(17)
    scalars = rng.integers(0, 256, size=(num_outputs, n, nbytes), dtype=np.uint8)
    out = fixed.streaming_multiexponentiation(points, scalars, window_width=4)
    got = np.asarray(rst.encode(out)).T
    gens_ref = refc.get_generators(n)
    for o in range(num_outputs):
        ints = [
            int.from_bytes(bytes(scalars[o, i]), "little") for i in range(n)
        ]
        want = refc.ristretto_encode(refc.naive_msm(ints, gens_ref))
        assert bytes(got[o]) == want, o


def test_streaming_single_chunk_equals_handle():
    n, nbytes = 64, 3
    points = gen.ristretto_generators(n)
    rng = np.random.default_rng(18)
    scalars = rng.integers(0, 256, size=(1, n, nbytes), dtype=np.uint8)
    a = fixed.streaming_multiexponentiation(points, scalars, window_width=8)
    handle = fixed.MultiexpHandle(points, window_width=8)
    b = fixed.fixed_multiexponentiation(handle, scalars)
    assert (
        np.asarray(rst.encode(a)) == np.asarray(rst.encode(b))
    ).all()
