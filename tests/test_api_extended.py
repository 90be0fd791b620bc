"""API-layer tests for the non-ristretto pedersen entry points, multiexp
handle lifecycle, recorder, and CLI — the cbindings-level coverage of the
reference (reference cbindings/*.t.cc)."""

import os

import numpy as np
import pytest

from blitzar_tpu import api
from blitzar_tpu.curves import weierstrass as wc
from blitzar_tpu.refimpl import weierstrass as refw


@pytest.fixture(autouse=True)
def fresh_backend():
    api.reset_backend_for_testing()
    yield
    api.reset_backend_for_testing()


def _descriptors(rng, n, nbytes, num=1):
    return [
        api.SequenceDescriptor(
            nbytes, n, rng.integers(0, 256, size=(n * nbytes,), dtype=np.uint8)
        )
        for _ in range(num)
    ]


def _scalar_ints(desc):
    rows = desc.rows()
    return [
        int.from_bytes(bytes(rows[i]), "little") for i in range(desc.n)
    ]


def test_bls12_381_pedersen_with_generators():
    rng = np.random.default_rng(71)
    n = 6
    orc = refw.BLS12381_G1
    pts = orc.random_points(n, seed=5)
    gens = wc.BLS12381_G1.from_affine_ints(pts)
    descs = _descriptors(rng, n, 4, num=2)
    out = api.compute_bls12_381_g1_commitments_with_generators(descs, gens)
    assert out.shape == (2, 48)
    for o, d in enumerate(descs):
        want = refw.compress_bls12_381(orc.msm(_scalar_ints(d), pts))
        assert bytes(out[o]) == want, o


@pytest.mark.parametrize(
    "curve,orc,fn",
    [
        (wc.BN254_G1, refw.BN254_G1, "compute_bn254_g1_uncompressed_commitments_with_generators"),
        (wc.GRUMPKIN, refw.GRUMPKIN, "compute_grumpkin_uncompressed_commitments_with_generators"),
    ],
    ids=["bn254", "grumpkin"],
)
def test_uncompressed_pedersen_with_generators(curve, orc, fn):
    rng = np.random.default_rng(72)
    n = 5
    pts = orc.random_points(n, seed=6)
    gens = curve.from_affine_ints(pts)
    descs = _descriptors(rng, n, 2)
    out = getattr(api, fn)(descs, gens)
    want = orc.msm(_scalar_ints(descs[0]), pts)
    got_x = int.from_bytes(bytes(out["x"][0]), "little")
    got_y = int.from_bytes(bytes(out["y"][0]), "little")
    assert not out["infinity"][0]
    assert (got_x, got_y) == want

    # all-zero scalars -> identity with infinity flag
    zero = [api.SequenceDescriptor(2, n, np.zeros(n * 2, np.uint8))]
    out0 = getattr(api, fn)(zero, gens)
    assert out0["infinity"][0] == 1
    assert int.from_bytes(bytes(out0["x"][0]), "little") == 0


def test_multiexp_handle_api_roundtrip(tmp_path):
    from blitzar_tpu import generators as gen
    from blitzar_tpu.curves import ristretto as rst

    n = 8
    gens = gen.ristretto_generators(n)
    handle = api.multiexp_handle_new(api.SXT_CURVE_RISTRETTO255, gens, n)
    rng = np.random.default_rng(73)
    scalars = rng.integers(0, 256, size=(2, n, 3), dtype=np.uint8)
    out = api.fixed_multiexponentiation(handle, scalars)

    path = str(tmp_path / "h.npz")
    api.multiexp_handle_write_to_file(handle, path)
    loaded = api.multiexp_handle_new_from_file(api.SXT_CURVE_RISTRETTO255, path)
    out2 = api.fixed_multiexponentiation(loaded, scalars)
    a = np.asarray(rst.encode(out)).T
    b = np.asarray(rst.encode(out2)).T
    assert (a == b).all()


def test_recorder_dump_and_replay(tmp_path, monkeypatch):
    from blitzar_tpu import generators as gen
    from blitzar_tpu.msm import fixed
    from blitzar_tpu.utils import recorder

    monkeypatch.setenv(recorder.ENV_VAR, str(tmp_path))
    n = 8
    handle = fixed.MultiexpHandle(gen.ristretto_generators(n), window_width=4)
    rng = np.random.default_rng(74)
    bit_table = [8]
    packed = rng.integers(0, 256, size=(n,), dtype=np.uint8)
    fixed.fixed_packed_multiexponentiation(handle, bit_table, n, packed)
    dirs = sorted(os.listdir(tmp_path))
    assert len(dirs) == 1 and dirs[0].startswith("packed-curve25519")
    data = recorder.replay(os.path.join(tmp_path, dirs[0]))
    assert (data["scalars"] == packed).all()
    assert list(data["output_bit_table"]) == bit_table
    # accessor + result are recorded too; replay_run re-executes and compares
    monkeypatch.delenv(recorder.ENV_VAR)
    name, ok = recorder.replay_run(os.path.join(tmp_path, dirs[0]))
    assert ok and name == dirs[0]

    # and via the CLI
    from blitzar_tpu import cli

    assert cli.main(["replay", os.path.join(tmp_path, dirs[0])]) == 0


def test_cli_partition_table(tmp_path):
    from blitzar_tpu import cli
    from blitzar_tpu.msm import fixed

    out = str(tmp_path / "table")
    rc = cli.main(["partition-table", "--curve", "ristretto255", "--n", "8",
                   "--out", out, "--window-width", "4"])
    assert rc == 0
    handle = fixed.MultiexpHandle.new_from_file(out)
    assert handle.n == 8 and handle.window_width == 4
