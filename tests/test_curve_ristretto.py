"""Device curve/ristretto layer vs the pinned pure-Python oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import edwards25519 as ed
from blitzar_tpu.curves import ristretto as rst
from blitzar_tpu.fields import fp25519 as F
from blitzar_tpu.refimpl import core as R
from blitzar_tpu.utils.limbs import ints_to_limbs


def to_point(pts):
    """list of oracle (X,Y,Z,T) -> device PointP3 batch."""
    coords = list(zip(*pts))
    return ed.PointP3(*(jnp.asarray(ints_to_limbs(c, F.NLIMBS)) for c in coords))


def encode_np(p: ed.PointP3) -> list[bytes]:
    raw = np.asarray(rst.encode(p))
    return [bytes(raw[:, j]) for j in range(raw.shape[1])]


ORACLE_PTS = [R.compute_base_element(i) for i in range(12)]
ORACLE_ENC = [R.ristretto_encode(p) for p in ORACLE_PTS]


def test_encode_matches_oracle():
    assert encode_np(to_point(ORACLE_PTS)) == ORACLE_ENC


def test_add_double_neg_match_oracle():
    p = to_point(ORACLE_PTS[:6])
    q = to_point(ORACLE_PTS[6:12])
    got = encode_np(ed.add(p, q))
    want = [R.ristretto_encode(R.pt_add(a, b)) for a, b in zip(ORACLE_PTS[:6], ORACLE_PTS[6:12])]
    assert got == want
    got = encode_np(ed.double(p))
    want = [R.ristretto_encode(R.pt_double(a)) for a in ORACLE_PTS[:6]]
    assert got == want
    got = encode_np(ed.neg(p))
    want = [R.ristretto_encode(R.pt_neg(a)) for a in ORACLE_PTS[:6]]
    assert got == want


def test_identity_and_tree_reduce():
    ident = ed.identity((3,))
    assert encode_np(ident) == [bytes(32)] * 3
    pts = to_point(ORACLE_PTS)
    total = ed.tree_reduce(pts, 12)
    acc = R.IDENTITY
    for p in ORACLE_PTS:
        acc = R.pt_add(acc, p)
    total_b = ed.PointP3(*(c[:, None] for c in total))
    assert encode_np(total_b) == [R.ristretto_encode(acc)]


def test_decode_roundtrip_and_reject():
    enc = np.stack([np.frombuffer(e, np.uint8) for e in ORACLE_ENC], axis=1)
    pts, valid = rst.decode(jnp.asarray(enc))
    assert bool(jnp.all(valid))
    assert encode_np(pts) == ORACLE_ENC
    bad = np.zeros((32, 3), np.uint8)
    bad[0, 0] = 1  # odd s
    bad[:, 1] = 0xFF  # >= p and top bit set
    bad[0, 2] = 0xEE  # p + 1: non-canonical
    bad[1:31, 2] = 0xFF
    bad[31, 2] = 0x7F
    _, valid = rst.decode(jnp.asarray(bad))
    assert list(np.asarray(valid)) == [False, False, False]


def test_generators_match_oracle():
    pts = gen.ristretto_generators(12)
    assert encode_np(pts) == ORACLE_ENC
    # offset path
    pts = gen.ristretto_generators(5, offset=7)
    assert encode_np(pts) == ORACLE_ENC[7:12]


def test_one_commitments():
    gen.CACHE.reset()
    oc = gen.one_commitments(5)
    want = [R.ristretto_encode(p) for p in R.one_commitments(5)]
    assert encode_np(oc) == want
    one = gen.one_commitment(5)
    total = ed.PointP3(*(c[:, None] for c in one))
    acc = R.IDENTITY
    for p in ORACLE_PTS[:5]:
        acc = R.pt_add(acc, p)
    assert encode_np(total) == [R.ristretto_encode(acc)]


def test_property_checks():
    # reference curve21/property/{curve,identity}.cc
    pts = to_point(ORACLE_PTS)
    assert np.asarray(ed.is_on_curve(pts)).all()
    assert not np.asarray(ed.is_identity(pts)).any()
    ident = ed.identity((3,))
    assert np.asarray(ed.is_identity(ident)).all()
    assert np.asarray(ed.is_on_curve(ident)).all()
    # corrupt one coordinate -> off curve
    bad = ed.PointP3(F.add(pts.x, F.from_int_const(1, pts.batch_shape)),
                     pts.y, pts.z, pts.t)
    assert not np.asarray(ed.is_on_curve(bad)).any()
