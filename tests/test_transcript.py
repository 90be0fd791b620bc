"""Transcript vs the merlin crate's canonical vectors (the reference's
transcript is byte-compatible with merlin; see reference
proof/transcript/transcript.t.cc)."""

from blitzar_tpu.proof.transcript import Transcript


def test_merlin_equivalence_vector():
    # the merlin crate's doc-test vector
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    cb = t.challenge_bytes(b"challenge", 32)
    assert cb.hex() == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_transcript_determinism_and_divergence():
    a = Transcript(b"proto")
    b = Transcript(b"proto")
    a.append_u64(b"n", 42)
    b.append_u64(b"n", 42)
    assert a.challenge_bytes(b"x", 16) == b.challenge_bytes(b"x", 16)
    # diverge
    a.append_message(b"m", b"1")
    b.append_message(b"m", b"2")
    assert a.challenge_bytes(b"x", 16) != b.challenge_bytes(b"x", 16)


def test_challenge_scalar_reduction():
    order = 2**252 + 27742317777372353535851937790883648493
    t = Transcript(b"proto")
    s = t.challenge_scalar(b"x", order)
    assert 0 <= s < order
