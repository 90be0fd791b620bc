#!/usr/bin/env python
"""Phase-level timing of verify_inner_product on the live platform.

Replays the body of proof/inner_product.verify_inner_product with a D2H
sync + timer after each phase, so the 2^20 verify cost can be attributed
(tunnel RTTs vs device work vs host marshalling). Run on the TPU tunnel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from blitzar_tpu.utils.cache import configure

configure(jax.config, tag="bench")

import jax.numpy as jnp
import numpy as np

from blitzar_tpu import generators as gen
from blitzar_tpu.curves import edwards25519 as ed
from blitzar_tpu.curves import ristretto as rst
from blitzar_tpu.msm import engine
from blitzar_tpu.proof import inner_product as ipa
from blitzar_tpu.proof.transcript import Transcript

S = ipa.S
ORDER = ipa.ORDER


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << lg
    np_ = n
    rng = np.random.default_rng(3)

    g = gen.ristretto_generators(np_)
    q = gen.ristretto_generators(1, offset=np_)

    def rows62(r):
        out = np.zeros((n, 32), np.uint8)
        out[:, :8] = (
            r.integers(1, 2**62, size=n, dtype=np.uint64).view(np.uint8).reshape(n, 8)
        )
        return out

    a = rows62(rng)
    b = rows62(rng)
    l_vec, r_vec, ap = ipa.prove_inner_product(Transcript(b"bench"), a, b, g, q)
    a_mont = ipa._from_bytes_jit(jnp.asarray(a.T))
    b_mont = ipa._from_bytes_jit(jnp.asarray(b.T))
    inner_jit = jax.jit(lambda am, bm: S.inner_product(am, bm, n)[..., None])
    product = S.to_ints(inner_jit(a_mont, b_mont))[0]
    a_commit = engine.msm(ed.index_batch(g, (slice(0, n),)), [a], [32], [False])

    # warm everything once
    assert ipa.verify_inner_product(
        Transcript(b"bench"), b, product, a_commit, l_vec, r_vec, ap, g, q
    )

    # ---- timed phase replay (verify_inner_product body) ----
    t_all = time.time()
    marks = []

    def mark(name, x=None):
        if x is not None:
            np.asarray(x)
        marks.append((name, time.time()))

    mark("start")
    b_rows = ipa._scalar_rows(b)
    num_rounds = ipa.ceil_log2(n)
    ap_i = ipa.scalars_to_ints([ap])[0]
    product_int = ipa.scalars_to_ints([product])[0]
    l2 = np.asarray(l_vec, np.uint8).reshape(-1, 32)
    r2 = np.asarray(r_vec, np.uint8).reshape(-1, 32)
    mark("host_marshal")

    t = Transcript(b"bench")
    ipa._init_transcript(t, n)
    x_vec = [
        ipa._round_challenge(t, bytes(l2[i]), bytes(r2[i]))
        for i in range(num_rounds)
    ]
    mark("challenges")

    x_sq = [x * x % ORDER for x in x_vec]
    allinv = 1
    for x in x_vec:
        allinv = allinv * pow(x, -1, ORDER) % ORDER
    g_exp_arr = ipa._compute_g_exponents_device(allinv * ap_i % ORDER, x_sq)
    mark("g_exponents", g_exp_arr[:1, :1])

    b_arr = ipa._mont_from_rows(b_rows, n)
    prod_check = S.to_ints(ipa._inner_product_jit(g_exp_arr[:, :n], b_arr))[0]
    mark("prod_check")

    lr_pts, lr_valid = rst.decode(jnp.asarray(np.concatenate([l2, r2]).T))
    assert bool(np.asarray(lr_valid).all())
    mark("lr_decode")

    g_exp_bytes = np.ascontiguousarray(np.asarray(ipa._to_bytes_jit(g_exp_arr)).T)
    mark("g_exp_bytes_d2h")

    g_part = engine.msm(g, [g_exp_bytes], [32], [False])
    mark("g_msm", g_part.x[:1, :1])

    qlr = ed.PointP3(
        *(jnp.concatenate([qc, lrc], axis=-1) for qc, lrc in zip(q, lr_pts))
    )
    exp_ints_lr = [(-v) % ORDER for v in x_sq] + [
        (-pow(x * x % ORDER, -1, ORDER)) % ORDER for x in x_vec
    ]
    qlr_bytes = np.zeros((1 + 2 * num_rounds, 32), np.uint8)
    qlr_bytes[0] = np.frombuffer(prod_check.to_bytes(32, "little"), np.uint8)
    for i, v in enumerate(exp_ints_lr):
        qlr_bytes[1 + i] = np.frombuffer(v.to_bytes(32, "little"), np.uint8)
    qlr_part = engine.msm(qlr, [qlr_bytes], [32], [False])
    mark("qlr_msm", qlr_part.x[:1, :1])

    expected = ed.add(g_part, qlr_part)
    expected_bytes = bytes(np.asarray(rst.encode(expected)).T[0])
    mark("encode_expected")

    q_prod = ipa._scalar_mul_point(
        q, jnp.asarray(ipa._scalar_bits_le(product_int)), 253
    )
    commit = ed.add(q_prod, a_commit)
    commit_bytes = bytes(np.asarray(rst.encode(commit)).T[0])
    mark("commit_ladder")
    assert expected_bytes == commit_bytes

    prev = t_all
    for name, tm in marks:
        print(f"{name:>18}: {tm - prev:7.3f} s")
        prev = tm
    print(f"{'TOTAL':>18}: {prev - t_all:7.3f} s")


if __name__ == "__main__":
    main()
