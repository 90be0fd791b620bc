#!/usr/bin/env python
"""Benchmark sweep driver, mirroring reference benchmark/scripts/run_benchmarks.py
(n in {10^4, 10^5, 10^6}, num_commitments in {1, 10}, element_nbytes in
{1, 32}, timed samples) plus the other reference benchmark executables:

  pedersen      — dynamic-generator Pedersen commitments (multi_commitment)
  fixed         — fixed-generator MSM w/ partition tables (multi_exp_pip)
  vlen          — variable-length fixed MSM (multi_exp_triangle)
  ipa           — inner-product proof prove+verify (inner_product_proof)
  sumcheck      — sumcheck prover (sumcheck)
  primitives    — field add/mul + curve add microbenchmarks (primitives)

Each result is one JSON line on stdout. Timing forces completion with a D2H
copy (block_until_ready does not block on the axon tunnel platform).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor JAX_PLATFORMS through jax.config: the axon sitecustomize backend
# hook ignores the env var and would hang dialing the tunnel when it is down
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
from blitzar_tpu.utils.cache import configure as _configure_cache

_configure_cache(jax.config, tag="bench")

import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(x)


def _time(fn, samples):
    fn()  # warm/compile
    times = []
    for _ in range(samples):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def _emit(name, params, seconds, work=None, checked=None):
    rec = {"benchmark": name, **params, "seconds": round(seconds, 5)}
    if work:
        rec["per_second"] = round(work / seconds, 1)
    if checked is not None:
        rec["checked"] = checked
    print(json.dumps(rec), flush=True)


def bench_pedersen(ns, num_commitments_list, nbytes_list, samples):
    from blitzar_tpu import generators as gen
    from blitzar_tpu.msm import engine

    import pinned

    for n in ns:
        points = gen.ristretto_generators(n)
        for num_outputs in num_commitments_list:
            for nbytes in nbytes_list:
                # deterministic counter scalars: the result digest is
                # checkable against the pinned CPU-path values
                data = [
                    pinned.counter_scalars(n, nbytes, output=o)
                    for o in range(num_outputs)
                ]

                def run():
                    out = engine.msm(
                        points, data, [nbytes] * num_outputs, [False] * num_outputs
                    )
                    _sync(out.x[:, :1])
                    return out

                dt = _time(run, samples)
                want = pinned.PINNED.get("pedersen", {}).get(
                    (n, num_outputs, nbytes)
                )
                got = pinned.ristretto_digest(run())
                if want is not None:
                    assert got == want, (
                        f"pedersen ({n},{num_outputs},{nbytes}): {got} != {want}"
                    )
                _emit(
                    "pedersen",
                    {"n": n, "num_commitments": num_outputs, "element_nbytes": nbytes},
                    dt,
                    work=n * num_outputs,
                    checked=True if want is not None else f"no-pin:{got}",
                )


def bench_fixed(ns, curves, samples):
    from blitzar_tpu import api
    from blitzar_tpu import generators as gen
    from blitzar_tpu.msm import fixed

    import pinned

    for curve_name in curves:
        curve_id = {"ristretto255": 0, "bls12-381": 1, "bn254": 2, "grumpkin": 3}[
            curve_name
        ]
        curve = api.CURVES[curve_id]
        for n in ns:
            if curve_id == 0:
                points = gen.ristretto_generators(n)
            else:
                points = pinned.wcurve_bench_points(curve, n)
            handle = None  # free the previous curve's table before building
            handle = fixed.MultiexpHandle(points, curve=curve, n=n)
            # deterministic counter scalars so the result can be checked
            # against the pinned cross-implementation digests
            scalars = pinned.counter_scalars(n)[None]

            def run():
                out = fixed.fixed_multiexponentiation(handle, scalars)
                _sync(out.x[:, :1])
                return out

            dt = _time(run, samples)
            # correctness gate BEFORE emitting the timing: digest the device
            # result against the pinned CPU/reference value (VERDICT r4 #2)
            log_n = n.bit_length() - 1 if n & (n - 1) == 0 else None
            res = run()
            if curve_id == 0:
                got = pinned.ristretto_digest(res)
                want = pinned.PINNED["ristretto_msm"].get((log_n,))
            else:
                got = pinned.wcurve_digest(curve, res)
                want = pinned.PINNED["wcurve_msm"].get((curve_name, log_n))
            if want is not None:
                assert got == want, (
                    f"fixed {curve_name} 2^{log_n}: device digest {got} != "
                    f"pinned {want}"
                )
                checked = True
            else:
                # no pinned digest for this shape: cross-check the handle
                # result against w=4 chunk tables on device (independent
                # table build + bit decomposition)
                alt = fixed.streaming_multiexponentiation(
                    points, scalars, curve=curve, window_width=4
                )
                alt_d = (
                    pinned.ristretto_digest(alt)
                    if curve_id == 0
                    else pinned.wcurve_digest(curve, alt)
                )
                assert alt_d == got, (
                    f"fixed {curve_name}: w=8 {got} != w=4 {alt_d}"
                )
                checked = f"dual-window:{got}"

            # device-resident query (scalars pre-uploaded): isolates chip
            # compute from the host link, matching bench.py / the reference's
            # multi_exp_pip timing of device work
            n_table = handle.num_groups * handle.window_width
            sdev = jnp.asarray(
                np.pad(scalars, ((0, 0), (0, n_table - n), (0, 0)))
                if n < n_table
                else scalars
            )

            def run_dev():
                out = fixed._query_jit(
                    handle.t_split, sdev, handle.window_width, 1, 256, curve
                )
                _sync(out.x[:, :1])

            dt_dev = _time(run_dev, samples)
            _emit(
                "fixed",
                {"curve": curve_name, "n": n, "device_s": round(dt_dev, 5),
                 "device_per_second": round(n / dt_dev, 1),
                 "window_width": handle.window_width},
                dt,
                work=n,
                checked=checked,
            )
            handle = None


def bench_vlen(n, num_outputs, samples):
    from blitzar_tpu import generators as gen
    from blitzar_tpu.msm import fixed

    import pinned

    points = gen.ristretto_generators(n)
    handle = fixed.MultiexpHandle(points, n=n)
    bit_table = [32] * num_outputs
    lengths = sorted(
        int(v) for v in np.linspace(max(n // num_outputs, 1), n, num_outputs)
    )
    bit_sum = sum(bit_table)
    # deterministic packed bytes (digest-checkable): counter rows truncated
    # to the packed byte count
    packed = pinned.counter_scalars(n, -(-bit_sum // 8)).reshape(-1)

    def run():
        out = fixed.fixed_vlen_multiexponentiation(handle, bit_table, lengths, packed)
        _sync(out.x[:, :1])
        return out

    dt = _time(run, samples)
    got = pinned.ristretto_digest(run())
    want = pinned.PINNED.get("vlen", {}).get(
        (n.bit_length() - 1 if n & (n - 1) == 0 else None, num_outputs)
    )
    if want is not None:
        assert got == want, f"vlen: {got} != pinned {want}"
    _emit(
        "vlen", {"n": n, "num_outputs": num_outputs}, dt, work=sum(lengths),
        checked=True if want is not None else f"no-pin:{got}",
    )


def bench_ipa(ns, samples):
    from blitzar_tpu import generators as gen
    from blitzar_tpu.msm import engine
    from blitzar_tpu.proof import inner_product as ipa
    from blitzar_tpu.proof.transcript import Transcript

    rng = np.random.default_rng(3)
    for n in ns:
        np_ = 1 << ipa.ceil_log2(n)
        g = gen.ristretto_generators(np_)
        q = gen.ristretto_generators(1, offset=np_)
        # (n, 32) uint8 LE rows — the ABI shape; takes _scalar_rows' no-copy
        # fast path (per-int Python marshalling costs minutes at 2^20)
        def rows62(r):
            out = np.zeros((n, 32), np.uint8)
            out[:, :8] = r.integers(1, 2**62, size=n, dtype=np.uint64).view(
                np.uint8
            ).reshape(n, 8)
            return out

        a = rows62(rng)
        b = rows62(rng)

        def prove():
            return ipa.prove_inner_product(Transcript(b"bench"), a, b, g, q)

        t0 = time.time()
        l_vec, r_vec, ap = prove()
        warm = time.time() - t0
        t0 = time.time()
        for _ in range(samples):
            l_vec, r_vec, ap = prove()
        dt_prove = (time.time() - t0) / samples
        # emit prove NOW so a verify-stage failure doesn't lose it
        _emit("ipa_prove", {"n": n, "warm_s": round(warm, 2)}, dt_prove)

        # <a, b> mod l on device, jitted (eager mont muls at 2^20 dispatch
        # several-GB unfused intermediates and OOM next to the handle table)
        from blitzar_tpu.fields import params as _params

        S = _params.SCALAR25519
        a_mont = ipa._from_bytes_jit(jnp.asarray(a.T))
        b_mont = ipa._from_bytes_jit(jnp.asarray(b.T))
        inner_jit = jax.jit(lambda am, bm: S.inner_product(am, bm, n)[..., None])
        product = S.to_ints(inner_jit(a_mont, b_mont))[0]
        a_commit = engine.msm(
            engine.ed.index_batch(g, (slice(0, n),)), [a], [32], [False]
        )

        def verify():
            return ipa.verify_inner_product(
                Transcript(b"bench"), b, product, a_commit, l_vec, r_vec, ap, g, q
            )

        assert verify()
        t0 = time.time()
        for _ in range(samples):
            verify()
        dt_verify = (time.time() - t0) / samples
        _emit("ipa_verify", {"n": n}, dt_verify, checked="protocol-verify")

    # free the device residents (the 2^20 w=8 handle table is 6.4 GB of
    # HBM; leaving it cached OOMs a following sumcheck suite)
    import gc

    engine._HANDLE_CACHE.clear()
    engine._SMALL_SEEN.clear()
    gc.collect()


def bench_sumcheck(n, degree, num_products, samples):
    from blitzar_tpu.proof import sumcheck as sc
    from blitzar_tpu.proof.transcript import Transcript

    rng = np.random.default_rng(4)
    num_mles = max(degree, 2)
    # ABI byte-row form (num_mles, n, 32): takes the vectorized device-side
    # conversion fast path (per-int Python marshalling at 2^20 costs minutes
    # on this 1-core host and is not what the C ABI pays)
    mles = np.zeros((num_mles, n, 32), np.uint8)
    mles[:, :, :8] = (
        rng.integers(0, 2**62, size=(num_mles, n), dtype=np.uint64)
        .view(np.uint8)
        .reshape(num_mles, n, 8)
    )
    product_table = [(1, degree) for _ in range(num_products)]
    product_terms = []
    for p in range(num_products):
        product_terms += [(p + j) % num_mles for j in range(degree)]

    def run():
        return sc.prove_sum(
            sc.ReferenceSumcheckTranscript(Transcript(b"bench"), sc.SCALAR25519_CODEC),
            mles, product_table, product_terms, n,
        )

    dt = _time(run, samples)

    # correctness gate: re-derive the claimed sum with an INDEPENDENT device
    # program (direct sum of mult * prod_j mle_j[i] over the cube) and run
    # the full verifier chain over the produced round polynomials
    polys, _ep = run()
    codec = sc.SCALAR25519_CODEC
    field = codec.field
    n_pad = 1 << max(sc.ceil_log2(n), 1)
    full = codec.mles_to_device(mles, n_pad)
    terms_struct = sc._structure(product_table, product_terms)

    @jax.jit
    def expected_sum(arr):
        total = field.zeros(())
        for (mult, _), terms in zip(product_table, terms_struct):
            p = arr[:, terms[0]]
            for t in terms[1:]:
                p = field.mul(p, arr[:, t])
            s = field.tree_sum(p, n_pad)  # (nlimbs,)
            total = field.add(total, field.mul(field.from_ints([mult])[:, 0], s))
        return field.from_mont(total)

    exp_std = np.asarray(expected_sum(full))
    exp_int = sum(int(exp_std[i]) << (16 * i) for i in range(field.nlimbs))
    ok, _ep2, _final = sc.verify_sumcheck_no_evaluation(
        exp_int,
        sc.ReferenceSumcheckTranscript(Transcript(b"bench"), codec),
        polys, degree, len(polys),
    )
    assert ok, "sumcheck: verifier chain rejected the proved polynomials"
    _emit(
        "sumcheck",
        {"n": n, "degree": degree, "num_products": num_products},
        dt,
        work=n * num_products,
        checked="verifier-chain",
    )


def bench_setup(log_ns, samples):
    """sxt_multiexp_handle_new cost: partition-table build wall time
    (VERDICT r1 weak #1 — the fused Pallas build kernel's 'done' metric is
    setup < 30 s at 2^20/w=8)."""
    from blitzar_tpu import generators as gen
    from blitzar_tpu.msm import fixed

    for log_n in log_ns:
        n = 1 << log_n
        points = gen.ristretto_generators(n)
        _sync(points.x[:, :1])
        times = []
        for _ in range(samples):
            t0 = time.time()
            handle = fixed.MultiexpHandle(points, window_width=8)
            _sync(handle.t_split[:1, :1, :1])
            times.append(time.time() - t0)
            del handle
        _emit("handle_setup", {"n": n, "window_width": 8}, min(times), work=n)


def bench_signed(log_n, samples):
    """Signed vs unsigned partition MSM at the same shape (VERDICT r1 #5:
    signed within 2.5x of unsigned)."""
    from blitzar_tpu import generators as gen
    from blitzar_tpu.msm import engine

    n = 1 << log_n
    points = gen.ristretto_generators(n)
    rng = np.random.default_rng(5)
    data_u = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    data_s = data_u.copy()

    def run_u():
        out = engine.msm(points, [data_u], [16], [False])
        _sync(out.x[:, :1])
        return out

    def run_s():
        out = engine.msm(points, [data_s], [16], [True])
        _sync(out.x[:, :1])
        return out

    dt_u = _time(run_u, samples)
    dt_s = _time(run_s, samples)

    # correctness gate via two's-complement linearity: interpreting the same
    # 16-byte rows signed vs unsigned differs by exactly 2^128 * G_neg where
    # G_neg = sum of generators at rows with the sign bit set, so
    # Q_unsigned = Q_signed + 2^128 * MSM(neg_indicator). The indicator MSM
    # reuses the same engine with a 17-byte exponent 2^128 * 1.
    import pinned

    neg = (data_s[:, -1] >= 0x80).astype(np.uint8)
    ind = np.zeros((n, 17), np.uint8)
    ind[:, 16] = neg
    q_u = run_u()
    q_s = run_s()
    q_ind = engine.msm(points, [ind], [17], [False])
    from blitzar_tpu.curves import edwards25519 as ed

    lhs = pinned.ristretto_digest(q_u)
    rhs = pinned.ristretto_digest(ed.add(q_s, q_ind))
    assert lhs == rhs, f"signed/unsigned linearity: {lhs} != {rhs}"
    _emit(
        "msm_unsigned", {"n": n, "element_nbytes": 16}, dt_u, work=n,
        checked="signed-linearity",
    )
    _emit(
        "msm_signed",
        {"n": n, "element_nbytes": 16, "vs_unsigned": round(dt_s / dt_u, 2)},
        dt_s,
        work=n,
        checked="signed-linearity",
    )


def bench_streaming(log_ns, samples):
    """Dense streaming (build-per-query) MSM — the 2^21/2^24 dynamic-MSM
    rows of BASELINE.md."""
    from blitzar_tpu import generators as gen
    from blitzar_tpu.msm import fixed

    import gc

    rng = np.random.default_rng(6)
    for log_n in log_ns:
        n = 1 << log_n
        points = gen.ristretto_generators(n)
        _sync(points.x[:, :1])
        scalars = rng.integers(0, 256, size=(1, n, 32), dtype=np.uint8)

        def run():
            out = fixed.streaming_multiexponentiation(points, scalars)
            _sync(out.x[:, :1])
            return out

        dt = _time(run, samples)
        # correctness gate: the same MSM through w=4 chunk tables must agree
        # (independent table builds + different bit-row decomposition; a
        # wrong carry in the bf16 table path cannot survive both widths)
        import pinned

        d8 = pinned.ristretto_digest(run())
        d4 = pinned.ristretto_digest(
            fixed.streaming_multiexponentiation(points, scalars, window_width=4)
        )
        assert d8 == d4, f"streaming 2^{log_n}: w=8 {d8} != w=4 {d4}"
        _emit("streaming_msm", {"n": n}, dt, work=n, checked="dual-window")
        # at 2^24 the point batch is 4 GB of HBM — free it (and any live
        # chunk slabs) before the next row or the rest of a combined run OOMs
        del points, scalars
        gc.collect()


def bench_memory(samples):
    """Host<->device transfer bandwidth (reference benchmark/memory/copy.m.cc:
    chunked pinned-buffer H2D copies). On the tunnel platform this measures
    the link; on a local chip, PCIe/DMA."""
    sizes_mb = [1, 8, 64]
    for mb in sizes_mb:
        nbytes = mb << 20
        host = np.random.default_rng(7).integers(
            0, 256, size=(nbytes,), dtype=np.uint8
        )

        def h2d():
            dev = jnp.asarray(host)
            _sync(dev[:1])

        dt = _time(h2d, samples)
        _emit("memory_h2d", {"mb": mb}, dt, work=nbytes)

        # jax caches an array's host copy after the first D2H — use a fresh
        # device array per timed sample so every call really crosses the link
        devs = iter([jnp.asarray(host) for _ in range(samples + 1)])

        def d2h():
            np.asarray(next(devs))

        dt = _time(d2h, samples)
        _emit("memory_d2h", {"mb": mb}, dt, work=nbytes)


def bench_primitives(samples):
    from blitzar_tpu import generators as gen
    from blitzar_tpu.curves import edwards25519 as ed
    from blitzar_tpu.fields import fp25519 as F

    n = 1 << 17
    g = gen.ristretto_generators(n)

    add_jit = jax.jit(lambda p, q: ed.add(p, q))
    _sync(add_jit(g, g).x[:, :1])

    def curve_add():
        _sync(add_jit(g, g).x[:, :1])

    dt = _time(curve_add, samples)
    _emit("primitives_curve_add", {"n": n}, dt, work=n)

    fmul = jax.jit(F.mul)
    _sync(fmul(g.x, g.y)[:, :1])

    def field_mul():
        _sync(fmul(g.x, g.y)[:, :1])

    dt = _time(field_mul, samples)
    _emit("primitives_field_mul", {"n": n}, dt, work=n)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--suite",
        default="pedersen",
        choices=[
            "pedersen", "fixed", "vlen", "ipa", "sumcheck", "primitives",
            "setup", "signed", "streaming", "memory", "baseline", "all",
        ],
    )
    parser.add_argument("--samples", type=int, default=3)
    parser.add_argument("--quick", action="store_true", help="small sizes only")
    args = parser.parse_args()

    ns = [10**4] if args.quick else [10**4, 10**5, 10**6]
    suites = (
        ["pedersen", "fixed", "vlen", "ipa", "sumcheck", "primitives"]
        if args.suite == "all"
        else [args.suite]
    )
    for suite in suites:
        if suite == "pedersen":
            bench_pedersen(ns, [1, 10], [1, 32], args.samples)
        elif suite == "fixed":
            bench_fixed(ns, ["ristretto255", "bls12-381", "bn254", "grumpkin"], args.samples)
        elif suite == "vlen":
            bench_vlen(ns[0], 10, args.samples)
        elif suite == "ipa":
            bench_ipa(ns, args.samples)
        elif suite == "sumcheck":
            bench_sumcheck(ns[0], 3, 2, args.samples)
        elif suite == "primitives":
            bench_primitives(args.samples)
        elif suite == "setup":
            bench_setup([16] if args.quick else [18, 20], args.samples)
        elif suite == "signed":
            bench_signed(14 if args.quick else 20, args.samples)
        elif suite == "streaming":
            bench_streaming([16] if args.quick else [21, 24], args.samples)
        elif suite == "memory":
            bench_memory(args.samples)
        elif suite == "baseline":
            # every BASELINE.md target row in one run (TPU hardware);
            # each row is guarded so one failure doesn't lose the rest
            import traceback

            def _guard(name, fn, *a):
                try:
                    fn(*a)
                except Exception as e:
                    # record the failure REASON in the emitted row (bare
                    # {"error": true} rows are useless to a reader)
                    print(
                        json.dumps(
                            {"benchmark": name, "error": True,
                             "message": f"{type(e).__name__}: {e}"[:300]}
                        ),
                        flush=True,
                    )
                    traceback.print_exc()
                finally:
                    # free cross-suite device residents (a 2^20 w=8 handle
                    # table is 6.4 GB of HBM; leaving it live OOMs the next
                    # suite's programs)
                    import gc

                    from blitzar_tpu.msm import engine as _eng

                    _eng._HANDLE_CACHE.clear()
                    _eng._SMALL_SEEN.clear()
                    gc.collect()

            _guard("handle_setup", bench_setup, [20], args.samples)
            _guard(
                "fixed",
                bench_fixed, [1 << 20], ["ristretto255", "bls12-381"], args.samples,
            )
            _guard("signed", bench_signed, 20, args.samples)
            _guard("streaming", bench_streaming, [21, 24], args.samples)
            _guard("ipa", bench_ipa, [1 << 20], 1)
            _guard("sumcheck", bench_sumcheck, 1 << 20, 3, 2, 1)
            _guard("vlen", bench_vlen, 1 << 20, 10, args.samples)
            _guard("primitives", bench_primitives, args.samples)


if __name__ == "__main__":
    main()
