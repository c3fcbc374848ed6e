#!/usr/bin/env python3
"""Benchmark entry — prints ONE JSON line with the headline metric.

Headline: the reference's largest custom dataset ds11 = (k=16, m=1024,
n=2^20) end-to-end fused 1-NN time on one TPU chip, against the reference's
best number for that shape: 17.292 ms for v8 on 4x V100 (README.md:291,
BASELINE.md). vs_baseline is the speedup factor (reference_ms / ours).

Details for every measured shape land in BENCH_DETAILS.json. Timing
protocol mirrors the reference's WarmUP/BenchMark statics (core.cu:
1192-1281) in spirit — absorb cold start first (the axon tunnel's first
device-to-host transfer, ~100 s, plus jit compiles), then measure steady
state — but the measurement itself is the AMPLIFIED IN-DISPATCH protocol
(harness/timing.py:amplified_ms): N dependent iterations of the pipeline
inside one lax.fori_loop jit, completion forced by a host readback of the
carry. Round 2 found that block_until_ready does not reliably block over
the axon tunnel (a 5.4 ms pipeline read 0.07 ms under pipelined-dispatch
timing), so per-dispatch wall timing can silently under-report; the
amplified protocol cannot — host wall time around a readback-completed
program is a hard upper bound, and tunnel latency amortizes to RTT/N.
`dispatch_ms` columns record the honest one-shot latency separately
(single dispatch + forced readback, which over this tunnel includes a
~25 ms round trip a local TPU host would not pay).
"""

import json
import sys
import time

import numpy as np

# (name, k, m, n, reference_ms, reference_hw) — all 8 TA datasets
# (reference README.md:274-276, v8 on 1x V100) plus the 4 custom large
# shapes (README.md:281-291, v8 on 4x V100). BASELINE.md has the table.
SHAPES = [
    ("ds0", 3, 1, 2, 0.929, "1x V100 (v8->v7)"),
    ("ds1", 3, 2, 8, 0.620, "1x V100 (v8->v7)"),
    ("ds2", 3, 1, 1024, 0.600, "1x V100 (v8->v7)"),
    ("ds3", 3, 1, 65536, 1.832, "1x V100 (v8->v7)"),
    ("ds4", 16, 1, 65536, 3.294, "1x V100 (v8->v7)"),
    ("ds5", 3, 1024, 1024, 0.403, "1x V100 (v8->v7)"),
    ("ds6", 3, 1024, 65536, 0.925, "1x V100 (v8->v7)"),
    ("ds7", 16, 1024, 65536, 2.689, "1x V100 (v7/v8)"),
    ("ds8", 3, 1, 1 << 24, 25.650, "4x V100 (v8)"),
    ("ds9", 16, 1, 1 << 24, 100.346, "4x V100 (v8)"),
    ("ds10", 3, 1024, 1 << 20, 9.971, "4x V100 (v8)"),
    ("ds11", 16, 1024, 1 << 20, 17.292, "4x V100 (v8)"),
]

HEADLINE = "ds11"

SHAPES_BY_NAME = [(s[0], s) for s in SHAPES]


def device_gate_vs_v2(q, r, idx, chunk_cap=1 << 20) -> tuple:
    """On-device differential correctness gate for shapes too large to read
    back (the tunnel's D2H runs ~30 MB/s): cross-check the fused answer
    against v2's independent streaming-scan path, applying the harness
    tolerance rule (reference main.cu:88-95 — index equality, else true
    sqrt distances within ±1e-3) entirely on device; only the error count
    crosses the tunnel."""
    import jax
    import jax.numpy as jnp

    from tpu_knn.kernels.twophase import _v2_argmin

    n = r.shape[0]
    # Wider chunks than v2's default: 16 scan steps instead of 256 keeps
    # the gate's compile+run cost small on the bench path.
    chunk = min(chunk_cap, n)
    assert n % chunk == 0, "bench shapes are power-of-two n"
    i2 = _v2_argmin(q, r, n, chunk)

    # q/r must be ARGUMENTS, not closure captures: a closed-over device
    # array is baked into the jaxpr as a constant, and XLA spent 10+ min
    # embedding the 1 GB reference array into the gate executable at ds9.
    @jax.jit
    def count_errors(q, r, idx, i2):
        def true_d(i):
            diff = q - jnp.take(r, i, axis=0)
            return jnp.sqrt(jnp.sum(diff * diff, axis=1))

        ok = (idx == i2) | (jnp.abs(true_d(idx) - true_d(i2)) <= 1e-3)
        return jnp.sum(~ok)

    errors = int(jax.device_get(count_errors(q, r, idx, i2)))
    return errors, int(q.shape[0])


def _make_pin():
    """Build ``pin(x)``: force ``x`` fully materialized in its default
    layout by routing it through a no-op Pallas probe kernel, returning a
    tiny (<=8 x <=128) f32 corner block to fold into a timing carry.

    Why this exists (review r3): a timing step must consume the stage
    under test in a way XLA cannot optimize away, and for a LAYOUT stage
    every jnp-level consumption fails — a corner read dead-code-eliminates
    the relayout entirely (measured 0.0001 ms at any n), and a checksum
    commutes through the transpose (reduce(transpose(x)) = reduce(x), so
    the transpose is never built). A custom call is the one fence XLA
    must respect: its operand cannot be sliced, DCE'd, or layout-elided —
    which is also exactly the boundary the real pipeline imposes, since
    the prep output feeds the Pallas candidates kernel
    (scripts/r11_probe_prep_dce.py)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    interpret = jax.default_backend() != "tpu"

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].astype(jnp.float32)

    def pin(x):
        r0 = min(8, x.shape[0])
        c0 = min(128, x.shape[1])
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((r0, c0), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((r0, c0), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((r0, c0), jnp.float32),
            interpret=interpret,
        )(x)

    return pin


def _consume(c, *outs):
    """Fold a full checksum of every output into the timing carry.

    CLAUDE.md "Timing-step DCE trap": a carry that reads only row 0 lets
    XLA slice every per-row stage AFTER the Pallas kernel (the exact-d2
    refinement's gathers, top-K finalization sorts) down to one row —
    review r3 caught the committed per-call/prepared/top-K rows doing
    exactly that. A jnp.sum over each output depends on every row; its
    own cost at (m, K) <= (1024, 128) is nanoseconds against the
    kernels measured."""
    import jax.numpy as jnp

    for o in outs:
        c = c + jnp.sum(o.astype(jnp.float32)) * 1e-9
    return c


def main():
    import jax
    import jax.numpy as jnp

    from tpu_knn.harness.checker import check_results
    from tpu_knn.harness.timing import amplified_ms, calibrated_amplified_ms
    from tpu_knn.kernels.fused import fused_knn

    pin = _make_pin()

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    # WarmUP (reference core.cu:1192-1229): absorb transfer-path and
    # compile cold start before any timing. The axon tunnel's first
    # device-to-host transfer has been observed anywhere from 30 s to
    # several minutes.
    print("# warmup: first device round-trip...", file=sys.stderr, flush=True)
    t0 = time.time()
    _ = jax.device_get(jnp.zeros((8, 128)))
    warm_s = time.time() - t0
    print(f"# warmup done in {warm_s:.1f}s", file=sys.stderr, flush=True)

    shapes = SHAPES if on_tpu else [("tiny", 8, 32, 4096, None, None)]
    # Dev knob: TPU_KNN_BENCH_ONLY=ds9,ds11 restricts the shape list (and
    # skips the extras) for quick iteration; the driver runs the full set.
    import os

    only = os.environ.get("TPU_KNN_BENCH_ONLY")
    extras = True
    if only:
        wanted = set(only.split(","))
        shapes = [s for s in shapes if s[0] in wanted]
        extras = False
    key = jax.random.PRNGKey(0)
    details = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "warmup_first_transfer_s": round(warm_s, 2),
        "rows": [],
    }

    headline_ms = None
    headline_base = None
    for shape_id, (name, k, m, n, base_ms, base_hw) in enumerate(shapes):
        # fold_in by position, not hash(name): str hash is randomized per
        # process, which would make bench data irreproducible run-to-run.
        kq = jax.random.fold_in(key, shape_id)
        q = jax.random.uniform(jax.random.fold_in(kq, 1), (m, k), jnp.float32)
        r = jax.random.uniform(jax.random.fold_in(kq, 2), (n, k), jnp.float32)
        q.block_until_ready()
        r.block_until_ready()
        print(f"# {name}: data ready, compiling...", file=sys.stderr, flush=True)

        t0 = time.time()
        idx, d2 = fused_knn(q, r)
        idx.block_until_ready()
        compile_s = time.time() - t0
        print(f"# {name}: compiled in {compile_s:.1f}s, timing...",
              file=sys.stderr, flush=True)

        # Per-call pipeline, amplified: q AND r are perturbed by i*1e-9.
        # PROTOCOL NOTE (r3, PERF_NOTES "Per-call prep transpose"): this
        # is an UPPER bound — where the pipeline still preps (m > 4: the
        # MXU path's pad+T) the r+eps copy does not fuse into the
        # transpose (~one extra reference copy); a carried-operand
        # protocol was tried and UNDER-measures instead (XLA pushes the
        # one-element update through the transpose and hoists the
        # relayout). For those rows the honest floor is the DERIVED
        # prep_ms + prepared-scan sum, annotated after the prepared
        # sections run. m <= 4 rows have NO prep since r4's zero-prep
        # AoS scan (smallm._build_aos_scan): the eps-add fuses into the
        # scan's single read pass and the row measures the true cost.
        def percall_step(i, c, q, r):
            eps = i.astype(jnp.float32) * 1e-9
            idx_a, d2_a = fused_knn(q + eps, r + eps)
            return _consume(c, d2_a, idx_a)

        ms, iters = calibrated_amplified_ms(percall_step, q, r)

        # The prep (AoS -> padded SoA relayout) alone: the output is
        # pinned through the Pallas probe fence (see _make_pin — any
        # jnp-level consumption either DCEs the relayout or commutes the
        # checksum through it), and the eps-add fuses into the read pass,
        # so this is the clean materialized-relayout cost.
        from tpu_knn.utils.shapes import round_up as _ru

        _kp = _ru(k, 8)

        @jax.jit
        def _prep(rr):
            return jnp.pad(rr, ((0, 0), (0, _kp - k))).T

        def prep_step(i, c, r):
            out = _prep(r + i.astype(jnp.float32) * 1e-9)
            # pin(): custom-call fence — a corner read is DCE'd and a
            # checksum commutes through the transpose (see _make_pin).
            return c + jnp.sum(pin(out))

        prep_ms, _pit = calibrated_amplified_ms(prep_step, r)

        # Cold-dispatch variant: one isolated dispatch with completion
        # forced by reading the (m,) result back — over the axon tunnel
        # this includes a ~25 ms host round trip that a local TPU host
        # would not pay; it bounds one-shot latency from above.
        dispatch_ms = None
        if m * n <= (1 << 26):
            dispatch_ms = float("inf")
            for _i in range(5):
                t0 = time.time()
                idx, d2 = fused_knn(q, r)
                np.asarray(idx)
                dispatch_ms = min(dispatch_ms, (time.time() - t0) * 1e3)

        row = {
            "name": name,
            "k": k, "m": m, "n": n,
            "ms": round(ms, 3),
            "prep_ms": round(prep_ms, 3),
            "timing": f"amplified x{iters}",
            "compile_s": round(compile_s, 2),
            "reference_ms": base_ms,
            "reference_hw": base_hw,
            "speedup_vs_reference": round(base_ms / ms, 2) if base_ms else None,
            "qps": round(m / (ms / 1e3)),
            # distance+argmin FLOPs (2*m*n*k for the matmul form)
            "tflops_effective": round(2 * m * n * k / (ms / 1e3) / 1e12, 3),
        }
        if dispatch_ms is not None:
            row["dispatch_ms"] = round(dispatch_ms, 3)
            if ms < 1.0:
                row["regime"] = ("device-rate; one-shot latency is "
                                 "dispatch-bound (see dispatch_ms)")

        # Correctness gate on the measured data, every row: host oracle
        # where readback is cheap (the tunnel's D2H runs ~30 MB/s), the
        # on-device v2 differential gate for the n=2^24 shapes.
        print(f"# {name}: correctness gate...", file=sys.stderr, flush=True)
        if n <= (1 << 20):
            qn = np.asarray(q)
            rn = np.asarray(r)
            try:
                from tpu_knn import native

                base_idx, _ = native.oracle(qn, rn)
            except Exception:
                from tpu_knn.oracle import oracle_knn

                base_idx = oracle_knn(qn, rn)
            errors, total = check_results(base_idx, np.asarray(idx), qn, rn)
        else:
            errors, total = device_gate_vs_v2(q, r, idx)
            row["gate"] = "on-device v2 differential"
        row["errors"] = f"{errors}/{total}"
        if errors:
            print(f"CORRECTNESS FAILURE on {name}: {errors}/{total}",
                  file=sys.stderr)
            sys.exit(1)
        details["rows"].append(row)
        print(f"# {name} ({k},{m},{n}): {ms:.3f} ms  "
              f"ref={base_ms} ({base_hw})  {row.get('errors', '')}",
              file=sys.stderr, flush=True)
        if name == HEADLINE:
            headline_ms = ms
            headline_base = base_ms

    # Serving mode: prepared index (layout paid once) on the headline shape.
    if on_tpu and extras:
        from tpu_knn.engine.index import NNIndex

        k, m, n = 16, 1024, 1 << 20
        kq = jax.random.fold_in(key, 100)
        q = jax.random.uniform(jax.random.fold_in(kq, 1), (m, k), jnp.float32)
        r = jax.random.uniform(jax.random.fold_in(kq, 2), (n, k), jnp.float32)
        t0 = time.time()
        index = NNIndex(r, strategy="fused")
        build_s = time.time() - t0
        run_prep, ops = index.pipeline(m)

        # Prepared serving: only q is perturbed per iteration — the
        # prepared operands ARE legitimately reused across calls; that is
        # the strategy's whole point.
        def prep_step(i, c, q, ops):
            eps = i.astype(jnp.float32) * 1e-9
            ia, da = run_prep(q + eps, *ops)
            return _consume(c, da, ia)

        ms, iters = calibrated_amplified_ms(prep_step, q, ops)
        ia_p, _da_p = run_prep(q, *ops)
        errs_p, tot_p = device_gate_vs_v2(q, r, ia_p)
        details["rows"].append({
            "name": "ds11_prepared_index",
            "k": k, "m": m, "n": n, "ms": round(ms, 3),
            "timing": f"amplified x{iters}",
            "prepare_s": round(build_s, 2),
            "qps": round(m / (ms / 1e3)),
            "errors": f"{errs_p}/{tot_p}",
            "gate": "on-device v2 differential",
            "note": "NNIndex(strategy=fused): SoA layout paid once",
        })
        if errs_p:
            print("CORRECTNESS FAILURE on ds11_prepared_index",
                  file=sys.stderr)
            sys.exit(1)
        print(f"# ds11 prepared-index query: {ms:.3f} ms "
              f"errors {errs_p}/{tot_p}", file=sys.stderr, flush=True)

        # Prepared serving at the m=1 bandwidth-bound shapes (ds8/ds9):
        # NNIndex routes m<=4 to the diff-form VPU kernel (smallm.py) off
        # the same prepared SoA operand; per-call numbers above pay the
        # one-time pad+transpose on every call.
        for sname, sk in (("ds8", 3), ("ds9", 16)):
            m1, n1 = 1, 1 << 24
            kq = jax.random.fold_in(key, 110 + sk)
            q1 = jax.random.uniform(jax.random.fold_in(kq, 1), (m1, sk),
                                    jnp.float32)
            r1 = jax.random.uniform(jax.random.fold_in(kq, 2), (n1, sk),
                                    jnp.float32)
            t0 = time.time()
            idx1 = NNIndex(r1, strategy="fused")
            build1_s = time.time() - t0
            run1, ops1 = idx1.pipeline(m1)

            def small_step(i, c, q, ops, run1=run1):
                eps = i.astype(jnp.float32) * 1e-9
                ia, da = run1(q + eps, *ops)
                return _consume(c, da, ia)

            ms1, iters1 = calibrated_amplified_ms(small_step, q1, ops1)
            ia1, _da1 = run1(q1, *ops1)
            errs1, tot1 = device_gate_vs_v2(q1, r1, ia1)
            details["rows"].append({
                "name": f"{sname}_prepared_index",
                "k": sk, "m": m1, "n": n1, "ms": round(ms1, 3),
                "timing": f"amplified x{iters1}",
                "prepare_s": round(build1_s, 2),
                "reference_ms": dict(SHAPES_BY_NAME)[sname][4],
                "speedup_vs_reference": round(
                    dict(SHAPES_BY_NAME)[sname][4] / ms1, 2),
                "errors": f"{errs1}/{tot1}",
                "gate": "on-device v2 differential",
                "note": "NNIndex m=1 serving: diff-form VPU kernel on the "
                        "prepared SoA operand (kernels/smallm.py)",
            })
            if errs1:
                print(f"CORRECTNESS FAILURE on {sname}_prepared_index",
                      file=sys.stderr)
                sys.exit(1)
            print(f"# {sname} prepared-index (m=1): {ms1:.3f} ms "
                  f"errors {errs1}/{tot1}", file=sys.stderr, flush=True)

        # Quantized storage (store="bf16", round 3): same ds9 shape, half
        # the index HBM, ~2x the read-bound m=1 scan. Contract is
        # EXACT-over-stored-points, so the gate runs v2 on the f32 upcast
        # of the QUANTIZED reference (docs/SERVING.md "Quantized storage").
        t0 = time.time()
        ixb = NNIndex(r1, store="bf16")
        buildb_s = time.time() - t0
        runb, opsb = ixb.pipeline(1)

        def bf16_step(i, c, q, ops):
            eps = i.astype(jnp.float32) * 1e-9
            ia, da = runb(q + eps, *ops)
            return _consume(c, da, ia)

        msb, itersb = calibrated_amplified_ms(bf16_step, q1, opsb)
        iab, _dab = runb(q1, *opsb)
        r1q = ixb.ref_dev.astype(jnp.float32)
        errsb, totb = device_gate_vs_v2(q1, r1q, iab)
        f32_row = next(r_ for r_ in details["rows"]
                       if r_["name"] == "ds9_prepared_index")
        details["rows"].append({
            "name": "ds9_prepared_index_bf16",
            "k": 16, "m": 1, "n": 1 << 24, "ms": round(msb, 3),
            "timing": f"amplified x{itersb}",
            "prepare_s": round(buildb_s, 2),
            "f32_ms": f32_row["ms"],
            "index_hbm_mb": round(
                sum(int(np.prod(o.shape)) * o.dtype.itemsize
                    for o in (ixb.ref_dev, *opsb[0])) / 2**20),
            "errors": f"{errsb}/{totb}",
            "gate": "on-device v2 differential over the QUANTIZED points",
            "note": "NNIndex(store='bf16'): exact-over-stored-points, "
                    "half the index HBM (scripts/r8_probe_bf16.py)",
        })
        if errsb:
            print("CORRECTNESS FAILURE on ds9_prepared_index_bf16",
                  file=sys.stderr)
            sys.exit(1)
        print(f"# ds9 prepared-index bf16 (m=1): {msb:.3f} ms "
              f"errors {errsb}/{totb}", file=sys.stderr, flush=True)

        # bf16 m=1 top-K: the AoS cell engine over the quantized resident
        # array; the f32 run over the upcast quantized points computes
        # IDENTICAL f32 arithmetic, so the gate is strict index equality.
        from tpu_knn.kernels.topk import _build_aos_topk

        tkb = _build_aos_topk(1, 1 << 24, 16, 16)
        ib_q, db_q = tkb(q1, ixb.ref_dev)
        if_q, df_q = tkb(q1, r1q)
        errsk = int(jax.device_get(jnp.sum(ib_q != if_q)))

        def bf16_tk_step(i, c, q, rdev):
            ia, da = tkb(q + i.astype(jnp.float32) * 1e-9, rdev)
            return _consume(c, da, ia)

        msk, itersk = calibrated_amplified_ms(bf16_tk_step, q1, ixb.ref_dev)
        details["rows"].append({
            "name": "topk_serving_1x2^24_k16_K16_bf16",
            "k": 16, "m": 1, "n": 1 << 24, "neighbors": 16,
            "ms": round(msk, 3),
            "timing": f"amplified x{itersk}",
            "errors": f"{errsk}/16",
            "gate": "strict equality vs the f32 engine on the upcast "
                    "quantized points",
            "note": "m=1 AoS cell top-K off the bf16-stored index",
        })
        if errsk:
            print("CORRECTNESS FAILURE on topk_serving_1x2^24_k16_K16_bf16",
                  file=sys.stderr)
            sys.exit(1)
        print(f"# topk m=1 K=16 bf16: {msk:.3f} ms errors {errsk}/16",
              file=sys.stderr, flush=True)
        del ixb, runb, opsb, iab, r1q, tkb, ib_q, db_q, if_q, df_q

        # Quantized storage, int8 tier (store="int8", round 3): the
        # (n, k) int8 GRID is the only resident state — 4x less HBM than
        # f32 — and queries run the exact engines in grid space
        # (engine/index.py:_init_int8). Gate: v2 differential in grid
        # space (grid-scale distances make the ±1e-3 rule stricter).
        t0 = time.time()
        ixq = NNIndex(r1, store="int8")
        buildq_s = time.time() - t0
        runq, opsq = ixq.pipeline(1)

        def int8_step(i, c, q, g):
            eps = i.astype(jnp.float32) * 1e-9
            ia, da = runq(q + eps, g)
            return _consume(c, da, ia)

        msq, itersq = calibrated_amplified_ms(int8_step, q1, *opsq)
        iaq, _daq = runq(q1, *opsq)
        qg = ixq._i8_q(q1)
        grid32 = ixq.ref_dev.astype(jnp.float32)
        errsq, totq = device_gate_vs_v2(qg, grid32, iaq)
        details["rows"].append({
            "name": "ds9_prepared_index_int8",
            "k": 16, "m": 1, "n": 1 << 24, "ms": round(msq, 3),
            "timing": f"amplified x{itersq}",
            "prepare_s": round(buildq_s, 2),
            "f32_ms": f32_row["ms"],
            "index_hbm_mb": round(
                int(np.prod(ixq.ref_dev.shape)) / 2**20),
            "errors": f"{errsq}/{totq}",
            "gate": "on-device v2 differential in grid space",
            "note": "NNIndex(store='int8'): exact grid-space queries, "
                    "4x less index HBM (scripts/r10_probe_int8*.py)",
        })
        if errsq:
            print("CORRECTNESS FAILURE on ds9_prepared_index_int8",
                  file=sys.stderr)
            sys.exit(1)
        print(f"# ds9 prepared-index int8 (m=1): {msq:.3f} ms "
              f"errors {errsq}/{totq}", file=sys.stderr, flush=True)

        # int8 m=1 top-K: the AoS cell engine straight off the int8 grid;
        # the f32 run on the upcast grid computes identical f32
        # arithmetic, so the gate is strict index equality.
        from tpu_knn.kernels.topk import _build_aos_topk as _aos_tk

        tkq = _aos_tk(1, 1 << 24, 16, 16)
        iq_t, _ = tkq(qg, ixq.ref_dev)
        if_t, _ = tkq(qg, grid32)
        errstk = int(jax.device_get(jnp.sum(iq_t != if_t)))

        def int8_tk_step(i, c, q, g):
            ia, da = tkq(q + i.astype(jnp.float32) * 1e-9, g)
            return _consume(c, da, ia)

        mstk, iterstk = calibrated_amplified_ms(int8_tk_step, qg,
                                                ixq.ref_dev)
        details["rows"].append({
            "name": "topk_serving_1x2^24_k16_K16_int8",
            "k": 16, "m": 1, "n": 1 << 24, "neighbors": 16,
            "ms": round(mstk, 3),
            "timing": f"amplified x{iterstk}",
            "errors": f"{errstk}/16",
            "gate": "strict equality vs the f32 engine on the upcast "
                    "grid",
            "note": "m=1 AoS cell top-K off the int8 grid",
        })
        if errstk:
            print("CORRECTNESS FAILURE on topk_serving_1x2^24_k16_K16_int8",
                  file=sys.stderr)
            sys.exit(1)
        print(f"# topk m=1 K=16 int8: {mstk:.3f} ms errors {errstk}/16",
              file=sys.stderr, flush=True)
        del ixq, runq, opsq, iaq, qg, grid32, tkq, iq_t, if_t

        # Sharded int8 tier on the real chip (1-device mesh): the
        # shard_map wrapper is measured free (scripts/
        # r11_sharded_overhead.py), so this row both gates the mesh
        # pipeline's Mosaic compile on hardware and records the
        # capacity tier's serving latency through the sharded route.
        from tpu_knn.distributed.sharded import default_mesh

        t0 = time.time()
        ixq = NNIndex(r1, store="int8", strategy="sharded",
                      mesh=default_mesh(dp=1, sp=1))
        buildqs_s = time.time() - t0
        qg1 = ixq._i8_q(q1)
        from tpu_knn.distributed.sharded import _build_sharded_int8

        run_i8s = _build_sharded_int8(1, ixq.n, ixq.k, ixq._n_local,
                                      ixq.mesh,
                                      cutoff_scale=1.0 / ixq._i8_s2)

        def i8s_step(i, c, qg, g):
            ia, da = run_i8s(qg + i.astype(jnp.float32) * 1e-9, g)
            return _consume(c, da, ia)

        ms8s, iters8s = calibrated_amplified_ms(i8s_step, qg1,
                                                ixq.r_sharded)
        ia8s, _ = run_i8s(qg1, ixq.r_sharded)
        # Upcast on device (a host readback of the 256 MB grid would
        # cost ~8 s over the tunnel); n == n_pad at 2^24 so no slice.
        grid32s = jax.jit(
            lambda g: g[: 1 << 24].astype(jnp.float32))(ixq.r_sharded)
        errs8s, tot8s = device_gate_vs_v2(qg1, grid32s, ia8s)
        details["rows"].append({
            "name": "ds9_sharded_index_int8_sp1",
            "k": 16, "m": 1, "n": 1 << 24, "ms": round(ms8s, 3),
            "timing": f"amplified x{iters8s}",
            "prepare_s": round(buildqs_s, 2),
            "errors": f"{errs8s}/{tot8s}",
            "gate": "on-device v2 differential in grid space",
            "note": "NNIndex(store='int8', strategy='sharded') on a "
                    "1-device mesh: the capacity-tier mesh pipeline "
                    "(masked AoS scan in shard_map) on real hardware",
        })
        if errs8s:
            print("CORRECTNESS FAILURE on ds9_sharded_index_int8_sp1",
                  file=sys.stderr)
            sys.exit(1)
        print(f"# ds9 sharded-int8 sp=1 (m=1): {ms8s:.3f} ms "
              f"errors {errs8s}/{tot8s}", file=sys.stderr, flush=True)
        del ixq, qg1, run_i8s, ia8s, grid32s

        # v11 projection index, small-batch lookup niche: raw runner
        # timing (the certification sync is a tunnel artifact; see
        # kernels/projection.py docstring).
        from tpu_knn.kernels.projection import (
            _build_pallas_window_query, auto_window, build_projection_index,
        )

        kq = jax.random.fold_in(key, 102)
        rv = jax.random.uniform(jax.random.fold_in(kq, 2), (1 << 24, 3),
                                jnp.float32)
        qv = jax.random.uniform(jax.random.fold_in(kq, 1), (16, 3),
                                jnp.float32)
        t0 = time.time()
        pre = build_projection_index(rv)
        jax.block_until_ready(pre)
        v11_build_s = time.time() - t0
        runner = _build_pallas_window_query(16, 1 << 24, 3,
                                            auto_window(3, 1 << 24))
        out = runner(qv, *pre)
        certified = int(jax.device_get(out[2]).sum())

        def v11_step(i, c, qv, pre):
            eps = i.astype(jnp.float32) * 1e-9
            ia, da, ok = runner(qv + eps, *pre)
            return _consume(c, da, ia, ok)

        v11_ms, v11_iters = calibrated_amplified_ms(v11_step, qv, pre)
        # Gate: certified rows are PROVABLY exact — check them against
        # the independent v2 path (uncertified rows fall back to a full
        # scan in production; the auto row below gates that pipeline).
        errs_w = None
        if certified == 16:
            errs_w, _totw = device_gate_vs_v2(qv, rv, out[0])
            if errs_w:
                print("CORRECTNESS FAILURE on v11_window_16x1x2^24_k3",
                      file=sys.stderr)
                sys.exit(1)
        details["rows"].append({
            "name": "v11_window_16x1x2^24_k3",
            **({"errors": f"{errs_w}/16",
                "gate": "on-device v2 differential"}
               if errs_w is not None else {}),
            "ms": round(v11_ms, 3),
            "timing": f"amplified x{v11_iters}",
            "build_s": round(v11_build_s, 2),
            "certified": f"{certified}/16",
            "note": "projection window index, raw runner — reads dense "
                    "windows instead of the whole set (a full prepared "
                    "scan at this n is ~0.8-3 ms)",
        })
        print(f"# v11 window (3,16,2^24): {v11_ms:.3f} ms "
              f"(certified {certified}/16)", file=sys.stderr, flush=True)

        # WARM rebuild (VERDICT r3 item 6): the serving cost of
        # refreshing the projection index once the process has paid
        # compile/first-touch — the number the mutable-serving story
        # depends on (the cold build_s above includes ~35 s of process
        # one-time cost). Forced completion via small strided readbacks
        # of every component (block_until_ready alone does not force
        # completion through the tunnel — CLAUDE.md).
        rebuild_ts = []
        for rep in range(3):
            t0 = time.time()
            pre_r = build_projection_index(rv + jnp.float32(rep + 1) * 1e-9)
            for part in jax.tree_util.tree_leaves(pre_r):
                np.asarray(jax.device_get(
                    part if np.ndim(part) == 0 or part.size <= 16
                    else part.reshape(-1)[:: max(1, part.size // 16)]))
            rebuild_ts.append(time.time() - t0)
        v11_warm_s = sorted(rebuild_ts)[1]
        details["rows"].append({
            "name": "v11_warm_rebuild_2^24_k3",
            "ms": round(v11_warm_s * 1e3, 1),
            "timing": "median of 3 warm rebuilds, host-synced readback",
            "note": "projection index rebuild after compile/first-touch "
                    "(cold first build: see v11_window build_s)",
        })
        print(f"# v11 warm rebuild (2^24, k=3): {v11_warm_s * 1e3:.0f} ms",
              file=sys.stderr, flush=True)

        # Production dispatch path: NNIndex auto-strategy routes this
        # niche batch to the projection pipeline (cert-rate probe at
        # build, per-batch cost model, on-device lax.cond fallback — no
        # host certification sync). The honest end-to-end serving number.
        index = NNIndex(rv, strategy="auto")
        routed = None
        if index.proj_index is not None:
            ia, da = index.query(qv)
            routed = index.last_strategy
            from tpu_knn.kernels.projection import _build_projection_pipeline

            mb = index._m_bucket(16)
            qb = jnp.concatenate(
                [qv, jnp.broadcast_to(qv[-1:], (mb - 16, 3))])
            run_auto = _build_projection_pipeline(
                mb, 1 << 24, 3, auto_window(3, 1 << 24))

            def auto_step(i, c, qb, ref_dev, proj):
                eps = i.astype(jnp.float32) * 1e-9
                ja, ea, ok = run_auto(qb + eps, ref_dev, *proj)
                return _consume(c, ea, ja, ok)

            auto_ms, auto_iters = calibrated_amplified_ms(
                auto_step, qb, index.ref_dev, index.proj_index)
            # On-device differential gate (v2 independent path) — reading
            # back the 2^24-row reference costs ~7 s over the tunnel.
            errors16, total16 = device_gate_vs_v2(qv, rv, ia)
            details["rows"].append({
                "name": "v11_auto_index_16x2^24_k3",
                "ms": round(auto_ms, 3),
                "timing": f"amplified x{auto_iters} (m padded to bucket 16)",
                "routed": routed,
                "cert_rate_probe": round(index.cert_rate, 3),
                "errors": f"{errors16}/{total16}",
                "note": "NNIndex(strategy=auto).query — production "
                        "dispatch reaches v11 in its niche",
            })
            print(f"# v11 auto-index (3,16,2^24): {auto_ms:.3f} ms "
                  f"routed={routed} errors {errors16}/{total16}",
                  file=sys.stderr, flush=True)

        # Spatial pruning at the reference v10's BATCH niche
        # (3, 1024, 65536) — the committed negative (VERDICT r4 item
        # 6): a certified window at k=3, n=65536 covers ~10% of the
        # set PER QUERY (auto_window thins as n^(1/k)), so m=1024
        # windows read ~100x one shared full scan; this row measures
        # the forced window route's LOSS against the fused scan's ds6
        # row (0.216 ms, itself 2x the reference v10's 0.433 ms win).
        # The cost model (projection_wins) routes the shape to fused —
        # tests/test_projection.py pins it.
        if extras:
          try:
            ksb, msb, nsb = 3, 1024, 65536
            qsb = jax.random.uniform(jax.random.fold_in(key, 77),
                                     (msb, ksb), jnp.float32)
            rsb = jax.random.uniform(jax.random.fold_in(key, 78),
                                     (nsb, ksb), jnp.float32)
            from tpu_knn.kernels.projection import (
                _build_projection_pipeline as _bpp,
                auto_window as _aw, build_projection_index as _bpi,
            )

            proj_sb = jax.block_until_ready(_bpi(rsb))
            run_sb = _bpp(msb, nsb, ksb, _aw(ksb, nsb))

            def sb_step(i, c, q, rsb, proj):
                eps = i.astype(jnp.float32) * 1e-9
                ia, da, ok = run_sb(q + eps, rsb, *proj)
                return _consume(c, ia, da, ok.astype(jnp.float32))

            sb_ms, sb_it = calibrated_amplified_ms(sb_step, qsb, rsb,
                                                   proj_sb,
                                                   max_iters=64)
            ia_sb, _d, _ok = run_sb(qsb, rsb, *proj_sb)
            errs_sb, tot_sb = device_gate_vs_v2(qsb, rsb, ia_sb,
                                                chunk_cap=1 << 16)
            details["rows"].append({
                "name": "spatial_batch_3x1024x65536_forced_v11",
                "ms": round(sb_ms, 3),
                "timing": f"amplified x{sb_it}",
                "errors": f"{errs_sb}/{tot_sb}",
                "gate": "on-device v2 differential",
                "note": "FORCED projection windows at batch m=1024 — "
                        "the committed negative: the cost model routes "
                        "this shape to the fused scan (ds6 row, ~0.216 "
                        "ms); window reads are ~100x one shared scan",
            })
            if errs_sb:
                print("CORRECTNESS FAILURE on spatial_batch negative",
                      file=sys.stderr)
                sys.exit(1)
            print(f"# spatial batch negative (3,1024,65536): forced "
                  f"v11 {sb_ms:.3f} ms vs fused ds6, errors "
                  f"{errs_sb}/{tot_sb}", file=sys.stderr, flush=True)
            del qsb, rsb, proj_sb, run_sb
          except Exception as e:  # noqa: BLE001
            # A forced out-of-niche geometry may not even compile at
            # m=1024 windows — itself a valid form of the committed
            # negative; never let it kill the gated rows.
            details["rows"].append({
                "name": "spatial_batch_3x1024x65536_forced_v11",
                "failed": f"{type(e).__name__}: {str(e)[:200]}",
                "note": "FORCED projection windows at batch m=1024 "
                        "did not run — the committed negative stands "
                        "on the cost model (window reads ~100x one "
                        "shared scan); the fused ds6 row serves the "
                        "shape",
            })
            print(f"# spatial batch negative: forced v11 failed "
                  f"({type(e).__name__}) — negative stands on the "
                  "cost model", file=sys.stderr, flush=True)

        # KD-tree build/query split (reference README.md:334-343).
        kq = jax.random.fold_in(key, 101)
        rk = np.asarray(jax.random.uniform(jax.random.fold_in(kq, 2),
                                           (65536, 3), jnp.float32))
        qk = np.asarray(jax.random.uniform(jax.random.fold_in(kq, 1),
                                           (1024, 3), jnp.float32))
        # Host-side timings on a shared-CPU machine are noisy (spikes of
        # 10x have been observed); medians over repeats are reported so
        # the row reflects the engine, not a scheduler hiccup.
        build_times = []
        for _i in range(5):
            t0 = time.time()
            tree_index = NNIndex(rk, strategy="kdtree")
            build_times.append((time.time() - t0) * 1e3)
        kd_build_ms = sorted(build_times)[2]
        tree_index.query(qk)  # warm (compile/load)
        query_times = []
        for _i in range(5):
            t0 = time.time()
            ik, _dk = tree_index.query(qk)
            query_times.append((time.time() - t0) * 1e3)
        jax.block_until_ready(ik)
        kd_query_ms = sorted(query_times)[2]
        try:
            from tpu_knn import native as _nat

            kd_base, _ = _nat.oracle(qk, rk)
        except Exception:
            from tpu_knn.oracle import oracle_knn as _ok

            kd_base = _ok(qk, rk)
        kd_errs, kd_tot = check_results(kd_base, np.asarray(ik), qk, rk)
        details["rows"].append({
            "name": "kdtree_3x1024x65536",
            "build_ms": round(kd_build_ms, 2),
            "query_ms": round(kd_query_ms, 3),
            "timing": "median of 5 (host-side, shared CPU)",
            "backend": "native kdt2 (leaf-bucketed serving tree)",
            "errors": f"{kd_errs}/{kd_tot}",
            "gate": "host oracle",
            "reference": "v9 build 18.7ms query 1.07ms; v10 query 0.43ms "
                         "(README.md:334-343)",
        })
        if kd_errs:
            print("CORRECTNESS FAILURE on kdtree_3x1024x65536",
                  file=sys.stderr)
            sys.exit(1)
        print(f"# kdtree (3,1024,65536): build {kd_build_ms:.1f} ms, "
              f"query {kd_query_ms:.2f} ms", file=sys.stderr, flush=True)

        # v9 reference-format tree (implicit-heap build + native OpenMP
        # query): the VERSION_BENCH spatial table's v9 row is GENERATED
        # from this artifact row (scripts/render_report.py
        # regen_version_bench — VERDICT r4 item 5: one committed number
        # per measurement), same median-of-5 protocol as the kdt2 row.
        from tpu_knn.kdtree.build import build_kdtree as _build_kd

        v9_build = []
        for _i in range(5):
            t0 = time.time()
            v9_tree = _build_kd(rk)
            v9_build.append((time.time() - t0) * 1e3)
        v9_build_ms = sorted(v9_build)[2]
        from tpu_knn import native as _nat9

        iq, _dq = _nat9.kdtree_query(qk, rk, v9_tree.p, v9_tree.dim)
        v9_q = []
        for _i in range(5):
            t0 = time.time()
            iq, _dq = _nat9.kdtree_query(qk, rk, v9_tree.p, v9_tree.dim)
            v9_q.append((time.time() - t0) * 1e3)
        v9_query_ms = sorted(v9_q)[2]
        v9_errs, v9_tot = check_results(kd_base, np.asarray(iq), qk, rk)
        details["rows"].append({
            "name": "v9_reference_tree_3x1024x65536",
            "build_ms": round(v9_build_ms, 2),
            "query_ms": round(v9_query_ms, 3),
            "timing": "median of 5 (host-side, shared CPU)",
            "backend": "reference-format implicit-heap tree + native "
                       "OpenMP query",
            "errors": f"{v9_errs}/{v9_tot}",
            "gate": "host oracle",
            "reference": "v9 build 18.7ms query 1.07ms (README.md:334-343)",
        })
        if v9_errs:
            print("CORRECTNESS FAILURE on v9_reference_tree_3x1024x65536",
                  file=sys.stderr)
            sys.exit(1)
        print(f"# v9 reference tree (3,1024,65536): build "
              f"{v9_build_ms:.1f} ms, query {v9_query_ms:.2f} ms",
              file=sys.stderr, flush=True)

        # v10 device traversal: committed capability-demo row (VERDICT
        # round 1 item 4). Divergent per-query tree descent is anti-TPU;
        # this row is the evidence for why dispatch and NNIndex never
        # select it (docs/PARITY.md "v10 decision").
        from tpu_knn.kdtree.build import build_kdtree
        from tpu_knn.kdtree.traversal import DeviceKDTree

        from tpu_knn.kdtree.traversal import _batched_traverse

        dev_tree = DeviceKDTree(build_kdtree(rk))
        qd = jnp.asarray(qk)
        iv, dv = dev_tree.query(qd)
        tree_ops = (dev_tree.ref, dev_tree.p, dev_tree.dim,
                    dev_tree.split_val)

        def v10_step(i, c, qd, tree_ops):
            eps = i.astype(jnp.float32) * 1e-9
            ia, da = _batched_traverse(qd + eps, *tree_ops, dev_tree.cap)
            return _consume(c, da, ia)

        v10_ms = amplified_ms(v10_step, qd, tree_ops, iters=2, reps=1)
        errs_v10 = int(np.sum(np.asarray(iv) != np.asarray(ik)))
        details["rows"].append({
            "name": "v10_device_traversal_3x1024x65536",
            "query_ms": round(v10_ms, 3),
            "timing": "amplified x2",
            "errors_vs_native_kdtree": f"{errs_v10}/1024",
            "note": "capability demo only — never selected by dispatch "
                    "(divergent traversal is anti-TPU; v11 is the "
                    "TPU-native spatial index)",
            "reference": "v10 query 0.433ms on 1x V100 (README.md:338-343)",
        })
        print(f"# v10 device traversal (3,1024,65536): {v10_ms:.1f} ms "
              f"({errs_v10}/1024 vs native kdtree)", file=sys.stderr,
              flush=True)

        # Exact top-K serving rows (kernels/topk.py): the sweep engine in
        # its auto-selected niche (small batch, one reference read) and
        # the K-pass banded engine at batch scale. Gate: the two engines
        # are independent implementations selecting by the same rule —
        # each row's answer is diffed on device against the OTHER engine.
        # Free the previous sections' device residents first: the two
        # prepared m=1 indexes alone hold ~3 GB of 2^24-point operands,
        # and the n=2^24 top-K row needs ~3 GB of its own (observed HBM
        # ResourceExhausted without this).
        del index, run_prep, ops, q1, r1, idx1, ops1, ia1
        del rv, qv, pre, runner, out
        del rk, qk, tree_index, dev_tree, qd, iv, dv, tree_ops, ik
        from tpu_knn.kernels.fused import auto_precision
        from tpu_knn.kernels.topk import _build_topk, _sweep_tiles
        from tpu_knn.kernels.tuning import pick_tiles
        from tpu_knn.utils.shapes import round_up

        def topk_runner(m_t, n_t, k_t, kk, method, r_t):
            """(run(q, r_op, r_t), r_op) — operands passed as jit ARGS,
            not closure constants (see _amplified_runner's 413 note)."""
            prec = auto_precision(k_t, n_t)
            if method == "aos":
                # Zero-prep per-call engine: no SoA operand at all.
                from tpu_knn.kernels.topk import _build_topk_percall

                run = _build_topk_percall(m_t, n_t, k_t, kk, prec, "aos")
                return (lambda qq, r_op, r_t: run(qq, r_t)), jnp.zeros(
                    (1, 1), jnp.float32)
            tile_n = (_sweep_tiles(k_t, m_t, n_t, kk, prec)[1]
                      if method == "sweep"
                      else pick_tiles(k_t, m_t, n_t)[1])
            n_ops = round_up(n_t, tile_n)
            run = _build_topk(m_t, n_t, k_t, kk, n_ops, prec, method)
            k_pad = round_up(k_t, 8)
            r_op = jnp.pad(r_t, ((0, n_ops - n_t), (0, k_pad - k_t))).T
            return (lambda qq, r_op, r_t: run(qq, (r_op,), r_t)), r_op

        kq = jax.random.fold_in(key, 120)
        for name, m_t, n_t, k_t, kk, method, other in (
                # m=1 serving: the bound-seeded two-pass (near-K-independent)
                ("topk_serving_1x2^24_k16_K16_bounded", 1, 1 << 24, 16, 16,
                 "sweep", "passes"),
                ("topk_serving_8x2^20_k16_K8_sweep", 8, 1 << 20, 16, 8,
                 "sweep", "passes"),
                # batch regime: the round-3 extraction engine (one
                # bounded scan + moment extraction; VERDICT r2 item 1)
                ("topk_batch_1024x2^20_k16_K8_seeded", 1024, 1 << 20, 16, 8,
                 "seeded", "passes"),
                ("topk_batch_1024x2^20_k16_K16_seeded", 1024, 1 << 20, 16,
                 16, "seeded", "passes"),
                # K > 16: the cubic (8-field) moment recovery
                ("topk_batch_1024x2^20_k16_K32_seeded", 1024, 1 << 20, 16,
                 32, "seeded", "passes"),
                # K > 32: 128-lane cells + 4-way part-split compaction
                ("topk_batch_1024x2^20_k16_K64_seeded", 1024, 1 << 20, 16,
                 64, "seeded", "passes"),
                # K > 64: half-open score-band rounds (~2 reads per 64
                # results; the passes twin here is 358 ms)
                ("topk_batch_1024x2^20_k16_K128_rounds", 1024, 1 << 20,
                 16, 128, "seeded", "passes"),
                # per-call m=1: the zero-prep AoS cell engine (no SoA
                # operand; the serving row above amortizes a prepared
                # one — this row is the cold-operand cost)
                ("topk_percall_1x2^24_k16_K16_aos", 1, 1 << 24, 16, 16,
                 "aos", "sweep")):
            r_t = jax.random.uniform(jax.random.fold_in(kq, 2 + k_t * n_t % 97),
                                     (n_t, k_t), jnp.float32)
            q_t = jax.random.uniform(jax.random.fold_in(kq, m_t), (m_t, k_t),
                                     jnp.float32)
            mine, my_op = topk_runner(m_t, n_t, k_t, kk, method, r_t)
            twin, tw_op = topk_runner(m_t, n_t, k_t, kk, other, r_t)
            ti, td = mine(q_t, my_op, r_t)
            oi, od = twin(q_t, tw_op, r_t)
            if "seeded" in (method, other) or "aos" in (method, other):
                # The extraction/aos engines select by EXACT d2 over a
                # certified superset; score-selected engines by approx
                # score — index disagreements are errors only when the
                # exact distances differ beyond f32 reduction noise.
                errs_t = int(jax.device_get(jnp.sum(
                    (ti != oi) & (jnp.abs(td - od)
                                  > 1e-5 * jnp.maximum(td, 1.0)))))
            else:
                # sweep vs passes: both lex-(score, index) selectors —
                # strict index equality is the achievable invariant;
                # keep it (review r3: the relaxed gate must not mask
                # tie-rule regressions in score-selected engines).
                errs_t = int(jax.device_get(jnp.sum(ti != oi)))
            total_t = m_t * kk

            def tk_step(i, c, q_t, my_op, r_t, mine=mine):
                ia, da = mine(q_t + i.astype(jnp.float32) * 1e-9, my_op, r_t)
                return _consume(c, da, ia)

            tk_ms, tk_iters = calibrated_amplified_ms(tk_step, q_t, my_op,
                                                      r_t)
            details["rows"].append({
                "name": name,
                "k": k_t, "m": m_t, "n": n_t, "neighbors": kk,
                "ms": round(tk_ms, 3),
                "timing": f"amplified x{tk_iters}",
                "errors": f"{errs_t}/{total_t}",
                "gate": f"on-device differential vs the {other} engine",
                "note": "exact top-K (serving extension beyond the "
                        "reference's 1-NN contract)",
            })
            if errs_t:
                print(f"CORRECTNESS FAILURE on {name}: {errs_t}/{total_t}",
                      file=sys.stderr)
                sys.exit(1)
            print(f"# {name}: {tk_ms:.3f} ms errors {errs_t}/{total_t}",
                  file=sys.stderr, flush=True)

    # ---- Batch quantized serving (VERDICT r3 item 5) + embedding-scale
    # (item 3): m=1024 rows for every store, and the wide-k regime a
    # modern vector service actually runs. Steady-state eager top-K is
    # measured host-synced AFTER a real warm phase: the first ~12
    # dispatches after an index build pay a ~2 s first-touch transient
    # on the dev tunnel (scripts/r19_serving_rows.py) that amplified
    # protocols never see.
    if on_tpu:
        import time as _time

        from tpu_knn.engine.index import NNIndex as _NNIdx

        def steady_query_ms(ix, qb, kk, warm=16, reps=20):
            """Repeat until converged: the dev tunnel's per-dispatch
            transient after an index build can outlast any fixed warm
            count (measured 67.9 ms/call with warm=16 where steady state
            is 6.8 — the first-measured store eats it), so re-measure
            until a pass stops improving on the last by >30% (<= 4
            passes) and report the minimum."""
            def one_pass():
                t0 = _time.perf_counter()
                c = jnp.float32(0)
                for _ in range(reps):
                    ia, da = ix.query(qb, neighbors=kk)
                    c = c + ia.astype(jnp.float32).sum() + da.sum()
                np.asarray(c)
                return (_time.perf_counter() - t0) / reps * 1e3

            for _ in range(warm):
                out = ix.query(qb, neighbors=kk)
            jax.block_until_ready(out)
            best = one_pass()
            for _ in range(3):
                nxt = one_pass()
                improved = nxt < 0.7 * best
                best = min(best, nxt)
                if not improved:
                    break
            return best

        kqb = jax.random.fold_in(key, 77)
        qb = jax.random.uniform(jax.random.fold_in(kqb, 1), (1024, 16),
                                jnp.float32)
        rb = jax.random.uniform(jax.random.fold_in(kqb, 2),
                                (1 << 20, 16), jnp.float32)
        for store in ("float32", "bf16", "int8"):
            ixs = _NNIdx(rb, store=store)
            runs, opss = ixs.pipeline(1024)

            def st_step(i, c, q, ops, runs=runs):
                eps = i.astype(jnp.float32) * 1e-9
                ia, da = runs(q + eps, *ops)
                return _consume(c, da, ia)

            mss, iterss = calibrated_amplified_ms(st_step, qb, opss)
            ias, _das = runs(qb, *opss)
            if store == "int8":
                qg = ixs._i8_q(qb)
                errss, tots = device_gate_vs_v2(
                    qg, ixs.ref_dev.astype(jnp.float32), ias)
            elif store == "bf16":
                errss, tots = device_gate_vs_v2(
                    qb, ixs.ref_dev.astype(jnp.float32), ias)
            else:
                errss, tots = device_gate_vs_v2(qb, rb, ias)
            tk_ms = steady_query_ms(ixs, qb, 16)
            details["rows"].append({
                "name": f"batch_store_1024x2^20_k16_{store}",
                "k": 16, "m": 1024, "n": 1 << 20, "ms": round(mss, 3),
                "timing": f"amplified x{iterss}",
                "topk16_eager_ms": round(tk_ms, 3),
                "errors": f"{errss}/{tots}",
                "gate": "on-device v2 differential over the stored "
                        "points",
                "note": "m=1024 1-NN through the prepared pipeline; "
                        "topk16_eager_ms is steady-state "
                        "NNIndex.query(neighbors=16) per call "
                        "(host-synced). int8 batch queries materialize "
                        "a bf16 grid operand per call: measured 0.028 "
                        "ms (scripts/r16_measure_misc.py D) — no "
                        "persistent-operand caching needed.",
            })
            if errss:
                print(f"CORRECTNESS FAILURE on batch_store {store}",
                      file=sys.stderr)
                sys.exit(1)
            print(f"# batch store={store}: 1-NN {mss:.3f} ms, top-16 "
                  f"{tk_ms:.3f} ms/call, errors {errss}/{tots}",
                  file=sys.stderr, flush=True)
            del ixs, runs, opss
        del qb, rb

        # Embedding-scale batch regime (k=128 / k=768 at m=1024),
        # per storage tier (VERDICT r4 item 1: bf16/int8 at the k where
        # memory matters most — qsplit2 runs 2 MXU passes over the
        # bf16-exact operand where f32 needs bf16x3's 3).
        for k_e in (128, 768):
            kqe = jax.random.fold_in(key, 1000 + k_e)
            qe = jax.random.uniform(jax.random.fold_in(kqe, 1),
                                    (1024, k_e), jnp.float32)
            re = jax.random.uniform(jax.random.fold_in(kqe, 2),
                                    (1 << 20, k_e), jnp.float32)
            for store in ("float32", "bf16", "int8"):
                ixe = _NNIdx(re, store=store)
                rune, opse = ixe.pipeline(1024)

                def em_step(i, c, q, ops, rune=rune):
                    eps = i.astype(jnp.float32) * 1e-9
                    ia, da = rune(q + eps, *ops)
                    return _consume(c, da, ia)

                mse, iterse = calibrated_amplified_ms(em_step, qe, opse,
                                                      max_iters=256)
                iae, _dae = rune(qe, *opse)
                # Gates compare against the STORED points (exactness is
                # over the quantized set by contract); int8 gates in
                # grid space (monotone rescale).
                if store == "int8":
                    qg = (qe - ixe._i8_zero_dev) * ixe._i8_inv_s
                    errse, tote = device_gate_vs_v2(
                        qg, ixe.ref_dev.astype(jnp.float32), iae,
                        chunk_cap=1 << 16)
                elif store == "bf16":
                    errse, tote = device_gate_vs_v2(
                        qe, ixe.ref_dev.astype(jnp.float32), iae,
                        chunk_cap=1 << 16)
                else:
                    errse, tote = device_gate_vs_v2(qe, re, iae,
                                                    chunk_cap=1 << 16)
                tk_e = steady_query_ms(ixe, qe, 16, warm=8, reps=10)
                passes = 2 if ixe.precision == "qsplit2" else 3
                mxu_floor = 2 * 1024 * (1 << 20) * k_e * passes / 197e9
                suffix = "" if store == "float32" else f"_{store}"
                details["rows"].append({
                    "name": f"embed_batch_1024x2^20_k{k_e}{suffix}",
                    "k": k_e, "m": 1024, "n": 1 << 20,
                    "store": store, "precision": ixe.precision,
                    "ms": round(mse, 3),
                    "timing": f"amplified x{iterse}",
                    "topk16_eager_ms": round(tk_e, 3),
                    "mxu_floor_ms": round(mxu_floor, 1),
                    "errors": f"{errse}/{tote}",
                    "gate": "on-device v2 differential over the stored "
                            "points (2^16 chunks)",
                    "note": "embedding-scale batch 1-NN through the "
                            "prepared pipeline; topk16_eager_ms is "
                            "steady-state NNIndex.query(neighbors=16) "
                            "per call (host-synced); routing rationale "
                            "in docs/SERVING.md",
                })
                if errse:
                    print(f"CORRECTNESS FAILURE on embed k={k_e} "
                          f"store={store}", file=sys.stderr)
                    sys.exit(1)
                print(f"# embed k={k_e} store={store}: 1-NN {mse:.3f} "
                      f"ms (floor {mxu_floor:.1f}), top-16 {tk_e:.3f} "
                      f"ms/call, errors {errse}/{tote}",
                      file=sys.stderr, flush=True)
                del ixe, rune, opse
            del qe, re

    # Derived per-call floor (PERF_NOTES "Per-call prep transpose"):
    # prep relayout + prepared scan, for rows whose pipeline still preps
    # (m > 4 MXU path). The amplified per-call row is an upper bound
    # (its r-perturbation copy does not always fuse); a carried-operand
    # protocol under-measures (XLA hoists the relayout through the
    # one-element update) — the sum of the two honestly measured halves
    # is the pipeline's own cost. m <= 4 rows (ds8/ds9) are zero-prep
    # since r4's AoS scan and carry no derived floor.
    by_name = {row["name"]: row for row in details["rows"]}
    for base in ("ds11",):
        pc = by_name.get(base)
        prepared = by_name.get(f"{base}_prepared_index")
        if pc and prepared and "prep_ms" in pc:
            pc["derived_floor_ms"] = round(pc["prep_ms"] + prepared["ms"], 3)

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    if headline_ms is None:  # non-TPU smoke run
        row = details["rows"][0]
        print(json.dumps({
            "metric": "smoke_fused_ms_cpu",
            "value": row["ms"],
            "unit": "ms",
            "vs_baseline": 0.0,
        }))
        return

    print(json.dumps({
        "metric": "ds11_knn_16x1024x1M_fused_1chip_ms",
        "value": round(headline_ms, 3),
        "unit": "ms",
        "vs_baseline": round(headline_base / headline_ms, 3),
    }))


if __name__ == "__main__":
    main()
