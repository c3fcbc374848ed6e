"""r16: the round-4 measurement items (VERDICT r3 items 3-7).

  A. v1 at ds10/ds11 (materialized 4 GiB matrix on one 16 GB chip).
  B. KD-tree reconcile: bare native kdt2 vs the NNIndex(kdtree) serving
     wrapper, one protocol, one process (the 2x discrepancy item).
  C. v11 projection-index WARM rebuild (process compile/first-touch paid).
  D. int8/bf16 batch serving at m=1024 (incl. the per-call bf16-grid
     materialization cost the int8 mode pays).
  E. batch embedding-scale: (k=128, m=1024, n=2^20) and (k=768, ...)
     through fused_knn + NNIndex, plus the single-pass-bf16 route
     evaluation (the wide-k analog of the packed trick).

Run on the real chip: python scripts/r16_measure_misc.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms

KEY = jax.random.PRNGKey(16)


def consume(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).sum() * 1e-9
    return c


def gate_vs_v2(q, r, idx, chunk=1 << 16):
    """Chunked on-device exact diff-form 1-NN differential."""
    import functools

    @functools.partial(jax.jit, static_argnames=("chunk",))
    def _gate(q, r, idx, chunk):
        m, k = q.shape
        n = r.shape[0]

        def body(carry, i):
            bd, bi = carry
            blk = jax.lax.dynamic_slice(r, (i * chunk, 0), (chunk, k))
            d = ((q[:, None, :] - blk[None, :, :]) ** 2).sum(-1)
            cd = d.min(1)
            ci = d.argmin(1).astype(jnp.int32) + i * chunk
            better = (cd < bd) | ((cd == bd) & (ci < bi))
            return (jnp.where(better, cd, bd),
                    jnp.where(better, ci, bi)), 0

        init = (jnp.full((m,), jnp.inf, jnp.float32),
                jnp.zeros((m,), jnp.int32))
        (bd, bi), _ = jax.lax.scan(body, init, jnp.arange(n // chunk))
        gd = ((q - r[idx]) ** 2).sum(-1)
        ok = (idx == bi) | (jnp.abs(jnp.sqrt(gd) - jnp.sqrt(bd)) <= 1e-3)
        return (~ok).sum()

    return int(_gate(q, r, idx, chunk))


def section_a_v1_big():
    print("\n== A. v1 (materialized matrix) at ds10/ds11 ==", flush=True)
    from tpu_knn.kernels.twophase import _v1_argmin

    for name, k, m, n in [("ds10", 3, 1024, 1 << 20),
                          ("ds11", 16, 1024, 1 << 20)]:
        kq = jax.random.fold_in(KEY, n + k)
        q = jax.random.uniform(jax.random.fold_in(kq, 1), (m, k))
        r = jax.random.uniform(jax.random.fold_in(kq, 2), (n, k))
        try:
            idx = _v1_argmin(q, r)
            bad = gate_vs_v2(q, r, idx)

            def step(i, c, q, r):
                eps = i.astype(jnp.float32) * 1e-9
                return consume(c, _v1_argmin(q + eps, r))

            ms, it = calibrated_amplified_ms(step, q, r, max_iters=256)
            print(f"{name} v1 ({k},{m},{n}): {ms:.3f} ms (x{it}) "
                  f"errors {bad}/{m}  [matrix "
                  f"{m * n * 4 / 2**30:.1f} GiB]", flush=True)
        except Exception as e:
            print(f"{name} v1: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        del q, r


def section_b_kdtree():
    print("\n== B. KD-tree reconcile (3,1024,65536) ==", flush=True)
    from tpu_knn.engine.index import NNIndex
    from tpu_knn.native import Kdt2Index

    rng = np.random.default_rng(7)
    rk = rng.random((65536, 3)).astype(np.float32)
    qk = rng.random((1024, 3)).astype(np.float32)

    def med(f, reps=9):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f()
            ts.append((time.perf_counter() - t0) * 1e3)
        return sorted(ts)[reps // 2], out

    # bare native engine
    b_ms, tree = med(lambda: Kdt2Index(rk))
    tree.query(qk)  # touch
    q_ms, (ik, _dk) = med(lambda: tree.query(qk))
    print(f"bare kdt2: build {b_ms:.2f} ms, query {q_ms:.3f} ms",
          flush=True)
    # NNIndex serving wrapper
    bi_ms, ix = med(lambda: NNIndex(rk, strategy="kdtree"))
    ix.query(qk)
    qi_ms, (ik2, _d2) = med(lambda: ix.query(qk))
    print(f"NNIndex(kdtree): build {bi_ms:.2f} ms, query {qi_ms:.3f} ms",
          flush=True)
    from tpu_knn.oracle import oracle_knn

    want = oracle_knn(qk, rk)
    e1 = int((np.asarray(ik) != want).sum())
    e2 = int((np.asarray(ik2) != want).sum())
    print(f"gate: bare {e1}/1024, NNIndex {e2}/1024 index mismatches "
          "(ties may differ legally; distance-checked in tests)",
          flush=True)


def section_c_v11_warm():
    print("\n== C. v11 projection-index warm rebuild (3, 2^24) ==",
          flush=True)
    from tpu_knn.kernels.projection import build_projection_index

    r = jax.random.uniform(jax.random.fold_in(KEY, 11), (1 << 24, 3))
    ts = []
    for rep in range(4):
        t0 = time.perf_counter()
        idx = build_projection_index(r + jnp.float32(rep) * 1e-9)
        # force completion: read back a small piece of every component
        for part in jax.tree_util.tree_leaves(idx):
            np.asarray(jax.device_get(
                part if np.ndim(part) == 0 or part.size <= 16
                else part.reshape(-1)[:: max(1, part.size // 16)]))
        ts.append(time.perf_counter() - t0)
        print(f"  build rep {rep}: {ts[-1] * 1e3:.1f} ms", flush=True)
    warm = sorted(ts[1:])[len(ts[1:]) // 2]
    print(f"v11 warm rebuild: {warm * 1e3:.1f} ms (cold first: "
          f"{ts[0] * 1e3:.1f} ms)", flush=True)
    del r


def section_d_quantized_batch():
    print("\n== D. int8/bf16 batch serving (m=1024, k=16, n=2^20) ==",
          flush=True)
    from tpu_knn.engine.index import NNIndex

    k, m, n = 16, 1024, 1 << 20
    kq = jax.random.fold_in(KEY, 44)
    q = jax.random.uniform(jax.random.fold_in(kq, 1), (m, k))
    r = jax.random.uniform(jax.random.fold_in(kq, 2), (n, k))

    for store in ("float32", "bf16", "int8"):
        ix = NNIndex(r, store=store)
        run, ops = ix.pipeline(m)

        def step(i, c, q, *ops):
            eps = i.astype(jnp.float32) * 1e-9
            ia, da = run(q + eps, *ops)
            return consume(c, ia, da)

        ms, it = calibrated_amplified_ms(step, q, *ops)
        ia, _da = run(q, *ops)
        if store == "int8":
            qg = ix._i8_q(q)
            bad = gate_vs_v2(qg, ix.ref_dev.astype(jnp.float32), ia)
        elif store == "bf16":
            bad = gate_vs_v2(q, ix.ref_dev.astype(jnp.float32), ia)
        else:
            bad = gate_vs_v2(q, r, ia)
        print(f"store={store}: batch 1-NN {ms:.3f} ms (x{it}) "
              f"errors {bad}/{m}", flush=True)
        if store == "int8":
            # the per-call bf16-grid materialization alone — a pure
            # layout stage, so pin it through the Pallas probe fence
            # (a checksum commutes through the transpose and the stage
            # is elided; bench._make_pin).
            import bench as _bench

            pin = _bench._make_pin()
            ix._i8_ops()  # build the jitted materializer

            def mat_step(i, c, g):
                ops2 = ix._i8_ops_fn(g + (i % 2).astype(jnp.int8))
                return consume(c, pin(ops2[0]))

            msm, itm = calibrated_amplified_ms(mat_step, ix.ref_dev)
            print(f"  int8 bf16-grid materialization: {msm:.3f} ms "
                  f"(x{itm})", flush=True)
        # batch top-K=16 through the index
        tki, tkd = ix.query(q, neighbors=16)
        t0 = time.perf_counter()
        reps = 20
        c = jnp.float32(0)
        for i in range(reps):
            ti, td = ix.query(q + jnp.float32(i) * 1e-9, neighbors=16)
            c = consume(c, ti, td)
        np.asarray(c)
        print(f"  batch top-16 (eager, host-synced): "
              f"{(time.perf_counter() - t0) / reps * 1e3:.3f} ms/call",
              flush=True)
        del ix, run, ops


def section_e_embedding_scale():
    print("\n== E. batch embedding-scale (m=1024, n=2^20) ==", flush=True)
    from tpu_knn.engine.index import NNIndex
    from tpu_knn.kernels.fused import auto_precision, fused_knn

    for k in (128, 768):
        kq = jax.random.fold_in(KEY, 1000 + k)
        q = jax.random.uniform(jax.random.fold_in(kq, 1), (1024, k))
        r = jax.random.uniform(jax.random.fold_in(kq, 2), (1 << 20, k))
        prec = auto_precision(k, 1 << 20)
        print(f"k={k}: auto precision {prec}", flush=True)

        idx, _d2 = fused_knn(q, r)
        bad = gate_vs_v2(q, r, idx, chunk=1 << 13)
        print(f"  fused_knn gate: {bad}/1024 errors", flush=True)

        def step(i, c, q, r):
            eps = i.astype(jnp.float32) * 1e-9
            ii, dd = fused_knn(q + eps, r + eps)
            return consume(c, ii, dd)

        ms, it = calibrated_amplified_ms(step, q, r, max_iters=256)
        mxu_ms = 2 * 1024 * (1 << 20) * k * 3 / (197e9)
        print(f"  fused_knn per-call: {ms:.3f} ms (x{it}) "
              f"[bf16x3 MXU floor ~{mxu_ms:.1f} ms]", flush=True)

        ix = NNIndex(r)
        run, ops = ix.pipeline(1024)

        def pstep(i, c, q, *ops):
            eps = i.astype(jnp.float32) * 1e-9
            ia, da = run(q + eps, *ops)
            return consume(c, ia, da)

        msp, itp = calibrated_amplified_ms(pstep, q, *ops, max_iters=256)
        ia, _ = run(q, *ops)
        badp = gate_vs_v2(q, r, ia, chunk=1 << 13)
        print(f"  NNIndex prepared 1-NN: {msp:.3f} ms (x{itp}) "
              f"errors {badp}/1024", flush=True)

        # top-K=16 through the prepared index (eager, host-synced)
        ix.query(q, neighbors=16)
        t0 = time.perf_counter()
        reps = 10
        c = jnp.float32(0)
        for i in range(reps):
            ti, td = ix.query(q + jnp.float32(i) * 1e-9, neighbors=16)
            c = consume(c, ti, td)
        np.asarray(c)
        print(f"  NNIndex top-16: "
              f"{(time.perf_counter() - t0) / reps * 1e3:.3f} ms/call",
              flush=True)

        # single-pass bf16 route evaluation: raw bf16 score selection +
        # the existing exact per-lane refine — 3x less MXU than bf16x3.
        for label, prec2 in [("bf16 single-pass", "bf16_raw"),
                             ("bf16x4", "bf16x4")]:
            try:
                i2, _d = fused_knn(q, r, precision=prec2,
                                   allow_approximate=True)
                bad2 = gate_vs_v2(q, r, i2, chunk=1 << 13)

                def fstep(i, c, q, r):
                    eps = i.astype(jnp.float32) * 1e-9
                    ii, dd = fused_knn(q + eps, r + eps, precision=prec2,
                                       allow_approximate=True)
                    return consume(c, ii, dd)

                ms2, it2 = calibrated_amplified_ms(fstep, q, r,
                                                   max_iters=256)
                print(f"  {label}: {ms2:.3f} ms (x{it2}) errors "
                      f"{bad2}/1024", flush=True)
            except Exception as e:
                print(f"  {label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        del q, r, ix, run, ops


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    for fn in (section_a_v1_big, section_b_kdtree, section_c_v11_warm,
               section_d_quantized_batch, section_e_embedding_scale):
        try:
            fn()
        except Exception as e:
            import traceback

            print(f"SECTION FAILED {fn.__name__}: {e}", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
