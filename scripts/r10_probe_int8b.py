"""Round-3 TPU probe #10 (part 2): NNIndex(store="int8") end-to-end.

Measures the rows the bench will publish, plus the batch-regime cost the
mode's memory contract implies (per-call bf16 grid-operand
materialization), with on-device correctness gates (grid-space v2
differential / strict equality vs the f32 engines on the same grid).

Run alone: python scripts/r10_probe_int8b.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.engine.index import NNIndex
from tpu_knn.harness.timing import calibrated_amplified_ms


def _time(label, fn, *args):
    try:
        def step(i, c, *a):
            return c + fn(i, *a)

        ms, it = calibrated_amplified_ms(step, *args)
        print(f"{label}: {ms:8.3f} ms (x{it})", flush=True)
        return ms
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {e}"[:300], flush=True)
        return None


def _consume(idx, d2):
    return jnp.sum(d2) + jnp.sum(idx).astype(jnp.float32) * 1e-9


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(1)

    for k in (16, 3):
        n = 1 << 24
        ref = jax.random.uniform(key, (n, k), jnp.float32)
        q = jax.random.uniform(jax.random.PRNGKey(2), (1, k), jnp.float32)
        t0 = time.time()
        ix = NNIndex(ref, store="int8")
        print(f"build k={k}: {time.time()-t0:.2f} s", flush=True)
        run, ops = ix.pipeline(1)

        def step(i, q_, g, run=run):
            return _consume(*run(q_ + i * 1e-9, g))

        _time(f"int8 NNIndex 1-NN m=1 k={k} n=2^24", step, q, *ops)

        # gate: grid-space winner vs the f32 AoS scan on the same grid
        from tpu_knn.kernels.smallm import _build_aos_scan

        gi, gd = run(q, *ops)
        qg = ix._i8_q(q)
        fi, fd = _build_aos_scan(1, n, k)(qg, ix.ref_dev.astype(jnp.float32))
        err = int(jax.device_get(jnp.sum(gi != fi)))
        print(f"  gate vs f32-on-grid: {err}/1", flush=True)

        if k == 16:
            from tpu_knn.kernels.topk import _build_aos_topk

            for kk in (16, 64):
                tk = _build_aos_topk(1, n, k, kk)

                def tk_step(i, q_, g, tk=tk, ix=ix):
                    ia, da = tk(q_ + i * 1e-9, g)
                    return _consume(ia, da)

                _time(f"int8 topk m=1 K={kk}", tk_step, qg, ix.ref_dev)
                ia, _ = tk(qg, ix.ref_dev)
                fa, _ = tk(qg, ix.ref_dev.astype(jnp.float32))
                print(f"  gate K={kk}: "
                      f"{int(jax.device_get(jnp.sum(ia != fa)))}/{kk}",
                      flush=True)
        del ref, ix, run, ops

    # batch regime: m=1024, n=2^20, k=16 — per-call operand materialization
    n, k, m = 1 << 20, 16, 1024
    ref = jax.random.uniform(key, (n, k), jnp.float32)
    qb = jax.random.uniform(jax.random.PRNGKey(3), (m, k), jnp.float32)
    ix = NNIndex(ref, store="int8")
    run, ops = ix.pipeline(m)

    def bstep(i, q_, g, run=run):
        return _consume(*run(q_ + i * 1e-9, g))

    _time("int8 batch 1-NN m=1024 k=16 n=2^20 (per-call ops)", bstep,
          qb, *ops)
    bi, bd = run(qb, *ops)
    # gate vs the f32 prepared pipeline on the same grid
    qg = ix._i8_q(qb)
    from tpu_knn.engine.index import _build_prepared_query
    from tpu_knn.kernels.fused import _build_fused_candidates
    from tpu_knn.kernels.tuning import pick_tiles

    g32 = ix.ref_dev.astype(jnp.float32)
    builder = _build_fused_candidates(8, n, k, 8, ix.tile_n, soa=True,
                                      precision=ix.precision)
    ops32 = jax.jit(builder.prep_soa)(g32)
    tile_m, _ = pick_tiles(k, m, n)
    run32 = _build_prepared_query(m, n, k, tile_m, ix.tile_n, ix.precision,
                                  cutoff_scale=1.0 / ix._i8_s2)
    fi, fd = run32(qg, ops32, g32)
    print(f"  gate m=1024: {int(jax.device_get(jnp.sum(bi != fi)))}/1024",
          flush=True)

    # batch top-K m=64 K=8 through the serving entry (eager; includes
    # the per-call operand materialization + transform dispatches)
    q64 = jax.random.uniform(jax.random.PRNGKey(4), (64, k), jnp.float32)
    t0 = time.time()
    ia, da = ix.query(q64, neighbors=8)
    jax.block_until_ready((ia, da))
    t_cold = time.time() - t0
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        ia, da = ix.query(q64 + 1e-7, neighbors=8)
        host = float(np.asarray(da).sum())  # tunnel-honest readback
    print(f"int8 topk m=64 K=8 n=2^20 query(): cold {t_cold:.2f} s, "
          f"warm {(time.time()-t0)/reps*1e3:.1f} ms/call (tunnel RTT "
          f"included), checksum {host:.3f}", flush=True)


if __name__ == "__main__":
    main()
