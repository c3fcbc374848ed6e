"""r21: quantized stores at embedding scale (VERDICT r4 items 1 + 4).

For (m=1024, n=2^20) at k in {128, 768}, measure through the prepared
NNIndex pipeline for each store:

  - f32   (bf16x3 tier — the r4 baseline: 6.09 / 33.1 ms 1-NN)
  - bf16  (qsplit2 tier — bf16-exact operand: 2/3 the MXU passes and
           HALF the operand reads; the regime where memory matters)
  - int8  (qsplit2 over the per-call bf16 grid operand — the capacity
           tier's batch mode; the materialization cost rides inside)

plus steady-state top-16 per call (item 4's multiplier) and the exact
gates (chunked on-device v2 differential over the STORED points —
selection exactness is over the quantized set by contract).

Run on the real chip: python scripts/r21_quantized_embed.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms

KEY = jax.random.PRNGKey(21)


def consume(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).sum() * 1e-9
    return c


def gate_vs_v2(q, r_stored, idx, chunk=1 << 13):
    """Chunked on-device exact diff-form 1-NN differential over the
    STORED (already-quantized, f32-upcast) points."""
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

    return int(jax.device_get(_gate(q, r_stored, idx, chunk)))


def steady_topk_ms(ix, q, kk=16, min_reps=8):
    """Steady-state eager per-call top-K: repeat passes until a pass
    stops improving >30%, keep the min (the bench.py protocol — a fixed
    warm count cannot absorb the post-build dispatch transient)."""
    best = float("inf")
    while True:
        c = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(min_reps):
            ti, td = ix.query(q + jnp.float32(i) * 1e-9, neighbors=kk)
            c = consume(c, ti, td)
        np.asarray(c)
        ms = (time.perf_counter() - t0) / min_reps * 1e3
        if ms > best * 0.7:
            return min(best, ms)
        best = min(best, ms)


def main():
    from tpu_knn.engine.index import NNIndex

    _ = jax.device_get(jnp.zeros((8, 128)))  # absorb cold start
    for k in (128, 768):
        kq = jax.random.fold_in(KEY, k)
        q = jax.random.uniform(jax.random.fold_in(kq, 1), (1024, k))
        r = jax.random.uniform(jax.random.fold_in(kq, 2), (1 << 20, k))
        mxu3 = 2 * 1024 * (1 << 20) * k * 3 / 197e9
        mxu2 = mxu3 * 2 / 3
        print(f"\n== k={k} (m=1024, n=2^20) — bf16x3 floor ~{mxu3:.1f}, "
              f"qsplit2 floor ~{mxu2:.1f} ms ==", flush=True)
        for store in ("float32", "bf16", "int8"):
            t0 = time.perf_counter()
            ix = NNIndex(r, store=store)
            jax.block_until_ready(
                ix.r_ops if ix.r_ops is not None else ix.ref_dev)
            build_s = time.perf_counter() - t0
            run, ops = ix.pipeline(1024)

            def pstep(i, c, q, *ops):
                eps = i.astype(jnp.float32) * 1e-9
                ia, da = run(q + eps, *ops)
                return consume(c, ia, da)

            ms, it = calibrated_amplified_ms(pstep, q, *ops, max_iters=256)
            ia, _ = run(q, *ops)
            if store == "int8":
                qg = (q - ix._i8_zero_dev) * ix._i8_inv_s
                stored = ix.ref_dev.astype(jnp.float32)
                bad = gate_vs_v2(qg, stored, ia)
            else:
                stored = (ix.ref_dev.astype(jnp.float32)
                          if store == "bf16" else r)
                bad = gate_vs_v2(q, stored, ia)
            tk_ms = steady_topk_ms(ix, q)
            print(f"  store={store:8s} prec={ix.precision:8s} "
                  f"1-NN {ms:7.3f} ms (x{it})  top16 {tk_ms:7.3f} ms "
                  f"(x{tk_ms / ms:.2f})  gate {bad}/1024  "
                  f"build {build_s:.2f} s", flush=True)
            del ix, run, ops


if __name__ == "__main__":
    main()
