"""Embedding-scale (high-k) probe: where the engine lands at k=128/768.

The reference supports arbitrary k in v1-v8 but only records k in {3,16};
production vector-search workloads live at k=128..1024. This probe
measures the shipped routes on the real chip at those dims:

- batch 1-NN (m=1024, n=2^20): fused candidates + refine, bf16x3 ladder
  (auto_precision: contraction too wide to pack).
- m=1 1-NN per-call and prepared.
- batch top-K=16 through the seeded engine.
- expected floors: batch is MXU-bound (bf16x3 = 3 passes of the k-deep
  matmul: 2*m*n*k*3 FLOPs); m=1 is HBM-read-bound (n*k*4 bytes).

Every timed shape is gated on-device against a chunked v2 differential.
"""
import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms

BF16_TFLOPS = 197.0
READ_GBS = 650.0


def consume_real(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).reshape(-1)[:: max(1, o.size // 128)].sum()
    return c


@functools.partial(jax.jit, static_argnames=("chunk",))
def v2_gate(q, r, idx, d2, chunk=1 << 16):
    """Chunked on-device argmin differential (exact diff-form f32)."""
    m, k = q.shape
    n = r.shape[0]
    nc = n // chunk

    def body(carry, i):
        bd, bi = carry
        blk = jax.lax.dynamic_slice(r, (i * chunk, 0), (chunk, k))
        d = ((q[:, None, :] - blk[None, :, :]) ** 2).sum(-1)
        cd = d.min(1)
        ci = d.argmin(1).astype(jnp.int32) + i * chunk
        better = (cd < bd) | ((cd == bd) & (ci < bi))
        return (jnp.where(better, cd, bd), jnp.where(better, ci, bi)), 0

    init = (jnp.full((m,), jnp.inf, jnp.float32),
            jnp.zeros((m,), jnp.int32))
    (bd, bi), _ = jax.lax.scan(body, init, jnp.arange(nc))
    # tolerance gate: index equal OR true distance within 1e-3 (sqrt space)
    ok = (idx == bi) | (jnp.abs(jnp.sqrt(d2) - jnp.sqrt(bd)) <= 1e-3)
    return (~ok).sum()


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    key = jax.random.PRNGKey(14)

    from tpu_knn.api import nearest_neighbors
    from tpu_knn.kernels.fused import auto_precision, fused_knn, pick_tiles

    for k, m, n in [(128, 1024, 1 << 20), (768, 1024, 1 << 20),
                    (768, 1, 1 << 20), (128, 1, 1 << 22)]:
        kq = jax.random.fold_in(key, k * 131 + m)
        q = jax.random.uniform(jax.random.fold_in(kq, 1), (m, k), jnp.float32)
        r = jax.random.uniform(jax.random.fold_in(kq, 2), (n, k), jnp.float32)
        prec = auto_precision(k, n)
        tiles = pick_tiles(k, m, n)
        print(f"\n(k={k}, m={m}, n=2^{int(np.log2(n))}): "
              f"precision={prec} tiles={tiles}", flush=True)

        idx, d2 = fused_knn(q, r)
        bad = int(v2_gate(q, r, idx, d2))
        print(f"  gate: {bad}/{m} errors", flush=True)

        def step(i, c, q, r):
            eps = i.astype(jnp.float32) * 1e-9
            ii, dd = fused_knn(q + eps, r + eps)
            return consume_real(c, ii, dd)

        ms, it = calibrated_amplified_ms(step, q, r)
        flop_ms = 2 * m * n * k * 3 / (BF16_TFLOPS * 1e9)
        read_ms = n * k * 4 / (READ_GBS * 1e6)
        print(f"  fused per-call: {ms:.3f} ms (x{it}); "
              f"mxu-floor ~{flop_ms:.2f} ms, read-floor ~{read_ms:.2f} ms",
              flush=True)

        del q, r, idx, d2

    # batch top-K at k=768
    k, m, n, kk = 768, 1024, 1 << 20, 16
    kq = jax.random.fold_in(key, 999)
    q = jax.random.uniform(jax.random.fold_in(kq, 1), (m, k), jnp.float32)
    r = jax.random.uniform(jax.random.fold_in(kq, 2), (n, k), jnp.float32)
    from tpu_knn.kernels.topk import topk_knn

    ti, td = topk_knn(q, r, kk)
    bad = int(v2_gate(q, r, ti[:, 0], td[:, 0]))
    print(f"\n(k=768, m=1024, n=2^20) top-{kk}: col-0 gate {bad}/{m}",
          flush=True)

    def tk_step(i, c, q, r):
        eps = i.astype(jnp.float32) * 1e-9
        ii, dd = topk_knn(q + eps, r + eps, kk)
        return consume_real(c, ii, dd)

    ms, it = calibrated_amplified_ms(tk_step, q, r)
    print(f"  seeded top-{kk}: {ms:.3f} ms (x{it})", flush=True)


if __name__ == "__main__":
    main()
