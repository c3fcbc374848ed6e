"""High-k probe round 2: after the routing + geometry fixes.

- m<=4 now routes to the AoS scan (expect ~read-roofline: n*k*4 bytes).
- batch fused at k=768/128 with the operand-budget default tiles, plus
  an explicit tile sweep to see if the budget is too conservative at
  high k (wider (k_pad, tile_n) operand tiles vs more grid steps).
- batch seeded top-K at k=768 (the r14 VMEM OOM, now clamped).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.api import nearest_neighbors
from tpu_knn.kernels.fused import auto_precision, fused_knn, pick_tiles
from tpu_knn.kernels.topk import topk_knn

BF16_TFLOPS = 197.0
READ_GBS = 650.0


def consume_real(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).reshape(-1)[:: max(1, o.size // 128)].sum()
    return c


import functools


@functools.partial(jax.jit, static_argnames=("rows",))
def _gate_dev(q, r, idx, rows=8):
    """ON-DEVICE spot gate (never pull r to the host: 3 GB over this
    tunnel is minutes): chunked exact argmin for the first `rows` rows."""
    qs = q[:rows]
    n, k = r.shape
    chunk = 1 << 14
    nc = n // chunk

    def body(carry, i):
        bd, bi = carry
        blk = jax.lax.dynamic_slice(r, (i * chunk, 0), (chunk, k))
        d = ((qs[:, None, :] - blk[None, :, :]) ** 2).sum(-1)
        cd, ci = d.min(1), d.argmin(1).astype(jnp.int32) + i * chunk
        better = (cd < bd) | ((cd == bd) & (ci < bi))
        return (jnp.where(better, cd, bd), jnp.where(better, ci, bi)), 0

    init = (jnp.full((qs.shape[0],), jnp.inf, jnp.float32),
            jnp.zeros((qs.shape[0],), jnp.int32))
    (bd, bi), _ = jax.lax.scan(body, init, jnp.arange(nc))
    return (idx[:rows] != bi).sum()


def gate(q, r, idx):
    rows = min(8, q.shape[0])
    return int(_gate_dev(q, r, jnp.asarray(idx), rows=rows))


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    key = jax.random.PRNGKey(15)

    def data(k, m, n, tag):
        kq = jax.random.fold_in(key, tag)
        q = jax.random.uniform(jax.random.fold_in(kq, 1), (m, k),
                               jnp.float32)
        r = jax.random.uniform(jax.random.fold_in(kq, 2), (n, k),
                               jnp.float32)
        return q, r

    # 1. small-m per-call (new AoS route)
    for i, (k, m, n) in enumerate([(768, 1, 1 << 20), (768, 4, 1 << 20),
                                   (128, 1, 1 << 22), (128, 4, 1 << 22)]):
        q, r = data(k, m, n, i)
        idx, d2 = nearest_neighbors(q, r), None
        print(f"(k={k}, m={m}, n=2^{int(np.log2(n))}) spot-gate "
              f"{gate(q, r, idx)}/{min(8, m)}", flush=True)

        def step(i2, c, q, r):
            eps = i2.astype(jnp.float32) * 1e-9
            ii = nearest_neighbors(q + eps, r + eps)
            return consume_real(c, ii)

        ms, it = calibrated_amplified_ms(step, q, r)
        read_ms = n * k * 4 / (READ_GBS * 1e6)
        print(f"  per-call 1-NN: {ms:.3f} ms (x{it}); "
              f"read-floor ~{m * read_ms if m <= 4 else read_ms:.2f} ms "
              f"(m scans)", flush=True)
        del q, r, idx

    # 2. batch fused, default tiles + sweep
    for k, m, n in [(768, 1024, 1 << 20), (128, 1024, 1 << 20)]:
        q, r = data(k, m, n, 100 + k)
        prec = auto_precision(k, n)
        tm, tn = pick_tiles(k, m, n)
        print(f"\n(k={k}, m={m}, n=2^20): precision={prec} "
              f"default tiles=({tm},{tn})", flush=True)
        idx, d2 = fused_knn(q, r)
        print(f"  spot-gate {gate(q, r, idx)}/8", flush=True)
        flop_ms = 2 * m * n * k * 3 / (BF16_TFLOPS * 1e9)

        for tmx, tnx in [(None, None), (512, 512), (256, 1024),
                         (512, 1024), (256, 2048), (128, 2048)]:
            def step(i2, c, q, r, tmx=tmx, tnx=tnx):
                eps = i2.astype(jnp.float32) * 1e-9
                ii, dd = fused_knn(q + eps, r + eps,
                                   tile_m=tmx, tile_n=tnx)
                return consume_real(c, ii, dd)

            try:
                ms, it = calibrated_amplified_ms(step, q, r)
                print(f"  fused tiles=({tmx},{tnx}): {ms:.3f} ms (x{it}); "
                      f"mxu-floor ~{flop_ms:.2f}", flush=True)
            except Exception as e:
                print(f"  fused tiles=({tmx},{tnx}): FAIL "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
        del q, r, idx, d2

    # 3. batch seeded top-K at k=768 (was: VMEM OOM)
    k, m, n, kk = 768, 1024, 1 << 20, 16
    q, r = data(k, m, n, 999)
    ti, td = topk_knn(q, r, kk)
    print(f"\n(k=768, m=1024, n=2^20) top-{kk}: spot-gate "
          f"{gate(q, r, ti[:, 0])}/8", flush=True)

    def tk_step(i2, c, q, r):
        eps = i2.astype(jnp.float32) * 1e-9
        ii, dd = topk_knn(q + eps, r + eps, kk)
        return consume_real(c, ii, dd)

    ms, it = calibrated_amplified_ms(tk_step, q, r)
    print(f"  seeded top-{kk}: {ms:.3f} ms (x{it})", flush=True)

    # 4. m=1 top-K at k=768 (aos cell engine)
    k, m, n, kk = 768, 1, 1 << 20, 16
    q, r = data(k, m, n, 998)
    ti, td = topk_knn(q, r, kk)

    def tk1_step(i2, c, q, r):
        eps = i2.astype(jnp.float32) * 1e-9
        ii, dd = topk_knn(q + eps, r + eps, kk)
        return consume_real(c, ii, dd)

    ms, it = calibrated_amplified_ms(tk1_step, q, r)
    print(f"(k=768, m=1, n=2^20) aos top-{kk}: {ms:.3f} ms (x{it})",
          flush=True)


if __name__ == "__main__":
    main()
