"""Round-3 TPU probe #5: the MXU-moment extraction engine.

The extraction kernel's fourth iteration moves the per-cell moment
reductions onto the MXU (one bf16 matmul of the qualifier mask against
a block-diagonal weight operand; 256-lane cells). This probe measures

  1. the extraction kernel alone across tile geometries, vs the VPU
     iteration's recorded 6.08 ms at (16, 1024, 2^20);
  2. the full seeded engine end-to-end at the bench shapes
     (m=1024 K=8/16/32, m=256 K=8, m=64 K=8), vs the recorded
     10.3 / 12.2 / 19.1 / 2.7 / 0.91 ms.

Run alone: python scripts/r4_probe_extract.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.topk import _build_extract_candidates, _build_topk
from tpu_knn.utils.shapes import round_up


def main():
    print("devices:", jax.devices(), flush=True)
    k, n = 16, 1 << 20
    k_pad = round_up(k, 8)
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.random((n, k), np.float32))
    r_op = jax.jit(lambda r: jnp.pad(r, ((0, 0), (0, k_pad - k))).T)(ref)
    jax.block_until_ready(r_op)

    # --- stage isolation: extraction kernel alone, m=1024 ---
    m = 1024
    q = jnp.asarray(rng.random((m, k), np.float32))
    bound = jnp.full((m, 1), 0.001, jnp.float32)
    for tile_m, tile_n in ((128, 8192), (256, 8192), (64, 8192),
                           (128, 4096), (512, 8192), (128, 2048)):
        try:
            mom = _build_extract_candidates(m, n, k, tile_m, tile_n,
                                            "packed", n_ops=n)

            @jax.jit
            def p(qq, r_op, bound):
                cnt, s1, s2 = mom(qq, (r_op,), bound)
                return (cnt[0, 0] + cnt[-1, -1]).astype(jnp.float32) + s1[0, 0]

            def step(i, c, q, r_op, bound):
                return c + p(q + i.astype(jnp.float32) * 1e-9, r_op, bound)

            ms, it = calibrated_amplified_ms(step, q, r_op, bound)
            print(f"extract {tile_m}x{tile_n}: {ms:8.3f} ms (x{it})",
                  flush=True)
        except Exception as e:
            print(f"extract {tile_m}x{tile_n}: FAILED "
                  f"{type(e).__name__}: {e}"[:200], flush=True)

    # --- full seeded engine at the bench shapes ---
    for m_t, kk in ((1024, 8), (1024, 16), (1024, 32), (256, 8), (64, 8)):
        q_t = jnp.asarray(rng.random((m_t, k), np.float32))
        try:
            run = _build_topk(m_t, n, k, kk, n, "packed", "seeded")
            ti, td = run(q_t, (r_op,), ref)
            # correctness spot check vs numpy on a few rows
            qh = np.asarray(q_t[:4])
            D = ((qh[:, None, :] - np.asarray(ref)[None, :, :]) ** 2).sum(-1)
            want = np.sort(D, 1)[:, :kk]
            got = np.asarray(td[:4])
            ok = np.allclose(got, want, rtol=1e-5, atol=1e-6)

            def step(i, c, q_t, r_op, ref, run=run):
                ia, da = run(q_t + i.astype(jnp.float32) * 1e-9, (r_op,), ref)
                return c + da[0, 0] + ia[0, 0].astype(jnp.float32) * 1e-9

            ms, it = calibrated_amplified_ms(step, q_t, r_op, ref)
            print(f"seeded m={m_t:5d} K={kk:2d}: {ms:8.3f} ms (x{it}) "
                  f"spot-check {'ok' if ok else 'MISMATCH'}", flush=True)
        except Exception as e:
            print(f"seeded m={m_t} K={kk}: FAILED "
                  f"{type(e).__name__}: {e}"[:200], flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
