"""Round-3 TPU probe #6: cubic (8-field) moment recovery for K > 16.

K=32 previously kept 128-lane cells because a 3-qualifier cell trips the
quadratic solver's certified fallback (measured: every 256-cell probe
batch fell back, 103 ms).  The cubic mode emits sum(l^3) as three extra
base-256 digit fields, solves <= 3 qualifiers per cell via Newton's
identities, and runs 256-lane cells at every K.  This probe measures

  1. the 8-field extraction kernel alone (kk=32) vs the 4-field kernel
     (kk=16) at the shipping 128x8192 geometry — the matmul width
     doubles (256 cols vs 128), the compaction input halves;
  2. the full seeded engine end-to-end at m=1024 K=8/16/32 and
     m=256 K=32, vs the recorded quadratic-era numbers
     (7.75 / 8.51 / 18.8 ms — docs/PERF_NOTES.md).

Run alone: python scripts/r4_probe_cubic.py
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

    # --- stage isolation: 4-field vs 8-field kernel, 128x8192 ---
    m = 1024
    q = jnp.asarray(rng.random((m, k), np.float32))
    bound = jnp.full((m, 1), 0.001, jnp.float32)
    for kk_mode, label in ((16, "4-field quadratic"),
                           (32, "8-field cubic   ")):
        try:
            mom = _build_extract_candidates(m, n, k, 128, 8192, "packed",
                                            n_ops=n, kk=kk_mode)

            @jax.jit
            def p(qq, r_op, bound, mom=mom):
                moms = mom(qq, (r_op,), bound)
                cnt, s1 = moms[0], moms[1]
                return (cnt[0, 0] + cnt[-1, -1]).astype(jnp.float32) + s1[0, 0]

            def step(i, c, q, r_op, bound, p=p):
                return c + p(q + i.astype(jnp.float32) * 1e-9, r_op, bound)

            ms, it = calibrated_amplified_ms(step, q, r_op, bound)
            print(f"extract {label} (cell={mom.cell}): {ms:8.3f} ms (x{it})",
                  flush=True)
        except Exception as e:
            print(f"extract {label}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)

    # --- full seeded engine ---
    for m_t, kk in ((1024, 8), (1024, 16), (1024, 32), (256, 32)):
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
                  f"{type(e).__name__}: {e}"[:300], flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
