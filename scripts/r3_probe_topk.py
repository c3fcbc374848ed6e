"""Round-3 TPU probe: the bound-seeded batch top-K engine.

Correctness-checks the seeded engine compiled on the real chip (Mosaic:
SMEM pending queue, dynamic-trip fori, scratch slicing), then measures
it against the passes/sweep engines at the VERDICT r2 target shapes with
the amplified in-dispatch protocol (prepared operands, q-only
perturbation — the serving semantics).

Run alone (ONE TPU process at a time): python scripts/r3_probe_topk.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import auto_precision
from tpu_knn.kernels.topk import _build_topk
from tpu_knn.utils.shapes import round_up


def check_correctness():
    rng = np.random.default_rng(0)
    k, m, n, kk = 16, 256, 1 << 18, 8
    q = rng.random((m, k), np.float32)
    r = rng.random((n, k), np.float32)
    r[303] = r[65999]
    r[100] = r[228] = r[356]
    r[42] = q[3]
    outs = {}
    for method in ("seeded", "passes"):
        run = build_percall(m, n, k, kk, method)
        idx, d2 = run(jnp.asarray(q), jnp.asarray(r))
        outs[method] = (np.asarray(idx), np.asarray(d2))
    ok = (np.array_equal(outs["seeded"][0], outs["passes"][0])
          and np.array_equal(outs["seeded"][1], outs["passes"][1]))
    print(f"TPU correctness seeded==passes at ({k},{m},{n},K={kk}): {ok}",
          flush=True)
    if not ok:
        diff = np.nonzero(outs["seeded"][0] != outs["passes"][0])
        print("  first mismatches:", diff[0][:5], diff[1][:5])
        print("  seeded:", outs["seeded"][0][diff][:5],
              outs["seeded"][1][diff][:5])
        print("  passes:", outs["passes"][0][diff][:5],
              outs["passes"][1][diff][:5])
    return ok


def build_percall(m, n, k, kk, method):
    precision = auto_precision(k, n)
    n_ops = round_up(n, 2048)
    run = _build_topk(m, n, k, kk, n_ops, precision, method)
    k_pad = round_up(k, 8)

    @jax.jit
    def go(search, ref):
        r_op = jnp.pad(ref, ((0, n_ops - n), (0, k_pad - k))).T
        return run(search, (r_op,), ref)

    return go


def measure(shapes):
    print("\nprepared-operand timings (amplified, ms/iter):", flush=True)
    for k, m, n, kk, methods in shapes:
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.random((m, k), np.float32))
        ref = jnp.asarray(rng.random((n, k), np.float32))
        precision = auto_precision(k, n)
        n_ops = round_up(n, 2048)
        k_pad = round_up(k, 8)
        r_op = jax.jit(
            lambda r: jnp.pad(r, ((0, n_ops - n), (0, k_pad - k))).T)(ref)
        jax.block_until_ready(r_op)
        row = {}
        for method in methods:
            run = _build_topk(m, n, k, kk, n_ops, precision, method)

            def step(i, c, q, r_op, ref):
                qq = q + i.astype(jnp.float32) * 1e-9
                idx, d2 = run(qq, (r_op,), ref)
                return c + d2[0, 0] + idx[-1, -1].astype(jnp.float32)

            try:
                ms, iters = calibrated_amplified_ms(step, q, r_op, ref)
                row[method] = ms
                print(f"  k={k} m={m} n=2^{int(np.log2(n))} K={kk} "
                      f"{method:7s}: {ms:8.3f} ms  (iters={iters})",
                      flush=True)
            except Exception as e:
                print(f"  k={k} m={m} K={kk} {method}: FAILED {e!r}"[:300],
                      flush=True)
        del r_op, ref, q


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    if not check_correctness():
        sys.exit(1)
    N20 = 1 << 20
    measure([
        # the VERDICT target shape first
        (16, 1024, N20, 8, ("seeded", "passes")),
        (16, 1024, N20, 16, ("seeded", "passes")),
        (16, 256, N20, 8, ("seeded", "passes")),
        (16, 64, N20, 8, ("seeded", "passes", "sweep")),
        (16, 32, N20, 8, ("seeded", "sweep")),
        (3, 1024, N20, 8, ("seeded", "passes")),
        (16, 1024, N20, 32, ("seeded", "passes")),
    ])
    print("done", flush=True)
