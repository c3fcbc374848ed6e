"""Round-3 TPU probe #10 (part 3): int8 capacity ceiling.

The capacity ladder so far (scripts/r8_probe_capacity.py): f32 tops out
at 2^26 points (k=16) on a 16 GB v5e, bf16 at 2^27. The int8 grid is
4 bytes -> 1 byte with NO resident operand, so the arithmetic says 2^28
(4 GB grid + the AoS top-K engine's (n,) f32 score vector = 5 GB peak).
This probe builds that index FOR REAL — chunked on-device generation +
quantization through NNIndex.from_int8_grid (the standard constructor
would need the 16 GB f32 source resident, which is exactly the capacity
wall from_int8_grid exists to pass) — and serves m=1 1-NN + top-16 off
it with the amplified protocol.

Run alone: python scripts/r10_probe_int8_capacity.py
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
    def step(i, c, *a):
        return c + fn(i, *a)

    ms, it = calibrated_amplified_ms(step, *args)
    print(f"{label}: {ms:8.3f} ms (x{it})", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    n, k = 1 << 28, 16
    chunk = 1 << 24
    zero = np.full(k, 0.5, np.float32)
    scale = 0.5 / 127.0  # unit-cube data

    @jax.jit
    def make_chunk(key):
        x = jax.random.uniform(key, (chunk, k), jnp.float32)
        return jnp.clip(jnp.round((x - zero) * np.float32(1.0 / scale)),
                        -127, 127).astype(jnp.int8)

    t0 = time.time()
    key = jax.random.PRNGKey(0)
    parts = [make_chunk(jax.random.fold_in(key, i))
             for i in range(n // chunk)]
    grid = jnp.concatenate(parts)
    del parts
    grid = jax.block_until_ready(grid)
    print(f"grid (2^28, 16) int8 built in {time.time()-t0:.1f} s "
          f"({grid.size * 1 / 2**30:.1f} GiB)", flush=True)

    ix = NNIndex.from_int8_grid(grid, zero, scale)
    q = jax.random.uniform(jax.random.PRNGKey(1), (1, k), jnp.float32)
    run, ops = ix.pipeline(1)

    def step(i, q_, g):
        ia, da = run(q_ + i * 1e-9, g)
        return da[0] + ia[0].astype(jnp.float32) * 1e-9

    _time("int8 1-NN m=1 k=16 n=2^28", step, q, *ops)

    from tpu_knn.kernels.topk import _build_aos_topk

    qg = ix._i8_q(q)
    tk = _build_aos_topk(1, n, k, 16)

    def tk_step(i, q_, g):
        ia, da = tk(q_ + i * 1e-9, g)
        return da[0, 0] + jnp.sum(da) * 1e-9

    _time("int8 top-16 m=1 k=16 n=2^28", tk_step, qg, ix.ref_dev)

    # correctness at this scale: the winner of the full scan must match
    # a chunked two-stage argmin computed independently.
    @jax.jit
    def chunk_best(g):
        def body(c, _):
            gg = jax.lax.dynamic_slice(g, (c * chunk, 0), (chunk, k))
            d = gg.astype(jnp.float32) - qg[0]
            s = jnp.sum(d * d, axis=-1)
            j = jnp.argmin(s)
            return c + 1, (s[j], j + c * chunk)

        _, (vals, idxs) = jax.lax.scan(body, 0, None, length=n // chunk)
        b = jnp.argmin(vals)
        return idxs[b], vals[b]

    ia, da = run(q, *ops)
    ci, cd = chunk_best(ix.ref_dev)
    ok = int(jax.device_get((ia[0] == ci).astype(jnp.int32)))
    print(f"gate vs independent chunked argmin: {1-ok}/1 errors "
          f"(idx {int(jax.device_get(ia[0]))})", flush=True)


if __name__ == "__main__":
    main()
