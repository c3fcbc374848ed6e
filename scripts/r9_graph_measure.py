"""Measure knn_graph compile + warm time on the real TPU after the
chunk-dispatch change (one compiled SEEDED_CHUNK_ROWS chunk, Python
enqueue loop): refresh the SERVING.md numbers and size a bench row.

Data is generated ON DEVICE (tunnel H2D/D2H is ~30 MB/s); the gate
reads back only a small checksum plus a 64-row slice for an exact
brute-force spot check.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import tpu_knn


def run(n, kk, k=16, seed=0):
    pts = jax.jit(
        lambda: jax.random.uniform(jax.random.PRNGKey(seed), (n, k),
                                   jnp.float32))()
    jax.block_until_ready(pts)

    # block_until_ready does NOT force completion through the axon
    # tunnel (scripts/r9_graph_cold_decomp2.py measured sub-ms "warm"
    # for 1.17 s of device work): end every timed region in a host
    # readback of a checksum that depends on every output row.
    def sync(gi, gd):
        import numpy as _np
        return float(_np.asarray((gi.sum() + gd.sum().astype(gi.dtype))))

    t0 = time.perf_counter()
    gi, gd = tpu_knn.knn_graph(pts, kk)
    sync(gi, gd)
    cold_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    gi, gd = tpu_knn.knn_graph(pts, kk)
    sync(gi, gd)
    warm_s = time.perf_counter() - t0

    # Spot-gate 64 rows against on-device brute force (exact d2 +
    # lowest-index ties), reading back only those rows.
    rows = np.linspace(0, n - 1, 64).astype(np.int32)

    @jax.jit
    def brute(pts):
        q = pts[rows]
        d = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        d = d.at[jnp.arange(64), rows].set(jnp.inf)  # self-exclusion
        key = d.astype(jnp.float64) if d.dtype == jnp.float64 else d
        order = jnp.argsort(key, axis=1, stable=True)[:, :kk]
        return order, jnp.take_along_axis(d, order, axis=1)

    bi, bd = jax.device_get(brute(pts))
    si, sd = np.asarray(gi[rows]), np.asarray(gd[rows])
    ok = np.allclose(np.sqrt(sd), np.sqrt(bd), atol=1e-3)
    exact = (si == bi).mean()
    print(f"n=2^{int(np.log2(n))} K={kk}: cold {cold_s:.1f} s, "
          f"warm {warm_s*1e3:.0f} ms, gate ok={ok} exact={exact:.4f}")
    return warm_s


if __name__ == "__main__":
    run(2 ** 15, 15)
    run(2 ** 17, 15)
