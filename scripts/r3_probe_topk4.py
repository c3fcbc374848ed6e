"""Round-3 TPU probe #4: extraction-kernel stage isolation.

Variants of the moment-extraction kernel at (k=16, m=1024, n=2^20),
each peeling one stage, to find where the 7.1 ms goes:
  score   : score tile + trivial per-chunk output (first lane)
  mask    : + threshold compare + cast, sum WITHOUT weights
  one     : + one weighted channel (w1)
  full    : both channels (the production kernel)
Across tile_n in (2048, 4096, 8192) where VMEM allows.

Run alone: python scripts/r3_probe_topk4.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.fused import _score_tile
from tpu_knn.utils.platform import interpret_mode
from tpu_knn.utils.shapes import round_up


def kernel(q_ref, r_ref, bs_ref, out1_ref, out2_ref, *, n, tile_m, tile_n,
           variant):
    j = pl.program_id(1)
    s = _score_tile(q_ref[:], r_ref[:], soa=True, precision="packed")
    chunks = tile_n // 128
    g = 128 // chunks
    s3 = s.reshape(tile_m, chunks, 128)
    if variant == "score":
        s1 = s3[:, :, 0]
        s2 = None
    else:
        m3 = (s3 <= bs_ref[:][:, :, None]).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(
            jnp.float32).reshape(1, 1, 128)
        if variant == "mask":
            s1 = jnp.sum(m3, axis=-1)
            s2 = None
        elif variant == "one":
            s1 = jnp.sum(m3 * (1.0 + 256.0 * lane), axis=-1)
            s2 = None
        else:
            s1 = jnp.sum(m3 * (1.0 + 256.0 * lane), axis=-1)
            s2 = jnp.sum(m3 * lane * lane, axis=-1)

    def place(x):
        return pltpu.roll(jnp.pad(x, ((0, 0), (0, 128 - chunks))),
                          (j % g) * chunks, 1)

    s1p = place(s1)
    s2p = place(s2) if s2 is not None else None

    @pl.when(j % g == 0)
    def _():
        out1_ref[:] = s1p
        if s2p is not None:
            out2_ref[:] = s2p

    @pl.when(j % g != 0)
    def _():
        out1_ref[:] = out1_ref[:] + s1p
        if s2p is not None:
            out2_ref[:] = out2_ref[:] + s2p


@functools.lru_cache(maxsize=None)
def build(m, n, k, tile_m, tile_n, variant):
    k_pad = round_up(k, 8)
    n_pad = n
    m_tiles = m // tile_m
    n_tiles = n_pad // tile_n
    nc = n_pad // 128
    nc_pad = round_up(nc, 128)
    g = 128 // (tile_n // 128)
    out_spec = pl.BlockSpec((tile_m, 128), lambda i, j: (i, j // g),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, n=n, tile_m=tile_m, tile_n=tile_n,
                          variant=variant),
        grid=(m_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_m, k_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((m, nc_pad), jnp.float32),
                   jax.ShapeDtypeStruct((m, nc_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n_pad * k_pad,
            bytes_accessed=m * k_pad * 4 + n_pad * k_pad * 4,
            transcendentals=0),
        interpret=interpret_mode(),
    )


def main():
    print("devices:", jax.devices(), flush=True)
    k, m, n = 16, 1024, 1 << 20
    k_pad = round_up(k, 8)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.random((m, k), np.float32))
    ref = jnp.asarray(rng.random((n, k), np.float32))
    r_op = jax.jit(lambda r: jnp.pad(
        r, ((0, 0), (0, k_pad - k))).T)(ref)
    bound = jnp.full((m, 1), 0.001, jnp.float32)
    jax.block_until_ready((r_op, bound))
    for tile_m, tile_n in ((512, 2048), (256, 4096), (512, 4096),
                           (128, 8192), (256, 8192), (1024, 2048),
                           (512, 8192)):
        for variant in ("full",):
            try:
                call = build(m, n, k, tile_m, tile_n, variant)

                @jax.jit
                def p(qq, r_op, bound):
                    a, b = call(qq, r_op, bound)
                    return a[0, 0] + a[-1, -1] + b[0, 0]

                def step(i, c, q, r_op, bound):
                    return c + p(q + i.astype(jnp.float32) * 1e-9, r_op,
                                 bound)

                ms, it = calibrated_amplified_ms(step, q, r_op, bound)
                print(f"{tile_m}x{tile_n} {variant:6s}: {ms:8.3f} ms",
                      flush=True)
            except Exception as e:
                print(f"{tile_m}x{tile_n} {variant}: FAILED "
                      f"{type(e).__name__}: {e}"[:160], flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
