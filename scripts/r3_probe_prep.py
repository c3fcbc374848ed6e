"""Round-3 TPU probe: the per-call AoS -> SoA prep transpose
(VERDICT r2 item 2: ds9 per-call is prep-transpose-bound, 8.6 ms vs
1.6 prepared; the XLA pad+transpose costs ~7 ms at (2^24, 16)).

Measures, same-process and amplified:
  A. the XLA pad+transpose alone (current prep),
  B. a plain-Mosaic Pallas relayout kernel (in-kernel .T per tile),
  C. an MXU dot-transpose relayout kernel (X^T chunk = X_chunk^T via
     identity contraction — one MXU pass per 128-point chunk),
  D. layout probe: reshape (n, k_pad) -> (n*k_pad/128, 128) consumed by
     a row-sum (is the AoS array's HBM layout reinterpret-friendly?),
  E. the full per-call smallm pipeline (the number to improve).

Run alone: python scripts/r3_probe_prep.py
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
from tpu_knn.utils.platform import interpret_mode
from tpu_knn.utils.shapes import round_up


def _relayout_kernel_mosaic(r_ref, out_ref):
    out_ref[:] = r_ref[:].T


def _relayout_kernel_dot(r_ref, out_ref, *, tile_nr: int, k_pad: int):
    ident = jnp.eye(128, dtype=jnp.float32)
    for c in range(tile_nr // 128):
        chunk = r_ref[pl.ds(c * 128, 128), :]            # (128, k_pad)
        out_ref[:, pl.ds(c * 128, 128)] = jax.lax.dot_general(
            chunk, ident, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.lru_cache(maxsize=None)
def build_relayout(n: int, k: int, tile_nr: int, flavor: str):
    k_pad = round_up(k, 8)
    n_tiles = n // tile_nr
    assert n % tile_nr == 0
    if flavor == "mosaic":
        kernel = _relayout_kernel_mosaic
    else:
        kernel = functools.partial(_relayout_kernel_dot, tile_nr=tile_nr,
                                   k_pad=k_pad)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile_nr, k_pad), lambda j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k_pad, tile_nr), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n * k_pad, bytes_accessed=2 * n * k_pad * 4,
            transcendentals=0),
        interpret=interpret_mode(),
    )


def main():
    print("devices:", jax.devices(), flush=True)
    for k, n in ((16, 1 << 24), (3, 1 << 24)):
        k_pad = round_up(k, 8)
        rng = np.random.default_rng(0)
        ref = jnp.asarray(rng.random((n, k), np.float32))
        jax.block_until_ready(ref)
        gb = 2 * n * k_pad * 4 / 1e9
        print(f"\n(k={k}, n=2^24) — relayout traffic ~{gb:.2f} GB r+w:",
              flush=True)

        # A. XLA pad + transpose
        @jax.jit
        def xla_prep(r):
            return jnp.pad(r, ((0, 0), (0, k_pad - k))).T

        def step_a(i, c, r):
            out = xla_prep(r + i.astype(jnp.float32) * 1e-9)
            return c + out[0, 0] + out[-1, -1]

        ms, it = calibrated_amplified_ms(step_a, ref, target_ms=400.0,
                                         max_iters=256)
        print(f"  A xla pad+T            : {ms:8.3f} ms "
              f"({gb / ms * 1e3:6.0f} GB/s, iters={it})", flush=True)

        # B/C. Pallas relayout kernels. NEGATIVE RESULT (2026-08-17):
        # every variant crashes the TPU AOT compile helper (HTTP 500)
        # — a Pallas input of shape (n, k<=16) forces the row-major
        # T(8,128) layout, whose HBM form is 8x lane-padded (the D
        # probe's OOM dump shows f32[2^24,16]{1,0:T(8,128)} = 8 GB for
        # a 1 GB array). The SoA (k_pad, n) operand is the layout
        # canonicalization itself; XLA's pad+T at ~600 GB/s IS the
        # relayout floor. Gated off by default.
        for flavor in (("mosaic", "dot") if "--relayout" in sys.argv
                       else ()):
            for tile_nr in (512, 2048):
                try:
                    rl = build_relayout(n, k, tile_nr, flavor)
                    if k_pad != k:
                        run = jax.jit(lambda r: rl(
                            jnp.pad(r, ((0, 0), (0, k_pad - k)))))
                    else:
                        run = jax.jit(rl)

                    def step_b(i, c, r):
                        out = run(r + i.astype(jnp.float32) * 1e-9)
                        return c + out[0, 0] + out[-1, -1]

                    ms, it = calibrated_amplified_ms(step_b, ref,
                                                     target_ms=400.0,
                                                     max_iters=256)
                    print(f"  {flavor:6s} tile_nr={tile_nr:5d}  : "
                          f"{ms:8.3f} ms ({gb / ms * 1e3:6.0f} GB/s)",
                          flush=True)
                except Exception as e:
                    print(f"  {flavor} tile_nr={tile_nr}: FAILED "
                          f"{type(e).__name__}: {e}"[:240], flush=True)

        # D. layout probe: row-major reinterpret + consume. NEGATIVE
        # RESULT: OOMs — the reshape forces the 8x-padded row-major
        # layout of the whole array (see above). Gated off.
        if "--reinterp" in sys.argv and (n * k) % 128 == 0:
            @jax.jit
            def reinterp(r):
                v = r.reshape(n * k // 128, 128)
                return jnp.sum(v[:, :1]) + jnp.sum(v[0])

            def step_d(i, c, r):
                return c + reinterp(r + i.astype(jnp.float32) * 1e-9)

            ms, it = calibrated_amplified_ms(step_d, ref, target_ms=400.0,
                                             max_iters=256)
            print(f"  D reshape reinterpret  : {ms:8.3f} ms", flush=True)

        # E. full per-call 1-NN (the headline number)
        from tpu_knn.kernels.fused import fused_knn

        q = jnp.asarray(rng.random((1, k), np.float32))

        def step_e(i, c, q, r):
            eps = i.astype(jnp.float32) * 1e-9
            idx, d2 = fused_knn(q + eps, r + eps)
            return c + d2[0] + idx[0].astype(jnp.float32) * 1e-9

        ms, it = calibrated_amplified_ms(step_e, q, ref, target_ms=400.0,
                                         max_iters=256)
        print(f"  E per-call fused_knn   : {ms:8.3f} ms", flush=True)
        del ref
    print("done", flush=True)


if __name__ == "__main__":
    main()
