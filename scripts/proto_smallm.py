"""Prototype: small-m diff-form VPU streaming kernel vs the fused MXU path.

At m=1 the packed MXU dot does ~16x redundant per-element VPU work on the
reference tile (bf16 3-way splits + 9-term concat + norm row) while the MXU
itself is ~6% utilized (8 of 128 rows). Diff-form on the VPU costs only
~3*k_pad ops per reference element at m=1 and produces EXACT f32 scores.

Run on the real chip:  timeout 900 python scripts/proto_smallm.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from tpu_knn.harness.timing import device_time_ms
from tpu_knn.kernels.fused import _fold_scores, _refine, fused_knn
from tpu_knn.utils.platform import interpret_mode
from tpu_knn.utils.shapes import round_up

_I32_MAX = np.int32(2**31 - 1)


def _smallm_kernel(q_ref, r_ref, out_i_ref, best_s, best_i, *,
                   m: int, n: int, tile_n: int, n_tiles: int):
    j = pl.program_id(0)
    ragged = n_tiles * tile_n != n

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, jnp.inf)
        best_i[:] = jnp.full_like(best_i, _I32_MAX)

    r = r_ref[:]  # (k_pad, tile_n)
    for i in range(m):
        q_col = q_ref[:, i:i + 1]          # (k_pad, 1)
        diff = r - q_col
        s = jnp.sum(diff * diff, axis=0, keepdims=True)  # (1, tile_n) exact
        if ragged:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1) + j * tile_n
            s = jnp.where(col < n, s, jnp.inf)
        cur_s, cur_i = _fold_scores(s, j * tile_n,
                                    best_s[i:i + 1, :], best_i[i:i + 1, :])
        best_s[i:i + 1, :] = cur_s
        best_i[i:i + 1, :] = cur_i

    @pl.when(j == n_tiles - 1)
    def _():
        out_i_ref[:] = best_i[:]


@functools.lru_cache(maxsize=None)
def build_smallm_candidates(m: int, n: int, k: int, tile_n: int):
    k_pad = round_up(k, 8)
    n_pad = round_up(n, tile_n)
    n_tiles = n_pad // tile_n
    m_slots = round_up(m, 8)

    call = pl.pallas_call(
        functools.partial(_smallm_kernel, m=m, n=n, tile_n=tile_n,
                          n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k_pad, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_slots, 128), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_slots, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((m_slots, 128), jnp.float32),
            pltpu.VMEM((m_slots, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * m * n_pad * k_pad,
            bytes_accessed=n_pad * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )

    def prep_soa(ref):
        return (jnp.pad(ref, ((0, n_pad - n), (0, k_pad - k))).T,)

    def candidates(search, ref_ops):
        q = jnp.pad(search.T, ((0, k_pad - k), (0, 128 - m)))
        return call(q, *ref_ops)[:m]

    candidates.prep_soa = prep_soa
    return candidates


def main():
    print(f"devices: {jax.devices()}")
    shapes = [(3, 1, 1 << 24), (16, 1, 1 << 24), (3, 1, 65536), (16, 1, 65536)]

    # Generate data on device (tunnel trap: never H2D big arrays).
    for k, m, n in shapes:
        key = jax.random.PRNGKey(0)
        kq, kr = jax.random.split(key)
        gen = jax.jit(lambda kq, kr: (
            jax.random.uniform(kq, (m, k), jnp.float32),
            jax.random.uniform(kr, (n, k), jnp.float32)))
        q, r = gen(kq, kr)
        jax.block_until_ready((q, r))

        # Current fused path (per-call, includes in-jit pad+transpose).
        t_fused = device_time_ms(lambda a, b: fused_knn(a, b)[0], q, r, reps=8)
        idx_ref, d2_ref = fused_knn(q, r)
        idx_ref = np.asarray(idx_ref)

        print(f"(k={k},m={m},n={n}) fused per-call: {t_fused:.3f} ms")

        for tile_n in (8192, 16384, 32768, 65536):
            if tile_n > round_up(n, 128):
                continue
            cand = build_smallm_candidates(m, n, k, tile_n)

            @jax.jit
            def run_percall(search, ref):
                return _refine(search, ref, cand(search, cand.prep_soa(ref)), n)

            t0 = time.perf_counter()
            idx, d2 = run_percall(q, r)
            jax.block_until_ready(idx)
            compile_s = time.perf_counter() - t0
            ok = np.array_equal(np.asarray(idx), idx_ref)
            t_pc = device_time_ms(lambda a, b: run_percall(a, b)[0], q, r, reps=8)

            # Prepared: operand already SoA on device.
            ops = jax.jit(lambda rr: cand.prep_soa(rr)[0])(r)
            jax.block_until_ready(ops)

            @jax.jit
            def run_prep(search, ref_soa, ref_aos):
                return _refine(search, ref_aos, cand(search, (ref_soa,)), n)

            t_prep = device_time_ms(lambda a, b, c: run_prep(a, b, c)[0],
                                    q, ops, r, reps=8)
            print(f"  diff-form tile_n={tile_n:6d}: per-call {t_pc:.3f} ms, "
                  f"prepared {t_prep:.3f} ms, match={ok}, "
                  f"compile {compile_s:.1f}s")


if __name__ == "__main__":
    main()
