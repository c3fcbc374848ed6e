"""v5 — explicit memory-space specialization with a hand-rolled DMA pipeline.

The reference v5 (core.cu:424-529) moves the reference points into the GPU
texture path (cudaArray + tex2D reads) — an explicit choice of memory space
and access route for the streamed operand. The TPU-native counterpart is
explicit HBM->VMEM staging: the reference array stays in HBM (no automatic
Pallas blocking) and the kernel double-buffers (k, tile_n) slices into VMEM
scratch with `pltpu.make_async_copy`, overlapping the next tile's DMA with
the current tile's MXU/VPU work — the manual version of the pipeline the
v4 BlockSpecs get from the Pallas runtime.

Like the reference's v5 (which falls back to v4 when n exceeds the texture
width limit, core.cu:481-485), this version guards on its own hard
constraint: the double-buffered (k_pad, tile_n) staging slices plus the
resident query tile, score tile, and running (score, index) pair are all
explicit VMEM scratch allocated up front, so their total must fit the
scoped-VMEM budget. Wide k at the autotuned tile_n exceeds it; the guard
computes the same tile geometry the wrapper would use and delegates to v4
when the allocation would not fit.

Compute and reduction are shared with v4 (same _score_tile, _fold_scores,
exact _refine), so v4 and v5 differentially test each other's data paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_knn.engine.registry import register_version
from tpu_knn.kernels.fused import (
    _I32_MAX, _fold_scores, _refine, _score_tile, DEFAULT_PRECISION,
)
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.platform import interpret_mode
from tpu_knn.utils.shapes import round_up


def _dma_kernel(q_ref, r_hbm, out_i_ref, buf, sem, best_s, best_i, *,
                n: int, tile_n: int, n_tiles: int, precision: str):
    """Grid (m_tiles,); r_hbm is the full (k_pad, n_pad) array in HBM.
    Double-buffered manual HBM->VMEM copies stream the n axis."""
    best_s[:] = jnp.full_like(best_s, jnp.inf)
    best_i[:] = jnp.full_like(best_i, _I32_MAX)
    tile_m = best_s.shape[0]
    ragged = n_tiles * tile_n != n

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            r_hbm.at[:, pl.ds(j * tile_n, tile_n)],
            buf.at[slot],
            sem.at[slot],
        )

    get_dma(0, 0).start()

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < n_tiles)
        def _():
            get_dma((j + 1) % 2, j + 1).start()

        get_dma(slot, j).wait()
        s = _score_tile(q_ref[:], buf[slot], soa=True, precision=precision)
        if ragged:
            col = jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 1) \
                + j * tile_n
            s = jnp.where(col < n, s, jnp.inf)
        cur_s, cur_i = _fold_scores(s, j * tile_n, best_s[:], best_i[:])
        best_s[:] = cur_s
        best_i[:] = cur_i
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)
    out_i_ref[:] = best_i[:]


@functools.lru_cache(maxsize=None)
def _build_dma(m: int, n: int, k: int, tile_m: int, tile_n: int,
               precision: str = DEFAULT_PRECISION):
    k_pad = round_up(k, 8)
    m_pad = round_up(m, tile_m)
    n_pad = round_up(n, tile_n)
    m_tiles = m_pad // tile_m
    n_tiles = n_pad // tile_n
    kernel = functools.partial(_dma_kernel, n=n, tile_n=tile_n,
                               n_tiles=n_tiles, precision=precision)

    call = pl.pallas_call(
        kernel,
        grid=(m_tiles,),
        in_specs=[
            pl.BlockSpec((tile_m, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM
        ],
        out_specs=pl.BlockSpec((tile_m, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, k_pad, tile_n), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((tile_m, 128), jnp.float32),
            pltpu.VMEM((tile_m, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=m_pad * k_pad * 4 + n_pad * k_pad * 4 + m_pad * 512,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )

    @jax.jit
    def run(search, ref):
        q = jnp.pad(search, ((0, m_pad - m), (0, k_pad - k)))
        r = jnp.pad(ref, ((0, n_pad - n), (0, k_pad - k))).T
        cand = call(q, r)
        return _refine(search, ref, cand[:m], n)

    return run


def _dma_tiles(k: int, m: int, n: int) -> tuple[int, int]:
    """v5's own tile policy: wide staging slices are the point of the
    manual pipeline (bandwidth-bound streaming), so tile_n is NOT shrunk
    for wide k the way pick_tiles does for the runtime-managed kernels —
    the guard below delegates to v4 when the resulting explicit scratch
    would not fit scoped VMEM."""
    from tpu_knn.kernels.tuning import MAX_TILE_N, SCORE_TILE_BUDGET

    tile_m, _ = pick_tiles(k, m, n)
    budget = SCORE_TILE_BUDGET // (4 if n <= (1 << 17) else 1)
    tile_n = min(MAX_TILE_N, budget // tile_m, round_up(n, 128))
    return tile_m, max(128, (tile_n // 128) * 128)


def dma_knn(search, ref, *, tile_m: int | None = None,
            tile_n: int | None = None, precision: str | None = None):
    search = jnp.asarray(search, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    m, k = search.shape
    n = ref.shape[0]
    if tile_m is None or tile_n is None:
        tm, tn = _dma_tiles(k, m, n)
        tile_m = tile_m or tm
        tile_n = tile_n or tn
    if precision is None:
        from tpu_knn.kernels.fused import auto_precision

        precision = auto_precision(k, n)
    run = _build_dma(m, n, k, tile_m, tile_n, precision)
    return run(search, ref)


def v5_callback(k, m, n, search, ref):
    idx, _ = dma_knn(search, ref)
    return np.asarray(jax.device_get(idx), dtype=np.int32)


#: Scoped-VMEM budget for the kernel's explicit scratch (the v5e limit is
#: ~16 MB; leave headroom for the bf16 split temporaries in _score_tile).
V5_VMEM_BUDGET = 12 * 1024 * 1024


def _v5_guard(k: int, m: int, n: int) -> bool:
    """True when the explicit scratch fits scoped VMEM at the tile geometry
    dma_knn would pick — the analog of v5's texture-width precondition
    (reference core.cu:481-485): a real constraint that FAILS for wide k,
    delegating to v4's runtime-managed pipeline."""
    tile_m, tile_n = _dma_tiles(k, m, n)
    k_pad = round_up(k, 8)
    scratch = (
        2 * k_pad * tile_n * 4      # double-buffered r staging slices
        + tile_m * k_pad * 4        # VMEM-resident query tile
        + tile_m * tile_n * 4       # score tile (f32)
        + tile_m * 128 * 12         # running (score f32, idx i32) + out
    )
    return scratch <= V5_VMEM_BUDGET


register_version(
    "v5",
    v5_callback,
    "fused kernel with explicit HBM residency + manual double-buffered "
    "HBM->VMEM DMA staging (reference v5 texture path, core.cu:424-529)",
    guard=_v5_guard,
    fallback="v4",
)
