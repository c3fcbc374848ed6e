"""Tile-size selection for the fused kernels.

The reference picks launch geometry with hard-coded 32x32 tiles plus the
CUDA occupancy API (core.cu:736-740). On TPU the analogous knobs are the
Pallas block shapes; this table is the "occupancy" analog, set from a
measured sweep on v5e (2026-08-16, BENCH_DETAILS.json history):

- score-tile elements capped at 2^20 (4 MB f32): 512x2048 compiles and is
  fastest for m=1024 (6.24 ms at ds11); 1024x2048 and 512x4096 exceed the
  ~16 MB scoped-VMEM limit once double-buffered r tiles and bf16 split
  temporaries are added.
- bandwidth-bound small-m streams want the widest tiles: m=1 at n=2^24
  measured 3.9 ms (tile_n 4096) -> 3.3 (8192) -> 3.1 (16384).
"""

from __future__ import annotations

from tpu_knn.utils.shapes import round_up

#: f32 sublane granularity; lane granularity is 128.
SUBLANE = 8
LANE = 128

#: Max score-tile elements (tile_m * tile_n); 4 MB f32 measured safe.
SCORE_TILE_BUDGET = 1 << 20

#: Widest useful n tile (bandwidth-bound streaming).
MAX_TILE_N = 16384

#: Max elements of the (k_pad, tile_n) reference tile: it is double-
#: buffered by the Pallas pipeline and spawns bf16 split temporaries, so
#: wide k must shrink tile_n or the kernel exceeds the ~16 MB scoped-VMEM
#: limit (observed on v5e: k=2048 at tile_n=2048 -> "Ran out of memory in
#: memory space vmem", 16.24M > 16M).
OPERAND_TILE_BUDGET = 1 << 18


def pick_tiles(k: int, m: int, n: int, tile_m: int | None = None,
               wide: bool = False) -> tuple[int, int]:
    """Return (tile_m, tile_n) for the fused kernel.

    wide: the caller's score matmul is the packed single-pass dot, whose
    bf16 operands leave VMEM headroom for 2x wider score tiles (measured:
    512x8192 compiles and wins ~6% at ds11; bf16x3's f32 temps OOM there).
    """
    if tile_m is None:
        tile_m = min(512, round_up(m, SUBLANE))
    # One policy for every n: the widest proven-safe tiles. The former
    # short-n (n <= 2^17) quarter-budget/256-row rule came from a sweep
    # under the old refine-dominated pipeline; re-measured after the
    # top-T refine collapse (scripts/r12_probe_ds6b.py, v5e 2026-08-19)
    # the ordering is inverted — at (1024, 65536) the 256x1024 grid's
    # 256 cells cost ~0.6 us each in per-invocation overhead while the
    # whole reference read is ~3 us: 512x8192 wins 0.200 vs 0.271 ms
    # (k=3) and 0.210 vs 0.272 (k=16); every geometry from 256x2048 up
    # beats the old default.
    budget = SCORE_TILE_BUDGET
    if wide:
        budget *= 4
    tile_n = min(MAX_TILE_N, budget // tile_m)
    tile_n = min(tile_n, OPERAND_TILE_BUDGET // round_up(k, SUBLANE))
    tile_n = min(tile_n, round_up(n, LANE))
    tile_n = max(LANE, (tile_n // LANE) * LANE)
    return tile_m, tile_n
