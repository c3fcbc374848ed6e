"""Tile-size selection for the fused kernels.

The reference picks launch geometry with hard-coded 32x32 tiles plus the
CUDA occupancy API (core.cu:736-740). On TPU the analogous knobs are the
Pallas block shapes; this table is the "occupancy" analog: static heuristics
shaped by VMEM capacity (~16 MB/core) and MXU/VPU tile granularity, refined
against measurements on v5e (see bench history in BENCH_DETAILS.json).
"""

from __future__ import annotations

from tpu_knn.utils.shapes import round_up

#: f32 sublane granularity; lane granularity is 128.
SUBLANE = 8
LANE = 128


def pick_tiles(k: int, m: int, n: int) -> tuple[int, int]:
    """Return (tile_m, tile_n) for the fused kernel.

    tile_m: cover all queries up to 256 rows per tile (the score tile
    tile_m*tile_n*4B must stay well under VMEM).
    tile_n: large tiles amortize DMA and grid overhead; bandwidth-bound
    small-m cases get wider n tiles.
    """
    tile_m = min(256, round_up(m, SUBLANE))
    if m <= 8:
        # Bandwidth-bound streaming: wide tiles, tiny score matrix.
        tile_n = 4096
    elif m <= 64:
        tile_n = 2048
    else:
        # Compute-bound: 256x1024 f32 score tile = 1 MB in VMEM.
        tile_n = 1024
    tile_n = min(tile_n, round_up(n, LANE))
    return tile_m, tile_n
