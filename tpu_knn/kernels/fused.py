"""v3-v6 — the fused Pallas streaming 1-NN kernel.

The reference's key optimization arc (core.cu:231-643) fuses the distance
computation with the argmin so the m*n matrix never reaches main memory
(v3), fixes the memory layout for coalescing (v4's AoS->SoA transpose,
core.cu:315-330), and pins operands in specialized read-only memory spaces
(v5 texture, v6 constant). The TPU-native shape of each idea:

- fusion      -> one Pallas kernel: per (m-tile, n-tile) grid step, an MXU
                 matmul produces the score tile  s = ‖r‖² − 2·q·r  (the
                 ‖q‖² term is argmin-invariant and dropped), the VPU takes
                 the tile argmin, and a running (best, index) pair lives in
                 VMEM scratch across the sequential n sweep. HBM traffic is
                 exactly one read of R — the "blockwise attention" pattern
                 with (min, argmin) in place of running softmax.
- layout      -> v4 stores R as SoA (k, n): n rides the 128-wide lanes, k
                 the sublanes, so reference loads use full lanes and the
                 matmul contraction sits on the RHS sublane axis. v3 keeps
                 the AoS (n, k) layout to preserve the reference's
                 v3-vs-v4 capability distinction (and its measurable cost).
- memory space-> queries are VMEM-resident across the whole n sweep (their
                 block index map is constant in the n grid axis, so Pallas
                 fetches them once per m-tile) — v6's constant-memory
                 broadcast. v6 additionally keeps the *entire* query set
                 resident with a VMEM-budget guard and v4 fallback,
                 mirroring v6's k*m<=16384 guard (core.cu:603-607).

Tie-breaking matches v0 exactly: within a tile `jnp.argmin` returns the
first (lowest) column; across tiles the carry update is strict `<` and
tiles arrive in ascending n order; across m the rows are independent.

All kernels also emit the winning partial score s* so multi-level reducers
(v7 single-chip two-level, v8 cross-chip) can fold partials without
recomputing distances: s is comparable across reference shards because the
dropped ‖q‖² shift is per-query constant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_knn.engine.registry import register_version
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.platform import interpret_mode
from tpu_knn.utils.shapes import cdiv, round_up

#: v6 keeps the whole query set VMEM-resident; above this budget it falls
#: back to v4 (the analog of constant memory's 64 KB, scaled to VMEM).
V6_QUERY_VMEM_BYTES = 4 * 1024 * 1024


def _score_tile(q_tile, r_tile, *, soa: bool):
    """(tile_m, kp) x r-tile -> (tile_m, tile_n) scores ‖r‖²−2q·r.

    soa: r_tile is (kp, tile_n) (contraction on RHS sublanes);
    aos: r_tile is (tile_n, kp) (contraction on RHS lanes).
    """
    if soa:
        r_norm = jnp.sum(r_tile * r_tile, axis=0, keepdims=True)  # (1, tile_n)
        qr = jax.lax.dot_general(
            q_tile,
            r_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        r_norm = jnp.sum(r_tile * r_tile, axis=1)[None, :]  # (1, tile_n)
        qr = jax.lax.dot_general(
            q_tile,
            r_tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return r_norm - 2.0 * qr


def _fused_kernel(q_ref, r_ref, out_i_ref, out_s_ref, best_s, best_i, *,
                  n: int, tile_n: int, n_tiles: int, soa: bool):
    """Grid (m_tiles, n_tiles), n innermost; scratch carries the running
    (score, index) per query row across the n sweep."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, jnp.inf)
        best_i[:] = jnp.zeros_like(best_i)

    s = _score_tile(q_ref[:], r_ref[:], soa=soa)
    tile_m = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 1) + j * tile_n
    s = jnp.where(col < n, s, jnp.inf)

    tile_min = jnp.min(s, axis=1, keepdims=True)                    # (tile_m, 1)
    tile_arg = jnp.argmin(s, axis=1).astype(jnp.int32)[:, None]     # first min
    better = tile_min < best_s[:]  # strict: earlier (lower) index wins ties
    best_i[:] = jnp.where(better, tile_arg + j * tile_n, best_i[:])
    best_s[:] = jnp.where(better, tile_min, best_s[:])

    @pl.when(j == n_tiles - 1)
    def _():
        out_i_ref[:] = best_i[:]
        out_s_ref[:] = best_s[:]


@functools.lru_cache(maxsize=None)
def _build_fused(m_pad: int, n_pad: int, k_pad: int, n: int,
                 tile_m: int, tile_n: int, soa: bool):
    """Compile-cached fused pallas_call for padded shapes."""
    m_tiles = m_pad // tile_m
    n_tiles = n_pad // tile_n
    kernel = functools.partial(
        _fused_kernel, n=n, tile_n=tile_n, n_tiles=n_tiles, soa=soa
    )
    if soa:
        r_spec = pl.BlockSpec((k_pad, tile_n), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
        flops_k = k_pad
    else:
        r_spec = pl.BlockSpec((tile_n, k_pad), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        flops_k = k_pad

    call = pl.pallas_call(
        kernel,
        grid=(m_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_m, k_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            r_spec,
        ],
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_m, 1), jnp.float32),
            pltpu.VMEM((tile_m, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * flops_k,
            bytes_accessed=m_pad * k_pad * 4 + n_pad * k_pad * 4 + m_pad * 8,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )

    @jax.jit
    def run(q_padded, r_layout):
        out_i, out_s = call(q_padded, r_layout)
        return out_i[:, 0], out_s[:, 0]

    return run


def fused_knn(search, ref, *, soa: bool = True,
              tile_m: int | None = None, tile_n: int | None = None):
    """Run the fused kernel on (m,k)/(n,k) arrays.

    Returns (indices (m,) i32, partial scores (m,) f32) as device arrays.
    Padding: k zero-padded to a sublane multiple (distance-neutral), m to
    tile_m (extra rows dropped), n to tile_n (masked in-kernel with +inf).
    """
    search = jnp.asarray(search, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    m, k = search.shape
    n = ref.shape[0]
    if tile_m is None or tile_n is None:
        tm, tn = pick_tiles(k, m, n)
        tile_m = tile_m or tm
        tile_n = tile_n or tn
    k_pad = round_up(k, 8)
    m_pad = round_up(m, tile_m)
    n_pad = round_up(n, tile_n)

    q = jnp.pad(search, ((0, m_pad - m), (0, k_pad - k)))
    r = jnp.pad(ref, ((0, n_pad - n), (0, k_pad - k)))
    if soa:
        # v4's mat_inv analog: one XLA transpose into (k, n) so n rides the
        # lanes (reference core.cu:315-330; README.md:105-111).
        r = r.T
    run = _build_fused(m_pad, n_pad, k_pad, n, tile_m, tile_n, soa)
    idx, score = run(q, r)
    return idx[:m], score[:m]


def _to_host(idx) -> np.ndarray:
    return np.asarray(jax.device_get(idx), dtype=np.int32)


def v3_callback(k, m, n, search, ref):
    idx, _ = fused_knn(search, ref, soa=False)
    return _to_host(idx)


def v4_callback(k, m, n, search, ref):
    idx, _ = fused_knn(search, ref, soa=True)
    return _to_host(idx)


def v6_callback(k, m, n, search, ref):
    # Whole query set resident per n-sweep is what the (i, 0) index map
    # already achieves per tile; v6's distinct capability is covering all
    # of m in ONE tile so queries are fetched exactly once.
    tile_m = round_up(m, 8)
    idx, _ = fused_knn(search, ref, soa=True, tile_m=tile_m)
    return _to_host(idx)


register_version(
    "v3",
    v3_callback,
    "fused Pallas streaming kernel, AoS reference layout "
    "(reference v3, core.cu:231-312)",
)
register_version(
    "v4",
    v4_callback,
    "fused Pallas streaming kernel, SoA (k,n) layout via one XLA transpose "
    "(reference v4, core.cu:313-423)",
)
register_version(
    "v6",
    v6_callback,
    "fused kernel with the whole query set VMEM-resident for the n sweep "
    "(reference v6 constant-memory broadcast, core.cu:530-643)",
    guard=lambda k, m, n: round_up(m, 8) * round_up(k, 8) * 4 <= V6_QUERY_VMEM_BYTES,
    fallback="v4",
)
