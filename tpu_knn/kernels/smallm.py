"""Small-batch (m <= 4) diff-form VPU streaming 1-NN kernel.

The reference's m=1 problem (v7's whole reason to exist, core.cu:644-789:
a single query must still saturate the machine) is bandwidth-bound on TPU:
at m=1 the scan must read the whole reference set once and does almost no
arithmetic. The fused MXU kernel (fused.py) is the wrong tool there — its
packed dot spends ~16x redundant per-element VPU work on bf16 splits and
term concatenation while the MXU runs at 8/128-row utilization. This
kernel is the m-small specialization:

- DIFF-FORM VPU scores: exact f32 (r - q)^2 sums per reference column —
  ~3*k_pad VPU ops per operand element per query, no MXU pass, no bf16
  splits, no norm trick — so there is no catastrophic-cancellation term
  and candidate scores are already at oracle conditioning.
- SAME SoA (k_pad, n_pad) operand as the fused kernel: k on sublanes, n
  on lanes. This is also the hardware-natural layout — XLA stores
  (n, k<=16) f32 arrays column-major ({0,1} minor-to-major) on TPU, and
  any AoS-side repacking is a full relayout copy (a lane-packed variant
  was measured into an 8 GB padded-layout blowup at (2^24, 3); see
  docs/PERF_NOTES.md). Reusing the fused operand also means NNIndex's
  prepared `r_ops` serves both kernels with zero extra HBM.
- The running (best, index) pair is a per-lane (1, 128) row per query in
  VMEM scratch, folded with the shared `_fold_scores` (strict <, earliest
  column wins = lowest reference index per lane slot — v0's tie rule,
  core.cu:50-54). The final cross-lane selection is the shared exact
  rerank (fused._exact_rerank).

Applicability: 1 <= m <= 4 and k <= 32 — exactly the regime where the
packed single-pass dot also applies, so the prepared operand is always
the plain f32 SoA array. fused_knn routes here automatically; explicit
tile/precision overrides keep the MXU path (measurement intent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_knn.utils.platform import interpret_mode
from tpu_knn.utils.shapes import round_up

_I32_MAX = np.int32(2**31 - 1)

#: Largest batch the kernel serves; beyond this the per-query VPU sweep
#: (~3*k_pad ops per operand element per query) loses to the MXU path.
SMALLM_MAX_M = 4

#: Largest k (matches the packed dot's fit: 4 * round_up(k, 8) <= 128, so
#: NNIndex's prepared operand is always the plain f32 SoA array here).
SMALLM_MAX_K = 32

#: Reference-tile VMEM budget in f32 elements (k_pad * tile_n); 2 MB per
#: buffer leaves room for double buffering plus the per-query diff temp.
OPERAND_BUDGET = 1 << 19


def pick_tile_n(k: int, n: int) -> int:
    """Widest tile inside the VMEM budget (bandwidth-bound: wider is
    better; measured on v5e, 65536 > 32768 > 16384 > 8192 at k=3 n=2^24)."""
    k_pad = round_up(k, 8)
    tile_n = min(1 << 16, OPERAND_BUDGET // k_pad)
    tile_n = min(tile_n, round_up(n, 128))
    return max(128, (tile_n // 128) * 128)


def _smallm_kernel(q_ref, r_ref, out_i_ref, out_s_ref, best_s, best_i, *,
                   m: int, n: int, tile_n: int, n_tiles: int):
    from tpu_knn.kernels.fused import _fold_scores

    j = pl.program_id(0)
    ragged = n_tiles * tile_n != n

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, jnp.inf)
        best_i[:] = jnp.full_like(best_i, _I32_MAX)

    r = r_ref[:]  # (k_pad, tile_n); zero-padded rows are distance-neutral
    for i in range(m):
        diff = r - q_ref[:, i:i + 1]
        s = jnp.sum(diff * diff, axis=0, keepdims=True)  # (1, tile_n) exact
        if ragged:
            col = (jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
                   + j * tile_n)
            s = jnp.where(col < n, s, jnp.inf)
        cur_s, cur_i = _fold_scores(s, j * tile_n,
                                    best_s[i:i + 1, :], best_i[i:i + 1, :])
        best_s[i:i + 1, :] = cur_s
        best_i[i:i + 1, :] = cur_i

    @pl.when(j == n_tiles - 1)
    def _():
        out_i_ref[:] = best_i[:]
        out_s_ref[:] = best_s[:]


@functools.lru_cache(maxsize=None)
def _build_smallm_candidates(m: int, n: int, k: int,
                             tile_n: int | None = None):
    """(search (m,k), (SoA ref operand,)) -> (m, 128) candidate indices.

    The operand contract matches fused's prep_soa output: (k_pad, n_ops)
    f32 with k_pad = round_up(k, 8) and n_ops >= n any lane padding (the
    kernel masks columns >= n, so an operand padded for a DIFFERENT tiling
    — e.g. NNIndex's — is served as-is). ``prep`` builds one from an
    (n, k) array.
    """
    if not (1 <= m <= SMALLM_MAX_M):
        raise ValueError(
            f"smallm kernel serves 1 <= m <= {SMALLM_MAX_M}, got {m}")
    if not (1 <= k <= SMALLM_MAX_K):
        raise ValueError(
            f"smallm kernel serves 1 <= k <= {SMALLM_MAX_K}, got {k}")
    if tile_n is None:
        tile_n = pick_tile_n(k, n)
    if tile_n % 128 != 0 or tile_n <= 0:
        raise ValueError(f"tile_n must be a positive multiple of 128, "
                         f"got {tile_n}")
    k_pad = round_up(k, 8)
    n_pad = round_up(n, tile_n)
    n_tiles = n_pad // tile_n
    m_out = 8  # one sublane group of output rows; top m are real

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
        out_specs=[pl.BlockSpec((m_out, 128), lambda j: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((m_out, 128), jnp.int32),
                   jax.ShapeDtypeStruct((m_out, 128), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((m_out, 128), jnp.float32),
            pltpu.VMEM((m_out, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * m * n_pad * k_pad,
            bytes_accessed=n_pad * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )

    def prep(ref):
        """(n, k) f32 -> the (k_pad, n_pad) SoA operand (= fused prep_soa)."""
        return (jnp.pad(ref, ((0, n_pad - n), (0, k_pad - k))).T,)

    def candidates(search, ref_ops):
        (r_op,) = ref_ops
        if r_op.shape[0] != k_pad or r_op.shape[1] < n:
            raise ValueError(
                f"operand shape {r_op.shape} does not cover (k_pad={k_pad}, "
                f"n={n})")
        if r_op.shape[1] != n_pad:
            # Serve an operand padded for a different tiling (NNIndex's):
            # rebuild this geometry at the widest tile dividing its width.
            width = r_op.shape[1]
            t = min(tile_n, width)
            while width % t != 0:
                t -= 128
            if round_up(n, t) != width:
                raise ValueError(
                    f"operand width {width} incompatible with n={n} at any "
                    f"tile <= {tile_n}")
            return _build_smallm_candidates(m, n, k, tile_n=t)(
                search, ref_ops)
        q = jnp.pad(search.T, ((0, k_pad - k), (0, 128 - m)))
        ci, cs = call(q, r_op)
        return ci[:m], cs[:m]

    candidates.prep = prep
    candidates.tile_n = tile_n
    return candidates


@functools.lru_cache(maxsize=None)
def _build_smallm(m: int, n: int, k: int, tile_n: int | None = None):
    """Per-call pipeline: SoA layout + candidates + exact refinement in
    one jit (single device dispatch)."""
    from tpu_knn.kernels.fused import _refine, select_cutoff

    cand = _build_smallm_candidates(m, n, k, tile_n)
    cutoff = select_cutoff("exact", k)  # diff-form scores: always certified

    @jax.jit
    def run(search, ref):
        return _refine(search, ref, cand(search, cand.prep(ref)), n,
                       cutoff=cutoff)

    return run


def smallm_knn(search, ref, *, tile_n: int | None = None):
    """Small-batch exact 1-NN: (m<=4, k<=32) queries against (n, k) refs.

    Returns (indices (m,) i32, exact squared distances (m,) f32); same
    contract and tie semantics as fused_knn (lowest index among exact
    ties), with candidate selection already at diff-form conditioning.
    """
    search = jnp.asarray(search, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    m, k = search.shape
    n = ref.shape[0]
    run = _build_smallm(m, n, k, tile_n)
    return run(search, ref)


def smallm_applicable(m: int, k: int, n: int) -> bool:
    """Dispatch predicate: the regime where this kernel beats the fused
    MXU path (small batch, any n, k within the packed-operand range)."""
    return 1 <= m <= SMALLM_MAX_M and 1 <= k <= SMALLM_MAX_K and n >= 1
