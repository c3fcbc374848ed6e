"""Exact top-K nearest neighbors — a serving extension beyond the
reference's 1-NN contract (core.h:71 returns a single argmin per query;
production NN services almost always want the K nearest).

Three engines, differentially tested against each other:

- "sweep" (auto-selected in the serving regime, m*K <= SWEEP_AUTO_BUDGET
  and K <= SWEEP_MAX_NEIGHBORS): per-lane sorted K-deep (score, index)
  state in VMEM scratch. Each incoming 128-wide score chunk runs a
  K-level compare-exchange insertion chain; a tile-level skip guard
  (`pl.when` on "any element beats some lane's current k-th best") lets
  tiles that cannot improve the state pay one compare per element.
  Two variants: m <= 4 runs a bound-seeded TWO-PASS diff-form pipeline
  (per-lane top-1 pass -> provable K-th-score bound B -> K-state pass
  seeded at (B, I32_MAX), making the guard reject almost every tile;
  ~2 reference reads, near-K-independent); larger m runs the single MXU
  sweep (one read; insertion amortized across tile_m query rows).
- "seeded" (the batch regime, m*K > SWEEP_AUTO_BUDGET, K <= 512): the
  round-3 MOMENT-EXTRACTION engine. A 1-NN pre-pass bounds each row's
  global K-th score; one thresholded scan then emits exact integer
  moments (cnt, sum(l), sum(l^2)) per (row, 128/256-lane cell) of the
  qualifying-lane set — computed ON THE MXU as one bf16 matmul of the
  qualifier mask against a block-diagonal weight operand — from which
  cells with <= 2 qualifiers are solved EXACTLY outside the kernel
  (perfect-square discriminant); candidates are compacted with a
  positional Pallas kernel (prefix count on the MXU + slot scatter,
  _cell_compact_kernel) and sorted by exact (d2, index). Dense adversarial cells
  (>= 3 qualifiers) are certified detectable and lax.cond-fall back to
  "passes". ~2 reference reads per 64 results at ANY K (cubic moment
  recovery past K=16, 128-lane cells + part-split compaction past
  K=32, half-open score-band ROUNDS past K=64 — _build_seeded_rounds);
  selection is by EXACT
  distance over a certified superset of the approx-score top-K —
  strictly tighter conditioning than the score-selected engines.
  Design history and measurements: docs/PERF_NOTES.md "Round-3".
- "passes": K lexicographically-banded 1-NN sweeps. Pass j re-runs the
  fused candidate kernel with every element whose (score, index) is
  lex-<= the previous pass's reported (score, index) masked out BEFORE
  the per-lane fold (fused._fused_banded_kernel). Because the bound is
  the reported point's score from the SAME kernel arithmetic, the
  comparison is approx-vs-approx and bit-exact: the reported point's lane
  yields its runner-up on the next pass, so per-lane top-1 state suffices
  for any K <= PASSES_MAX_NEIGHBORS. Cost: K full reference reads — the
  large-K path, the seeded engine's certified fallback, and the
  independent implementation the other engines are tested against.

All engines report the K nearest under v0's tie rule: sweep/passes
enumerate lex-smallest (kernel-score, index) — the reported set matches
the true top-K unless an approximate-score inversion crosses the K
boundary (the 1-NN engine's tolerance class) — while seeded selects by
exact (d2, index) over a superset bounded in score space. Returned
distances are always exact f32 diff-form, rows ascending by exact
(d2, index) (core.cu:50-54 extended to K results).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_knn.kernels.fused import (
    _build_banded_candidates, _build_minima_candidates, _score_tile,
    _I32_MAX, auto_precision,
)
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.platform import interpret_mode
from tpu_knn.utils.shapes import round_up

#: Largest K served by the default ("auto"/"sweep"-eligible) contract;
#: bounds compile size and keeps the designs honest about their regime.
MAX_NEIGHBORS = 128

#: Absolute ceiling, served by the K-pass banded engine only (its state
#: is one (m, 1) bound regardless of K; cost is K full reference reads —
#: a completeness escape hatch, not a fast path). Bounds the length-K
#: lax.scan's compile size.
PASSES_MAX_NEIGHBORS = 512

#: Largest K the single-sweep engine serves: the per-lane K-state costs
#: K * tile_m KiB of VMEM scratch (f32+i32) plus an equally-sized output
#: block, and the insertion chain is K compare-exchanges per non-skipped
#: chunk; past this the K-pass engine's linear cost is the better trade.
SWEEP_MAX_NEIGHBORS = 32

#: Largest K one extraction ROUND serves. K <= 32 uses 256-lane cells
#: (quadratic recovery to 16, cubic beyond); 32 < K <= 64 drops to
#: 128-lane cells so <= 3 qualifiers per cell stays typical
#: (cubic-solvable) and compacts with a 4-way part split (total
#: capacity 192; the split also quarters the positional compactor's
#: per-part slot-loop cost — see _cell_compact_kernel). Past 64 the
#: single-round pass-1 bound (K-th of 128 per-lane minima) goes too
#: loose — at K=128 it admits ~1373 qualifiers/row and 5-deep cells
#: (not cubic-solvable; r6_probe_k64) — so K > 64 runs ceil(K/64)
#: ROUNDS: round r owns the half-open SCORE band (B_{r-1}, B_r] (a
#: partition of the reference by the kernel's own scores — nothing
#: lost or double-counted), each band bounded by its own banded 1-NN
#: pre-pass, so qualifier density per round stays at the K=64 level
#: at ANY K. ~2 reference reads per 64 results vs the passes engine's
#: one read PER result.
SEEDED_ROUND_K = 64

#: Largest K the seeded engine serves (multi-round); the banded passes
#: engine remains the certified fallback at every K.
SEEDED_MAX_NEIGHBORS = PASSES_MAX_NEIGHBORS

#: Extraction tile width for the 8-field 128-lane-cell (K > 32) mode.
#: The moment matmul's output width is n_fields * tile_n / cell columns
#: and the MXU pads output lanes to 128, so 2048 (8 * 16 = 128 cols) is
#: the per-element minimum — 4096's 256 columns double the moment MXU
#: work (tile sweep: scripts/r15_profile_seeded.py).
EXTRACT_TILE_N_CUBIC = 2048

#: Extraction tile width for the 64-lane-cell single-band K <= 128
#: mode. 1024 halves the moment-matmul columns (128 vs 256) but loses
#: end to end to per-tile overhead: K=128 13.70 ms at 1024 vs 13.36 at
#: 2048 (scripts / r4 probe_band sweep).
EXTRACT_TILE_N_HEX = 2048

#: Extraction tile maxima for the 4-field 256-lane-cell (K <= 16) and
#: 8-field 256-lane-cell (16 < K <= 32) modes, and the extraction
#: tile_m. Sweepable module constants (probes retune them; the engine
#: builder reads them at build time).
EXTRACT_TILE_N_QUAD = 8192
EXTRACT_TILE_N_OCT = 4096
EXTRACT_TILE_M = 256

#: Extraction tile_m for the K > 32 cubic mode: 512 measured 8.57 ms vs
#: 9.05 at 256 end-to-end (K=64, scripts/r19_tile_resweep.py) — the
#: packed 128-col output halves the per-row store overhead. Quad/oct
#: keep 256 (512x8192 crashes the Mosaic compile; r3 tile sweeps).
EXTRACT_TILE_M_CUBIC = 512

#: Auto-routing boundary, measured on v5e at n=2^20, k=16: the sweep's
#: insertion fold costs ~K compare-exchanges per score element over
#: tile_m rows — it wins only the small-batch regime (m=8/K=8: 0.354 ms
#: vs seeded 0.9-class pipelines' fixed two-scan cost; m=32/K=8 sweep
#: 0.930 vs seeded 1.695). Past m*K = 256 the extraction engine wins
#: everywhere (m=64/K=8: 0.91 vs sweep 2.40 vs passes 1.45; m=1024/K=8:
#: ~10 vs passes 23.9 — PERF_NOTES "Round-3").
SWEEP_AUTO_BUDGET = 256

#: Seeded-engine batches beyond 2x this many rows split into sub-batches
#: of this size. Historically load-bearing (the r4 top_k-era compaction
#: degraded nonlinearly in m: unsplit m=4096 cost 12x m=1024); with the
#: r7 Pallas positional compactor the re-measurement is a wash (m=4096
#: K=8: chunked 28.4 ms vs unsplit 29.2; K=32: 37.1 vs 36.7 —
#: scripts/r7_probe_mbig.py), and chunking is kept because one compiled
#: 1024-row pipeline then serves every m that is a multiple of it.
SEEDED_CHUNK_ROWS = 1024


def _auto_method(m: int, kk: int) -> str:
    if kk <= SWEEP_MAX_NEIGHBORS and m * kk <= SWEEP_AUTO_BUDGET:
        return "sweep"
    if kk <= SEEDED_MAX_NEIGHBORS:
        # Batch regime: the bound-seeded extraction engine (~2 reference
        # reads + moment recovery) replaces the K-pass engine's K full
        # reads (measurements: docs/PERF_NOTES.md "Round-3").
        return "seeded"
    return "passes"


def _kstate_insert(ls, li, new_s, new_i, kk: int):
    """One compare-exchange insertion of a (rows, 128) chunk into the
    per-lane sorted K-lists. The displaced worst element cascades down
    and the K+1-th falls out, preserving the sorted lex invariant.

    In-lane ties (new_s == ls[l]) need the index clause only for CASCADED
    elements: fresh elements arrive in ascending col order, but a
    displaced equal-score element carries a lower col than deeper levels
    may hold."""
    ls, li = list(ls), list(li)
    for l in range(kk):
        beats = (new_s < ls[l]) | ((new_s == ls[l]) & (new_i < li[l]))
        old_s, old_i = ls[l], li[l]
        ls[l] = jnp.where(beats, new_s, old_s)
        li[l] = jnp.where(beats, new_i, old_i)
        new_s = jnp.where(beats, old_s, new_s)
        new_i = jnp.where(beats, old_i, new_i)
    return tuple(ls), tuple(li)


def _sweep_kernel(q_ref, r_ref, out_s_ref, out_i_ref, s_buf, *state, kk: int,
                  n: int, tile_n: int, n_tiles: int, precision: str):
    """Grid (m_tiles, n_tiles), n innermost. `state` is kk (score, index)
    scratch pairs: state[2l] / state[2l+1] hold each lane's l-th smallest
    (score, col) seen so far, sorted ascending in l by lex (score, col).

    Per tile: score via the shared MXU path, then — only when some
    element could enter some lane's list (the skip guard) — a K-level
    compare-exchange insertion per 128-wide chunk. The displaced worst
    element cascades down and the K+1-th falls out, preserving the sorted
    invariant. Emits the (tile_m, kk*128) per-lane candidate lists.

    s_buf stages the score tile in VMEM so the chunk loop can be a
    fori_loop over dynamic 128-lane loads (Mosaic lowers pl.ds on refs
    but not dynamic_slice on values)."""
    j = pl.program_id(1)
    s_refs = state[0::2]
    i_refs = state[1::2]

    @pl.when(j == 0)
    def _():
        for l in range(kk):
            s_refs[l][:] = jnp.full_like(s_refs[l], jnp.inf)
            i_refs[l][:] = jnp.full_like(i_refs[l], _I32_MAX)

    s = _score_tile(q_ref[:], r_ref[:], soa=True, precision=precision)
    tile_m = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 1) + j * tile_n
    s = jnp.where(col < n, s, jnp.inf)

    # Skip guard: can ANY element enter ANY lane's list? An element enters
    # lane c's list iff (s, col) lex-< that lane's current k-th (worst)
    # entry; `s <= worst` is the conservative superset (lex ties on the
    # score included). At j == 0 worst is +inf, so the first tile always
    # inserts.
    worst = s_refs[kk - 1][:]                       # (tile_m, 128)
    chunks = tile_n // 128
    hit = jnp.any(s.reshape(tile_m, chunks, 128) <= worst[:, None, :])

    @pl.when(hit)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_m, 128), 1)
        s_buf[:] = s

        # fori_loop (not a Python unroll): chunks * kk unrolled insertion
        # steps produce multi-thousand-op programs that stall both XLA:CPU
        # (interpret tests) and Mosaic compiles; the loop keeps the program
        # O(kk) with the 2*kk lane-lists as carry.
        def body(c, carry):
            # A chunk-level any-improvement lax.cond was tried here and
            # REGRESSED 4x (m=1, n=2^24: 5.3 -> 22.4 ms): a data-dependent
            # branch per 128-lane chunk stalls the VPU pipeline for far
            # more than the K compare-exchanges it saves. The tile-level
            # pl.when guard above is the right granularity.
            ls, li = carry
            new_s = s_buf[:, pl.ds(c * 128, 128)]
            new_i = lane + (j * tile_n + c * 128)
            return _kstate_insert(ls, li, new_s, new_i, kk)

        ls, li = jax.lax.fori_loop(
            0, chunks,
            body,
            (tuple(r[:] for r in s_refs), tuple(r[:] for r in i_refs)),
        )
        for l in range(kk):
            s_refs[l][:] = ls[l]
            i_refs[l][:] = li[l]

    @pl.when(j == n_tiles - 1)
    def _():
        out_s_ref[:] = jnp.concatenate([r[:] for r in s_refs], axis=1)
        out_i_ref[:] = jnp.concatenate([r[:] for r in i_refs], axis=1)


def _smallm_topk_kernel(q_ref, r_ref, bs_ref, out_s_ref, out_i_ref, s_buf,
                        *state,
                        m: int, kk: int, n: int, tile_n: int, n_tiles: int):
    """Small-batch variant: diff-form VPU scores (kernels/smallm.py — no
    MXU packed-dot prep overhead at 8/128-row utilization) feeding the
    same per-lane K-state insertion as _sweep_kernel. Queries arrive
    transposed (k_pad, 128) like the smallm 1-NN kernel; rows >= m of the
    state are garbage and sliced off outside.

    BOUND SEEDING makes this pass near-K-independent: the K-state levels
    initialize to (bs_ref row, I32_MAX) — a per-query upper bound B on
    the global K-th score, obtained from a preceding per-lane top-1 pass
    (the K-th smallest of 128 distinct lane minima is >= the global
    K-th). Only elements lex-< (B, I32_MAX), i.e. score <= B, can enter,
    so the tile-level skip guard rejects almost every tile outright and
    the insertion chain runs ~K times total instead of per tile. The
    sentinel (B, I32_MAX) entries that survive in underfilled lanes are
    invalid indices and lose the final merge."""
    j = pl.program_id(0)
    s_refs = state[0::2]
    i_refs = state[1::2]

    @pl.when(j == 0)
    def _():
        for l in range(kk):
            s_refs[l][:] = bs_ref[:]
            i_refs[l][:] = jnp.full_like(i_refs[l], _I32_MAX)

    # (k_pad, tile_n); zero-padded rows are distance-neutral. bf16-stored
    # operands upcast at the read (exact — quantized-point semantics).
    r = r_ref[:].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1) + j * tile_n
    hit = jnp.bool_(False)
    worst = s_refs[kk - 1][:]
    chunks = tile_n // 128
    for i in range(m):
        diff = r - q_ref[:, i:i + 1]
        s = jnp.sum(diff * diff, axis=0, keepdims=True)  # (1, tile_n) exact
        s = jnp.where(col < n, s, jnp.inf)
        s_buf[i:i + 1, :] = s
        hit = hit | jnp.any(
            s.reshape(1, chunks, 128)
            <= worst[i:i + 1, :].reshape(1, 1, 128))

    @pl.when(hit)
    def _():
        tile_m = worst.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_m, 128), 1)

        def body(c, carry):
            ls, li = carry
            new_s = s_buf[:, pl.ds(c * 128, 128)]
            new_i = lane + (j * tile_n + c * 128)
            return _kstate_insert(ls, li, new_s, new_i, kk)

        ls, li = jax.lax.fori_loop(
            0, chunks, body,
            (tuple(rr[:] for rr in s_refs), tuple(rr[:] for rr in i_refs)),
        )
        for l in range(kk):
            s_refs[l][:] = ls[l]
            i_refs[l][:] = li[l]

    @pl.when(j == n_tiles - 1)
    def _():
        out_s_ref[:] = jnp.concatenate([rr[:] for rr in s_refs], axis=1)
        out_i_ref[:] = jnp.concatenate([rr[:] for rr in i_refs], axis=1)


@functools.lru_cache(maxsize=None)
def _build_smallm_topk_candidates(m: int, n: int, k: int, kk: int,
                                  tile_n: int | None = None,
                                  n_ops: int | None = None):
    """(search (m,k), SoA ref ops) -> (idx (m, kk*128), score (m, kk*128)):
    per-lane K-deep candidate lists from one diff-form sweep (m <= 4,
    k <= 32 — the smallm regime). Scores are exact f32 diff-form, so the
    final per-rank distances equal the selection scores."""
    from tpu_knn.kernels.smallm import (
        SMALLM_MAX_K, SMALLM_MAX_M, pick_tile_n,
    )

    if not (1 <= m <= SMALLM_MAX_M and 1 <= k <= SMALLM_MAX_K):
        raise ValueError(f"smallm top-K serves m <= {SMALLM_MAX_M}, "
                         f"k <= {SMALLM_MAX_K}; got m={m}, k={k}")
    if not 1 <= kk <= SWEEP_MAX_NEIGHBORS:
        raise ValueError(f"sweep engine serves K in [1, {SWEEP_MAX_NEIGHBORS}]")
    if tile_n is None:
        tile_n = pick_tile_n(k, n)
    k_pad = round_up(k, 8)
    n_pad = n_ops if n_ops is not None else round_up(n, tile_n)
    if n_pad < n:
        raise ValueError(f"operand width {n_pad} < n={n}")
    tile_n = min(tile_n, n_pad)
    while n_pad % tile_n != 0:
        tile_n -= 128
    n_tiles = n_pad // tile_n
    m_out = 8
    out_spec = pl.BlockSpec((m_out, kk * 128), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_smallm_topk_kernel, m=m, kk=kk, n=n,
                          tile_n=tile_n, n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k_pad, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_out, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((m_out, kk * 128), jnp.float32),
                   jax.ShapeDtypeStruct((m_out, kk * 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((m_out, tile_n), jnp.float32)]
                       + [pltpu.VMEM((m_out, 128), dt)
                          for _ in range(kk)
                          for dt in (jnp.float32, jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * m * n_pad * k_pad,
            bytes_accessed=n_pad * k_pad * 4 + m_out * kk * 1024,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )

    def prep_soa(ref):
        return (jnp.pad(ref, ((0, n_pad - n), (0, k_pad - k))).T,)

    def candidates(search, ref_ops, bound_s):
        """bound_s (m, 1) f32: per-query upper bound on the global K-th
        score (see kernel docstring)."""
        (r_op,) = ref_ops
        if r_op.shape != (k_pad, n_pad):
            raise ValueError(
                f"operand shape {r_op.shape} != ({k_pad}, {n_pad})")
        q = jnp.pad(search.T, ((0, k_pad - k), (0, 128 - m)))
        bs = jnp.broadcast_to(
            jnp.pad(bound_s, ((0, m_out - m), (0, 0)),
                    constant_values=jnp.inf), (m_out, 128))
        cs, ci = call(q, r_op, bs)
        return ci[:m], cs[:m]

    candidates.prep_soa = prep_soa
    return candidates


#: Moment fields emitted per cell, in column order. Every weight value
#: is an integer <= 255, hence EXACTLY representable in bf16 (8
#: significand bits cover integers to 2^8), so each mask-weight product
#: on the MXU is exact and the f32 accumulators stay exact (cell sums
#: < 2^24). The 4-field mode emits cnt, sum(l), sum(l^2) (two base-256
#: digits) and solves cells of <= 2 qualifiers; the 8-field mode adds
#: sum(l^3) (three digits, one pad column) and solves <= 3.
_EXTRACT_FIELDS = 4
_EXTRACT_FIELDS_CUBIC = 8


def _solvable_for(n_fields: int) -> int:
    """Qualifiers per cell the root recovery can solve exactly for a
    field mode — the ONE source for both the in-kernel overflow
    certificate and the recovery path's assumption (ADVICE r4: the
    kernel used to hardcode its flags, risking desync with
    _solve_cells)."""
    return 2 if n_fields == _EXTRACT_FIELDS else 3


def _extract_mode(tile_n: int, kk: int) -> tuple[int, int]:
    """(cell lane width, field count) for the extraction kernel.

    256-lane cells halve both the moment-matmul width and the
    compaction input, but QUADRUPLE the chance some cell collects more
    qualifiers than the moments can solve (the certified-fallback
    trigger scales as cell^2 per row). K <= 16 keeps qualifier counts
    low enough that 4 fields (quadratic recovery, <= 2 per cell) are
    safe at 256 lanes (<~1e-4 fallback/batch at ds11 scale). K > 16
    (~50 qualifiers/row at K=32) would trip the quadratic trigger on
    essentially every batch (measured: 103 ms passes fallback per
    probe batch); it emits 8 fields including sum(l^3) and solves
    <= 3 per cell exactly, pushing the trigger to a 4-qualifier cell
    (~3e-3/batch). K > 32 (~110 qualifiers/row at K=64) drops BACK to
    128-lane cells: 256-lane cells would hold 4+ qualifiers routinely,
    while 128-lane cells keep the cubic solver viable (max cnt 3 over
    32 perturbed reps at K=48/64 — r6_probe_k64) and the extraction
    matmul is slightly cheaper (6.99 vs 7.56 ms at (256,4096))."""
    if kk > 64:
        # Single-band K <= 128 (see _build_topk): ~2K+16 qualifiers
        # would put 4+ in some 128-lane cell nearly every batch; 64-lane
        # cells keep the cubic solver viable (expected 4+-qualifier
        # cells ~0.05/call at K=128, n=2^20) and every moment still
        # fits the packed int32 layout (e1 <= 189 < 2^10,
        # p2 <= 11907 < 2^18, p3 <= 750141 exact in 3 digits).
        return 64, _EXTRACT_FIELDS_CUBIC
    if kk > 32:
        return 128, _EXTRACT_FIELDS_CUBIC
    if kk <= 16 and tile_n <= 2048 and tile_n % 64 == 0:
        # Embedding-scale k (the narrow tile_n is the VMEM budget's
        # signature for k > 32): a 3-qualifier cell costs a whole-cell
        # expansion into the exact rerank, and at wide k each expanded
        # column gathers k floats — 64-lane cells cut the overflow
        # probability 64x AND the expansion width 4x (the r5 prefix
        # bound's ~2x census made 256-lane overflow a per-batch coin
        # flip: ~6 ms of expanded rerank at k=128, r21/k128_amp probes).
        # The packed layout only relaxes (e1 <= 189, p2 <= 11907).
        return 64, _EXTRACT_FIELDS
    if tile_n % 256 == 0:
        return 256, (_EXTRACT_FIELDS if kk <= 16 else
                     _EXTRACT_FIELDS_CUBIC)
    return 128, (_EXTRACT_FIELDS if kk <= 16 else _EXTRACT_FIELDS_CUBIC)


def _moment_weights(tile_n: int, cell: int,
                    n_fields: int = _EXTRACT_FIELDS) -> np.ndarray:
    """Block-diagonal (tile_n, n_fields * tile_n // cell) bf16 weight
    matrix: input lane r belongs to cell r // cell with in-cell id
    l = r % cell; its nonzero entries are the n_fields weights at
    columns field * (tile_n // cell) + r // cell — FIELD-MAJOR so the
    kernel can slice each field's cell group contiguously and pack the
    digits in-kernel (the interleaved layout forced a 2x-wider f32
    output plus strided XLA unpack/repack passes over ~270 MB at the
    K=64 ds11 geometry)."""
    l = np.arange(tile_n, dtype=np.int64)
    c = l // cell
    li = l % cell
    cols = [
        np.ones_like(li),          # cnt
        li,                        # sum(l); l <= 255, bf16-exact
        (li * li) >> 8,            # sum(l^2) high byte
        (li * li) & 255,           # sum(l^2) low byte
    ]
    if n_fields == _EXTRACT_FIELDS_CUBIC:
        cols += [
            (li ** 3) >> 16,         # sum(l^3) byte 2 (l^3 < 2^24)
            ((li ** 3) >> 8) & 255,  # sum(l^3) byte 1
            (li ** 3) & 255,         # sum(l^3) byte 0
            np.zeros_like(li),       # pad to a power-of-two width
        ]
    elif n_fields != _EXTRACT_FIELDS:
        raise ValueError(f"unsupported field count {n_fields}")
    fields = np.stack(cols, axis=1).astype(np.float32)
    cpt = tile_n // cell
    w = np.zeros((tile_n, n_fields * cpt), np.float32)
    for f in range(n_fields):
        w[l, f * cpt + c] = fields[:, f]
    return w.astype(jnp.bfloat16)


def _extract_moment_kernel(q_ref, r_ref, bs_ref, *rest,
                           n: int, n_pad: int, tile_m: int, tile_n: int,
                           cell: int, n_fields: int, precision: str,
                           banded: bool = False, emit_rem: bool = False):
    """Bound-thresholded EXTRACTION sweep — the batch-regime top-K
    engine (VERDICT r2 item 1), fourth design iteration.

    Why not a per-lane K-state? The compare-exchange insertion chain
    runs at ~1/5 the VPU's simple-op rate (measured: the unbounded
    sweep needs 58 ms at (16,1024,2^20,K=8)), and with hundreds of
    query rows sharing each chunk guard, SOME row qualifies in ~25% of
    chunks even under bound seeding — chain variants bottomed out at
    15.2 ms (queue/bits guards, docs/PERF_NOTES.md "Seeded batch
    sweep"). This kernel keeps NO selection state at all: per
    (row, cell-of-`cell`-lanes) it emits exact integer moments of the
    qualifying-lane set {l : score(row, base+l) <= B_row} (B_row: a
    provable upper bound on the row's K-th score from a 1-NN pre-pass):
    cnt, sum(l), and sum(l^2) as two base-256 digit sums.

    cnt <= 2 cells are solved EXACTLY outside the kernel: l1 + l2 =
    sum, (l1-l2)^2 = 2*sumsq - sum^2 is a perfect square whose f32
    sqrt is exact, so both lane ids recover as exact integers. cnt >= 3
    (expected ~0.4% of uniform batches; any duplicate-heavy adversarial
    row) is CERTIFIED DETECTABLE and the whole batch falls back to the
    banded passes engine — guard-verify-delegate (core.cu:481-485).

    Design iteration 3 -> 4 (round 3): the moments were first computed
    on the VPU (mask times two weight rows, two 128-lane sum-reduces —
    ~17 VPU ops/element, 6.1 ms at ds11 scale vs the plain scan's
    2.5). This kernel moves the reduction to the MXU: ONE bf16 matmul
    of the 0/1 qualifier mask against a block-diagonal weight operand
    (w_ref; weights are integers <= 255, bf16-exact, f32-accumulated,
    so every moment is still exact) computes all four fields for every
    cell. With 256-lane cells the weight matrix is (tile_n, tile_n/64)
    — half a 128-deep score pass of extra MXU work — and the VPU hot
    loop drops to compare + select.
    """
    lo_ref = rest[0] if banded else None
    rest = rest[1:] if banded else rest
    w_ref = rest[0]
    n_pack = 1 if n_fields == _EXTRACT_FIELDS else 2
    pack_refs = rest[1:1 + n_pack]
    rem_ref = rest[1 + n_pack] if emit_rem else None
    j = pl.program_id(1)
    s = _score_tile(q_ref[:], r_ref[:], soa=True, precision=precision)
    # Mask whenever the OPERAND is wider than n — not just when n is
    # ragged against tile_n: a prepadded operand can carry whole
    # zero-point padding tiles (n % tile_n == 0, n_pad > n) whose
    # phantom scores would otherwise flood the qualifier counts and
    # silently trip the cnt>=3 certification into the K-pass fallback
    # (review r3 finding, empirically confirmed on zero-centered data).
    if n_pad != n:
        col = (jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 1)
               + j * tile_n)
        qual = (s <= bs_ref[:]) & (col < n)
    else:
        qual = s <= bs_ref[:]
    if banded:
        # Multi-round engine (K > SEEDED_ROUND_K): this round owns the
        # half-open SCORE band (lo, bound] — a partition of the
        # reference by the kernel's own scores, so no element is lost
        # or double-counted across rounds.
        qual = qual & (s > lo_ref[:])
    if emit_rem:
        # Fold the per-lane minima of the REMAINDER {score > bound}
        # alongside the extraction (VERDICT r3 item 1): this pass
        # already touches every score, and these minima are exactly
        # what the NEXT round's pre-pass would recompute with a second
        # full reference read — the needed-th smallest of them bounds
        # the next band's needed-th remaining score, bit-exactly (same
        # score arithmetic). ~3 extra VPU ops/element replace a whole
        # banded pass-1 (~2.4 ms at ds11 scale) per later round.
        # Padding columns never enter (s > bound is False there iff the
        # bound is finite, and the col < n mask below covers the rest);
        # value fold matches _fold_scores (strict <, NaN never enters).
        above = s > bs_ref[:]
        if n_pad != n:
            above = above & (col < n)
        s_above = jnp.where(above, s, jnp.inf)

        @pl.when(j == 0)
        def _():
            rem_ref[:] = jnp.full_like(rem_ref, jnp.inf)

        rem = rem_ref[:]
        for c in range(tile_n // 128):
            sc = s_above[:, c * 128:(c + 1) * 128]
            rem = jnp.where(sc < rem, sc, rem)
        rem_ref[:] = rem
    mask = jnp.where(qual, 1.0, 0.0).astype(jnp.bfloat16)
    mo = jax.lax.dot_general(
        mask, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (tile_m, cols)
    # In-kernel digit combine + OR-pack (field-major weight layout):
    # emit the (tile_m, cpt) int32 payloads the compactor consumes
    # directly — A = min(cnt,3) | e1<<2 | p2<<12 | (cnt>solvable)<<30
    # and, for the cubic mode, p3 — instead of the raw 4/8-field f32
    # digits (2-4x the HBM writes plus strided XLA unpack and a_pack
    # passes over the full (m, nc) arrays). Every digit accumulator is
    # f32-exact (< 2^24); an ILLEGAL (cnt > solvable) cell may wrap its
    # packed high bits, so the pack is masked to 30 bits and bit 30
    # carries the overflow certificate exactly (low 2 bits stay
    # min(cnt,3) != 0 at every qualifier — the validity contract).
    cpt = tile_n // cell
    if n_fields == _EXTRACT_FIELDS:
        # Quadratic mode: pack in-kernel like the cubic mode, but store
        # PADDED-DIRECT — each tile owns a (tile_m, 128) block with ap
        # in its first cpt lanes. The g-grouped accumulate path (shared
        # output blocks across g tiles) MEASURED WORSE here (K=16 6.14
        # -> 8.07 ms: the revisiting grid steps serialize), and the raw
        # 4-field f32 direct store costs XLA a strided unpack plus the
        # a_pack build over the full (m, nc * nf) array. Padding wastes
        # 128/cpt x the packed bytes (4x at the production (256, 8192)
        # tile — still 2x LESS than the raw f32 output) and the caller
        # slices the real lanes in one pass.
        solvable = _solvable_for(n_fields)
        cnt_i = mo[:, 0 * cpt:1 * cpt].astype(jnp.int32)
        e1_i = mo[:, 1 * cpt:2 * cpt].astype(jnp.int32)
        p2_i = (mo[:, 2 * cpt:3 * cpt] * 256.0
                + mo[:, 3 * cpt:4 * cpt]).astype(jnp.int32)
        packed = (jnp.minimum(cnt_i, 3) | (e1_i << 2) | (p2_i << 12))
        flag = jnp.where(cnt_i > solvable, jnp.int32(1), jnp.int32(0))
        ap = (packed & jnp.int32(0x3FFFFFFF)) | (flag << 30)
        out_ref = pack_refs[0]
        if cpt % 128 == 0:
            out_ref[:] = ap
        else:
            out_ref[:] = jnp.pad(ap, ((0, 0), (0, 128 - cpt)))
        return
    solvable = _solvable_for(n_fields)
    cnt_i = mo[:, 0 * cpt:1 * cpt].astype(jnp.int32)
    e1_i = mo[:, 1 * cpt:2 * cpt].astype(jnp.int32)
    p2_i = (mo[:, 2 * cpt:3 * cpt] * 256.0
            + mo[:, 3 * cpt:4 * cpt]).astype(jnp.int32)
    packed = (jnp.minimum(cnt_i, 3) | (e1_i << 2) | (p2_i << 12))
    flag = jnp.where(cnt_i > solvable, jnp.int32(1), jnp.int32(0))
    ap = (packed & jnp.int32(0x3FFFFFFF)) | (flag << 30)
    # sum(l^3) reaches ~5e7 > 2^24: combine the exact f32 digit
    # sums in int32 (a float combine would round by up to 2 ulp
    # and silently corrupt Newton's identities).
    p3 = (65536 * mo[:, 4 * cpt:5 * cpt].astype(jnp.int32)
          + 256 * mo[:, 5 * cpt:6 * cpt].astype(jnp.int32)
          + mo[:, 6 * cpt:7 * cpt].astype(jnp.int32))
    outs = [ap, p3]
    if cpt % 128 == 0:
        # One or more whole 128-lane output groups per tile: direct
        # store.
        for o_ref, o in zip(pack_refs, outs):
            o_ref[:] = o
        return
    # Narrow tiles: (tile_m, 128) output blocks are shared by g = 128 //
    # cpt consecutive n-tiles (Mosaic requires 128-divisible output
    # lanes, and dynamic lane-offset stores must be 128-aligned). Each
    # invocation zero-pads its columns to the block width, lane-rolls
    # them into position, and accumulates; the block flushes to HBM when
    # j // g advances.
    g = 128 // cpt
    for o_ref, o in zip(pack_refs, outs):
        op = pltpu.roll(jnp.pad(o, ((0, 0), (0, 128 - cpt))),
                        (j % g) * cpt, 1)

        @pl.when(j % g == 0)
        def _(o_ref=o_ref, op=op):
            o_ref[:] = op

        @pl.when(j % g != 0)
        def _(o_ref=o_ref, op=op):
            o_ref[:] = o_ref[:] + op


@functools.lru_cache(maxsize=None)
def _build_extract_candidates(m: int, n: int, k: int,
                              tile_m: int, tile_n: int, precision: str,
                              n_ops: int | None = None, kk: int = 16,
                              banded: bool = False,
                              emit_rem: bool = False):
    """(search (m,k), SoA ref ops, bound (m,1)[, lo (m,1)]) -> packed
    int32 moment arrays (A[, p3]) of shape (m, n_ops // cell) — see
    _extract_moment_kernel and the ``moments`` docstring below. The cell lane width is exposed as the
    returned callable's `.cell`. With ``banded=True`` the callable takes
    a fourth argument lo (m, 1) and counts the half-open score band
    (lo, bound] — the multi-round engine's per-round partition. With
    ``emit_rem=True`` (banded only) the moment tuple is followed by an
    (m, 128) per-lane minima array of the remainder {score > bound} —
    the next round's bound source, folded in the same read."""
    if emit_rem and not banded:
        raise ValueError("emit_rem requires banded=True")
    if tile_n % 128 != 0 or tile_m % 8 != 0:
        raise ValueError("tile_n % 128 == 0 and tile_m % 8 == 0 required")
    k_pad = round_up(k, 8)
    m_pad = round_up(m, tile_m)
    n_pad = n_ops if n_ops is not None else round_up(n, tile_n)
    if n_pad < n or n_pad % tile_n != 0:
        raise ValueError(f"operand width {n_pad} incompatible with "
                         f"n={n}, tile_n={tile_n}")
    m_tiles = m_pad // tile_m
    n_tiles = n_pad // tile_n
    cell, n_fields = _extract_mode(tile_n, kk)
    cpt = tile_n // cell
    cols = n_fields * cpt
    #: Both modes pack in-kernel (int32 outputs, cpt real columns per
    #: tile). The cubic mode g-groups narrow tiles into shared 128-lane
    #: accumulate blocks; the quadratic mode stores PADDED-DIRECT (one
    #: 128-lane block per tile) — see _extract_moment_kernel.
    quad = n_fields == _EXTRACT_FIELDS
    if cpt % 128 != 0 and 128 % cpt != 0:
        raise ValueError(f"tile_n={tile_n} gives {cpt} output columns "
                         "per tile; must divide or be divisible by 128")
    nc = n_pad // cell
    n_pack = 1 if quad else 2
    w = np.asarray(_moment_weights(tile_n, cell, n_fields))
    padded_direct = quad and cpt % 128 != 0
    if cpt % 128 == 0:
        out_w = n_tiles * cpt
        out_spec = pl.BlockSpec((tile_m, cpt), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
    elif padded_direct:
        out_w = n_tiles * 128
        out_spec = pl.BlockSpec((tile_m, 128), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
    else:
        g = 128 // cpt
        #: columns beyond n_tiles * cpt (the ragged tail of the last
        #: output block) are never written — masked below.
        out_w = -(-n_tiles // g) * 128
        out_spec = pl.BlockSpec((tile_m, 128), lambda i, j: (i, j // g),
                                memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
    rem_spec = pl.BlockSpec((tile_m, 128), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_extract_moment_kernel, n=n, n_pad=n_pad,
                          tile_m=tile_m, tile_n=tile_n, cell=cell,
                          n_fields=n_fields, precision=precision,
                          banded=banded, emit_rem=emit_rem),
        grid=(m_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_m, k_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            scalar_spec,
        ] + ([scalar_spec] if banded else []) + [
            pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * n_pack + ([rem_spec] if emit_rem else []),
        out_shape=[jax.ShapeDtypeStruct((m_pad, out_w), jnp.int32)
                   for _ in range(n_pack)]
        + ([jax.ShapeDtypeStruct((m_pad, 128), jnp.float32)]
           if emit_rem else []),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * (k_pad + cols),
            bytes_accessed=(m_pad * k_pad * 4 + n_pad * k_pad * 4
                            + m_pad * nc * n_pack * 4),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )

    def prep_soa(ref):
        return (jnp.pad(ref, ((0, n_pad - n), (0, k_pad - k))).T,)

    def moments(search, ref_ops, bound_s, lo_s=None):
        """bound_s (m, 1) f32; rows beyond m get -inf (no qualifiers).
        lo_s (m, 1) f32, required iff built with banded=True: the
        round's exclusive lower score band.

        Returns packed int32 moment arrays of shape (m, nc):
        (A[, p3][, rem]) with A = min(cnt,3) | e1<<2 | p2<<12 |
        (cnt > solvable)<<30 — the compactor's field layout, packed
        in-kernel (A != 0 iff the cell qualifies; bit 30 is the
        overflow certificate)."""
        if (lo_s is None) == banded:
            raise ValueError("lo_s must be passed iff banded=True")
        (r_op,) = ref_ops
        if r_op.shape != (k_pad, n_pad):
            raise ValueError(
                f"operand shape {r_op.shape} != ({k_pad}, {n_pad})")
        q = jnp.pad(search, ((0, m_pad - m), (0, k_pad - k)))
        bs = jnp.pad(bound_s, ((0, m_pad - m), (0, 0)),
                     constant_values=-jnp.inf)
        args = (q, r_op, bs)
        if banded:
            lo = jnp.pad(lo_s, ((0, m_pad - m), (0, 0)),
                         constant_values=jnp.inf)
            args = args + (lo,)
        outs = call(*args, jnp.asarray(w))
        if padded_direct:
            # Strip each tile's pad lanes in one strided pass.
            packs = (outs[0][:m].reshape(m, n_tiles, 128)[:, :, :cpt]
                     .reshape(m, nc),)
        else:
            # Drop the never-written ragged tail columns.
            packs = tuple(o[:m, :nc] for o in outs[:n_pack])
        if emit_rem:
            return packs + (outs[n_pack][:m],)
        return packs

    moments.prep_soa = prep_soa
    moments.cell = cell
    moments.n_fields = n_fields
    #: qualifiers per cell the recovery can solve exactly
    moments.solvable = _solvable_for(n_fields)
    return moments


def _cell_compact_kernel(u_ref, *refs, cap: int, cw: int, w_tiles: int,
                         nf: int, out_w: int, tile_m: int):
    """Positional cell compaction — the post-extraction stage rebuilt as
    a Pallas kernel (round-3 ninth iteration; replaces the payload-packed
    lax.top_k ladder, whose 12 calls cost ~6.6 ms at the K=64 geometry
    and were measured INTRINSIC to XLA's top_k — batching the part axis
    or stacking keys into one call is SLOWER, scripts/r7_probe_compact.py).

    Per grid step (m-tile i, part p, width-chunk w): the input fields are
    (tile_m, cw) int32 with field 0 nonzero exactly at qualifying cells.
    An inclusive prefix count over the part's cells — 128-lane chunks
    against one upper-triangular ones operand on the MXU, carried across
    width-chunks in scratch — assigns each qualifying cell its output
    slot; a fori loop over the cap slots then selects slot s's unique
    source cell per row with one compare + masked max-reduce per field
    and accumulates it into the (tile_m, out_w) block via pad +
    pltpu.roll (the established dynamic-lane-offset store pattern).
    Cost is cap * nc * (nf + 1) simple VPU ops — compare ~0.7 ms against
    top_k's 6.6 at (m=1024, nc=8192, cap=48, 3 fields).

    Outputs: [lanepos, *fields] compacted in ascending cell order; slots
    beyond a row's qualifier count stay 0 (callers read validity from
    compacted field 0 != 0 — possible because field 0 carries cnt in its
    low bits, OR-packed, so it is nonzero at every qualifier). Qualifiers
    past cap are silently dropped — callers certify against that with
    their own per-part qualifier counts, as with the top_k compaction.
    """
    f_refs = refs[:nf]
    out_refs = refs[nf:2 * nf + 1]
    carry_ref = refs[2 * nf + 1]
    acc_refs = refs[2 * nf + 2:]
    w_id = pl.program_id(2)

    @pl.when(w_id == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)
        for a in acc_refs:
            a[:] = jnp.zeros_like(a)

    a0 = f_refs[0][:]
    qual = a0 != 0
    qf = jnp.where(qual, 1.0, 0.0).astype(jnp.bfloat16)
    # Inclusive prefix count: per 128-lane chunk one bf16 matmul against
    # the upper-triangular ones operand (0/1 values, f32 accumulation —
    # counts <= pw < 2^24 stay exact), plus the running row carry.
    base = carry_ref[:]
    chunks = []
    for c in range(cw // 128):
        pc = jax.lax.dot_general(
            qf[:, c * 128:(c + 1) * 128], u_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        chunks.append(pc + base)
        base = base + pc[:, 127:128]
    carry_ref[:] = base
    pm1 = jnp.concatenate(chunks, axis=1).astype(jnp.int32) - 1
    lane = (jax.lax.broadcasted_iota(jnp.int32, (tile_m, cw), 1)
            + w_id * cw)
    fields = [lane] + [r[:] for r in f_refs]

    def body(s, accs):
        sel = qual & (pm1 == s)
        out = []
        for f, acc in zip(fields, accs):
            # <= 1 selected cell per row: a masked max IS the value
            # (fields are nonnegative; empty rows contribute 0).
            red = jnp.max(jnp.where(sel, f, 0), axis=1, keepdims=True)
            out.append(acc + pltpu.roll(
                jnp.pad(red, ((0, 0), (0, out_w - 1))), s, 1))
        return tuple(out)

    accs = jax.lax.fori_loop(
        0, cap, body, tuple(a[:] for a in acc_refs))
    for a, v in zip(acc_refs, accs):
        a[:] = v

    @pl.when(w_id == w_tiles - 1)
    def _():
        for o, a in zip(out_refs, acc_refs):
            o[:] = a[:]


def _cell_butterfly_kernel(u_ref, *refs, cw: int, nf: int, out_w: int,
                           tile_m: int):
    """Butterfly-concentrator cell compaction — the slot loop replaced
    by LSB-first log-step routing when each part fits one width-chunk.

    The slot loop costs cap * pw VPU passes per part PER FIELD (linear
    in cap — 48/24/12 -> 2.44/1.31/0.75 ms at the K=64 geometry,
    scripts/r17_compact_iso.py); concentration routing needs only
    ceil(log2(cw)) steps: each qualifier's destination is its prefix
    rank, its remaining distance d = lane - rank decomposes in binary,
    and moving every element with bit j set LEFT by 2^j (j ascending)
    is collision-free — the classic concentrator-network result,
    re-verified over 3000 random masks (scripts/r18 dev notes). Rolls
    wrap, but a wrapped move flag at lane l >= cw - 2^j would need a
    mover at lane < 2^j with d >= 2^j > lane — impossible since
    d <= lane. Output contract identical to _cell_compact_kernel:
    ranks 0..out_w-1 land in ascending cell order, zeros beyond the
    qualifier count; ranks past out_w fall off the stored block and the
    callers' cap certificates cover them.
    """
    f_refs = refs[:nf]
    out_refs = refs[nf:2 * nf + 1]
    a0 = f_refs[0][:]
    qual = a0 != 0
    qf = jnp.where(qual, 1.0, 0.0).astype(jnp.bfloat16)
    base = jnp.zeros((tile_m, 1), jnp.float32)
    chunks = []
    for c in range(cw // 128):
        pc = jax.lax.dot_general(
            qf[:, c * 128:(c + 1) * 128], u_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        chunks.append(pc + base)
        base = base + pc[:, 127:128]
    pm1 = jnp.concatenate(chunks, axis=1).astype(jnp.int32) - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_m, cw), 1)
    d = jnp.where(qual, lane - pm1, -1)
    fields = [lane] + [r[:] for r in f_refs]
    for j in range((cw - 1).bit_length()):
        bit = 1 << j
        # Derive the incoming-mover flag from the ROLLED distance array
        # (int32 rolls only; Mosaic bool rolls are not relied on).
        d_s = pltpu.roll(d, cw - bit, 1)
        mv_s = (d_s >= 0) & ((d_s & bit) != 0)
        stay = (d >= 0) & ((d & bit) == 0)
        d = jnp.where(mv_s, d_s - bit, jnp.where(stay, d, -1))
        fields = [
            jnp.where(mv_s, pltpu.roll(f, cw - bit, 1),
                      jnp.where(stay, f, 0))
            for f in fields
        ]
    for o, f in zip(out_refs, fields):
        o[:] = f[:, :out_w]


@functools.lru_cache(maxsize=None)
def _build_cell_compactor(m: int, nc: int, parts: int, cap: int, nf: int,
                          tile_m: int = 128, max_cw: int = 2048):
    # max_cw=2048: a 4096-wide chunk put the kernel's scoped-VMEM stack
    # at 17.5 MB against the v5e's 16 MB limit (AOT OOM at the cap=144
    # escalation geometry); 2048 halves every (tile_m, cw) temporary.
    """(fields: nf x (m, nc) int32, field 0 nonzero iff qualifying) ->
    nf + 1 arrays (m, parts * cap) int32: [within-part cell position,
    *fields], each part's qualifiers compacted to its first cap slots in
    ascending cell order (see _cell_compact_kernel)."""
    if nc % parts != 0:
        raise ValueError(f"nc={nc} not divisible by parts={parts}")
    pw = nc // parts
    if not 1 <= cap <= min(256, pw):
        raise ValueError(f"cap={cap} outside [1, min(256, {pw})]")
    # Small/ragged part widths are lane-padded to the 128-lane block
    # granularity (pad cells carry zero fields — never qualifiers).
    # parts > 1 requires 128-divisible parts (the engines guarantee it)
    # so the part boundaries stay block-aligned.
    if parts > 1 and pw % 128 != 0:
        raise ValueError(f"parts={parts} needs 128-divisible part width,"
                         f" got {pw}")
    pw_pad = round_up(pw, 128)
    if pw_pad <= 8192:
        # Whole part in one width-chunk: butterfly concentration
        # (log-step routing, cap-independent — _cell_butterfly_kernel).
        # Wide parts shrink tile_m instead of chunking: the routing
        # needs the full part width resident, and (tile_m, cw) i32
        # temporaries (~nf + 4 live) must fit scoped VMEM.
        cw = pw_pad
        # cap > 128 widens out_w to 256 and the kept-slot state with it:
        # at cw=8192 that measured 44 KB OVER the 16 MB scoped-VMEM
        # limit (K=128 escalation tier, nc=16384) — halve tile_m there.
        tile_m = min(tile_m,
                     128 if cw <= 2048 else 64 if cw <= 4096 else
                     (32 if cap <= 128 else 16))
        tile_m = max(8, tile_m)
        w_tiles = 1
    else:
        cw = min(pw_pad, max_cw)
        while pw_pad % cw != 0 or cw % 128 != 0:
            cw -= 128
        w_tiles = pw_pad // cw
    out_w = 128 if cap <= 128 else 256
    m_pad = round_up(m, tile_m)
    u = np.triu(np.ones((128, 128), np.float32)).astype(jnp.bfloat16)
    f_spec = pl.BlockSpec((tile_m, cw),
                          lambda i, p, w: (i, p * w_tiles + w),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_m, out_w), lambda i, p, w: (i, p),
                            memory_space=pltpu.VMEM)
    if w_tiles == 1:
        kernel = functools.partial(_cell_butterfly_kernel, cw=cw, nf=nf,
                                   out_w=out_w, tile_m=tile_m)
        scratch = []
        flops = (2 * m_pad * nc * 128
                 + m_pad * nc * (cw - 1).bit_length() * (nf + 2))
    else:
        kernel = functools.partial(_cell_compact_kernel, cap=cap, cw=cw,
                                   w_tiles=w_tiles, nf=nf, out_w=out_w,
                                   tile_m=tile_m)
        scratch = ([pltpu.VMEM((tile_m, 1), jnp.float32)]
                   + [pltpu.VMEM((tile_m, out_w), jnp.int32)
                      for _ in range(nf + 1)])
        flops = 2 * m_pad * nc * 128 + m_pad * nc * cap * (nf + 1)
    call = pl.pallas_call(
        kernel,
        grid=(m_pad // tile_m, parts, w_tiles),
        in_specs=[pl.BlockSpec((128, 128), lambda i, p, w: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [f_spec] * nf,
        out_specs=[out_spec] * (nf + 1),
        out_shape=[jax.ShapeDtypeStruct((m_pad, parts * out_w), jnp.int32)
                   for _ in range(nf + 1)],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(m_pad * nc * nf * 4
                            + m_pad * parts * out_w * (nf + 1) * 4),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )

    def compact(*fields):
        if len(fields) != nf:
            raise ValueError(f"expected {nf} fields, got {len(fields)}")
        padded = [jnp.pad(f, ((0, m_pad - m), (0, pw_pad - pw)))
                  for f in fields]
        outs = call(jnp.asarray(u), *padded)
        if out_w == cap and parts == 1:
            return tuple(o[:m] for o in outs)
        return tuple(
            jnp.concatenate([o[:m, p * out_w:p * out_w + cap]
                             for p in range(parts)], axis=1)
            for o in outs)

    compact.cap = cap
    compact.parts = parts
    return compact


def _sweep_tiles(k: int, m: int, n: int, kk: int,
                 precision: str) -> tuple[int, int]:
    """Tile geometry for the sweep kernel: the 1-NN tile table (narrow —
    the staged score scratch doubles the score tile's VMEM footprint, so
    the packed path's wide tiles do not fit) shrunk in tile_m until the
    per-lane K-state (scratch + output block, f32+i32 = kk * tile_m KiB
    each) fits alongside the score tile and its staging copy."""
    del precision  # wide tiles never fit here; see docstring
    tile_m, tile_n = pick_tiles(k, m, n)

    def vmem(tm, tn):
        # K-state scratch (f32+i32) + output block (f32+i32) + the score
        # tile and its staging copy; operands/double-buffering ride in the
        # remaining ~6 MB headroom.
        return 3 * kk * tm * 1024 + 8 * tm * tn

    while tile_m > 8 and vmem(tile_m, tile_n) > (10 << 20):
        # Halve but keep the sublane-multiple invariant (e.g. 88 -> 40,
        # not 44, which _build_sweep_candidates rejects).
        tile_m = max(8, ((tile_m // 2) // 8) * 8)
    while tile_n > 512 and vmem(tile_m, tile_n) > (10 << 20):
        tile_n //= 2
    return max(8, tile_m), tile_n


@functools.lru_cache(maxsize=None)
def _build_sweep_candidates(m: int, n: int, k: int, kk: int,
                            tile_m: int, tile_n: int, precision: str,
                            n_ops: int | None = None):
    """(search (m,k), SoA ref ops) -> (idx (m, kk*128) i32,
    score (m, kk*128) f32): each query's per-lane K-deep candidate lists
    from one reference sweep. Scores are the same arithmetic as the 1-NN
    and banded kernels (shared _score_tile), so the two top-K engines'
    selections are comparable bit-for-bit."""
    if tile_n % 128 != 0 or tile_m % 8 != 0:
        raise ValueError("tile_n % 128 == 0 and tile_m % 8 == 0 required")
    if not 1 <= kk <= SWEEP_MAX_NEIGHBORS:
        raise ValueError(f"sweep engine serves K in [1, {SWEEP_MAX_NEIGHBORS}]")
    k_pad = round_up(k, 8)
    m_pad = round_up(m, tile_m)
    n_pad = n_ops if n_ops is not None else round_up(n, tile_n)
    if n_pad < n or n_pad % tile_n != 0:
        raise ValueError(f"operand width {n_pad} incompatible with "
                         f"n={n}, tile_n={tile_n}")
    m_tiles = m_pad // tile_m
    n_tiles = n_pad // tile_n
    out_spec = pl.BlockSpec((tile_m, kk * 128), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_sweep_kernel, kk=kk, n=n, tile_n=tile_n,
                          n_tiles=n_tiles, precision=precision),
        grid=(m_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_m, k_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((m_pad, kk * 128), jnp.float32),
                   jax.ShapeDtypeStruct((m_pad, kk * 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)]
                       + [pltpu.VMEM((tile_m, 128), dt)
                          for _ in range(kk)
                          for dt in (jnp.float32, jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=(m_pad * k_pad * 4 + n_pad * k_pad * 4
                            + m_pad * kk * 1024),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )

    def prep_soa(ref):
        return (jnp.pad(ref, ((0, n_pad - n), (0, k_pad - k))).T,)

    def candidates(search, ref_ops):
        (r_op,) = ref_ops
        if r_op.shape != (k_pad, n_pad):
            raise ValueError(
                f"operand shape {r_op.shape} != ({k_pad}, {n_pad})")
        q = jnp.pad(search, ((0, m_pad - m), (0, k_pad - k)))
        cs, ci = call(q, r_op)
        return ci[:m], cs[:m]

    candidates.prep_soa = prep_soa
    return candidates


def _finalize_topk(search, ref_aos, ci, cs, kk: int, n: int):
    """Candidate lists -> exact top-K rows.

    Selection: the kk lex-smallest (kernel score, index) per query via a
    two-key sort (the union of per-lane K-lists always contains the
    global lex top-K: any lane holds at most K of them). Reporting: exact
    f32 diff-form distances for the selected rows, sorted by (d2, index)
    — v0's tie rule."""
    cs, ci = jax.lax.sort((cs, ci), dimension=-1, num_keys=2)
    sel = ci[:, :kk]
    valid = sel < n
    safe = jnp.where(valid, sel, 0)
    pts = jnp.take(ref_aos, safe.reshape(-1), axis=0)
    pts = pts.reshape(*sel.shape, ref_aos.shape[1])
    diff = search[:, None, :] - pts
    d2 = jnp.where(valid, jnp.sum(diff * diff, axis=-1), jnp.inf)
    idx = jnp.where(valid, sel, -1)
    d2, idx = jax.lax.sort((d2, idx), dimension=-1, num_keys=2)
    return idx, d2


def _newton_max_root(e1, e2, e3, iters: int = 24):
    """Largest integer root of the monic cubic x^3 - e1 x^2 + e2 x - e3
    whose roots are the (<= 3) qualifying lane ids of a cell padded with
    phantom zeros — all integers in [0, 256).

    Integer Newton from above (x0 = 255): on [r3, inf) the cubic is
    nonnegative, nondecreasing, and convex (the largest root is simple
    except for the all-zero cell, where px = x^3 and the iteration is
    still monotone), so a full Newton step lands at or above r3;
    flooring the step only keeps x higher, and the forced minimum step
    of 1 cannot cross r3 because roots are integers. All arithmetic is
    int32-exact: |px| <= ~1.2e8, |px'| <= ~4e5 for x in [0, 255] and
    the coefficient ranges of legal cells (e1 <= 765, e2 <= ~2e5,
    e3 <= ~1.7e7). Exhaustively validated over EVERY legal root multiset
    — {0,0,0}, {0,0,l}, {0,a<b}, {a<b<c} for lane ids < 256 — at 24
    iterations (scripts/r5_probe_packed.py derivation; the worst case
    is the all-zero cell's ~16-step descent 255 -> 0).

    Returns (r3, exact); ``exact`` certifies px(r3) == 0 and is folded
    into the engine's fallback certificate, so a cell whose moments do
    not describe <= 3 integer lanes (cnt > solvable corruption) can
    never yield a silently wrong root."""
    x0 = jnp.full(e1.shape, 255, jnp.int32)

    def body(_, x):
        px = ((x - e1) * x + e2) * x - e3
        dpx = (3 * x - 2 * e1) * x + e2
        step = jnp.where(dpx > 0,
                         jnp.maximum(1, px // jnp.maximum(dpx, 1)), 1)
        return jnp.where(px > 0, x - step, x)

    x = jax.lax.fori_loop(0, iters, body, x0)
    px = ((x - e1) * x + e2) * x - e3
    return x, px == 0


def _lex_min(idx, score):
    """Per-row lexicographic (score, index) minimum of the candidate set.
    Exact duplicates carry bit-identical scores, so the lowest index among
    tied minima is returned (v0's tie rule at the candidate level)."""
    v = jnp.min(score, axis=-1, keepdims=True)
    tie = jnp.where(score == v, idx, _I32_MAX)
    return jnp.min(tie, axis=-1), jnp.squeeze(v, -1)


def _solve_cells(cellc, valid, c_cnt, e1, p2, p3, *, cell: int, n: int,
                 solvable: int):
    """Exact lane-id recovery for compacted cells: integer power sums
    (e1 = sum(l), p2 = sum(l^2)[, p3 = sum(l^3)]) of each cell's <=
    `solvable` qualifying lane ids -> candidate GLOBAL columns
    (m, solvable * cap), sentinel n in empty slots, plus a recovery
    certificate (the cubic Newton exactness bit; quadratic recovery is
    unconditionally exact). Shared by the seeded engine's single-round
    and multi-round forms; exactness arguments: _newton_max_root and
    docs/PERF_NOTES.md "Round-3" items 3/5."""
    base = cellc * cell

    def quad_lanes(p1, sq):
        """Integer quadratic recovery: the two lanes with sum p1 and
        square-sum sq are (p1 -+ d)/2 where d^2 = 2*sq - p1^2 is a
        PERFECT SQUARE for any legal cell (cnt == 2: (l1-l2)^2;
        cnt == 1: the pair degenerates to (0, l) and d^2 = l^2).

        XLA:TPU's f32 sqrt is APPROXIMATE (observed: sqrt(9025) one
        ulp above 95.0 — caught by the round-3 K=512 differential,
        scripts/r6_rounds_debug*.py), so a truncating cast silently
        shifts a lane by one. The sqrt is only a SEED here: round to
        the nearest integer, verify d*d == disc in int32 (the
        quadratic's own exactness certificate, joining the cubic
        Newton's), and do the halving in integers."""
        disc = jnp.maximum(2 * sq - p1 * p1, 0)
        d = jnp.round(
            jnp.sqrt(disc.astype(jnp.float32))).astype(jnp.int32)
        ok = d * d == disc
        return (p1 - d) // 2, (p1 + d) // 2, ok

    if solvable == 2:
        l1, l2, q_ok = quad_lanes(e1, p2)
        rec_ok = jnp.all(q_ok | ~valid)
        col2 = jnp.where(valid & (c_cnt >= 1), base + l2, n)
        col1 = jnp.where(valid & (c_cnt >= 2), base + l1, n)
        return jnp.concatenate([col2, col1], axis=1), rec_ok
    # Cubic recovery: Newton's identities give the elementary symmetric
    # functions int32-exactly; integer Newton finds the largest root
    # (with an exactness certificate), deflation hands the remaining two
    # lanes to the integer quadratic path.
    e2 = (e1 * e1 - p2) // 2
    e3 = (e1 * e1 * e1 - 3 * e1 * p2 + 2 * p3) // 6
    r3, exact = _newton_max_root(e1, e2, e3)
    l1, l2, q_ok = quad_lanes(e1 - r3, p2 - r3 * r3)
    rec_ok = jnp.all((exact & q_ok) | ~valid)
    colA = jnp.where(valid & (c_cnt >= 1), base + r3, n)
    colB = jnp.where(valid & (c_cnt >= 2), base + l2, n)
    colC = jnp.where(valid & (c_cnt >= 3), base + l1, n)
    return jnp.concatenate([colA, colB, colC], axis=1), rec_ok


def _compact_and_solve(m: int, nc: int, parts: int, cap: int, fields,
                       *, cell: int, n: int, solvable: int):
    """Compact the OR-packed moment fields with the Pallas positional
    compactor and recover candidate columns.

    ``fields`` is (A,) or (A, p3) with A = min(cnt,3) | e1<<2 | p2<<12 —
    nonzero exactly at qualifying cells, every component exact for legal
    (cnt <= solvable) cells (e1 <= 765 < 2^10, p2 <= 195075 < 2^18).
    Returns (cols (m, solvable * parts * cap_e) global candidate columns
    with ``n`` sentinels, valid mask, recovery-exactness certificate).
    Shared by the single-round and multi-round seeded engines' fast and
    escalation tiers.

    Measured negatives at the K=64 geometry (m=1024, nc=8192): a
    two-stage fine-split + sort-merge compaction (parts > 4 pay grid
    overhead: 32x16+merge 6.77 ms vs 4x48 2.85 —
    scripts/r17_compact_variants.py) and a post-compaction lane-axis
    take_along_axis gather of p3 (the CLAUDE.md lane trap: end-to-end
    K=64 12.8 -> 18.8 ms) both LOST to simply carrying p3 as a second
    slot-loop field, even though the loop costs cap * nc VPU ops per
    field (cap-linear: 48/24/12 -> 2.44/1.31/0.75 ms,
    scripts/r17_compact_iso.py)."""
    pw = nc // parts
    cap_e = min(cap, pw)
    comp = _build_cell_compactor(m, nc, parts, cap_e, len(fields),
                                 tile_m=min(128, round_up(m, 8)))
    outs = comp(*fields)
    lanepos, ac = outs[0], outs[1]
    valid = ac != 0
    if parts > 1:
        off = jnp.concatenate(
            [jnp.full((m, cap_e), p * pw, jnp.int32)
             for p in range(parts)], axis=1)
    else:
        off = 0
    cellc = jnp.where(valid, lanepos + off, 0)
    c_cnt = ac & 3
    e1 = (ac >> 2) & 1023
    p2 = (ac >> 12) & 0x3FFFF
    p3 = outs[2] if solvable == 3 else None
    cols, rec_ok = _solve_cells(cellc, valid, c_cnt, e1, p2, p3,
                                cell=cell, n=n, solvable=solvable)
    return cols, valid, rec_ok


#: Candidate columns are dense-compacted to this width before the exact
#: (d2, index) rerank whenever the recovery width exceeds it: the sort
#: is the rerank's dominant cost and scales with width, while the
#: recovery width carries >= 4x slack (each compacted cell expands to
#: `solvable` slots regardless of its actual count). 224 covers the
#: K=64 band's qualifier census (~110/row mean; a row would need +10
#: sigma to overflow) and any overflow joins the engines' certificates
#: (fallback, never a dropped candidate).
RERANK_COMPACT_CAP = 224


def _compact_cols(cols, n: int, cap: int = RERANK_COMPACT_CAP,
                  parts: int = 1):
    """Dense-compact the valid candidate columns (< n) of each row into
    ``parts * cap`` slots (order preserved; n sentinels beyond). Returns
    (narrow (m, parts * cap) cols, ok: every part's candidates fit its
    cap). Reuses the Pallas positional compactor — candidates ride as
    col+1 so slot validity stays field-0 != 0. ``parts > 1`` lifts the
    compactor's 256-slot ceiling for the K > 64 band (each part
    compacts its contiguous column range; ascending order is preserved
    across the concatenation)."""
    m, w = cols.shape
    if parts > 1 and (w % parts or (w // parts) % 128):
        parts = 1
    cap = min(cap, w // parts)
    comp = _build_cell_compactor(m, w, parts, cap, 1,
                                 tile_m=min(128, round_up(m, 8)))
    _pos, vals = comp(jnp.where(cols < n, cols + 1, 0))
    valid = cols < n
    if parts > 1:
        part_q = jnp.sum(valid.reshape(m, parts, w // parts), axis=2)
        ok = jnp.all(part_q <= cap)
    else:
        ok = jnp.all(jnp.sum(valid, axis=1) <= cap)
    return jnp.where(vals != 0, vals - 1, n), ok


def _exact_rerank(search, ref_aos, cols, kk: int, n: int):
    """Gather candidate reference rows, compute EXACT diff-form d2, and
    lex-sort (d2, index) -> ((m, kk) idx with -1 sentinels, (m, kk) d2).
    Selection by exact distance over a certified score superset — the
    seeded engine's conditioning contract."""
    if cols.shape[1] < kk:
        # Tiny n: fewer candidate slots than K — widen with sentinels so
        # the output shape honors the contract; certification (>= K
        # recovered) then routes such shapes to fallback.
        cols = jnp.pad(cols, ((0, 0), (0, kk - cols.shape[1])),
                       constant_values=n)
    in_range = cols < n
    safe = jnp.where(in_range, cols, 0)
    pts = jnp.take(ref_aos, safe.reshape(-1), axis=0)
    pts = pts.reshape(cols.shape[0], -1, ref_aos.shape[1])
    diff = search[:, None, :] - pts
    d2 = jnp.where(in_range, jnp.sum(diff * diff, axis=-1), jnp.inf)
    ci = jnp.where(in_range, cols, _I32_MAX)
    d2s, cis = jax.lax.sort((d2, ci), dimension=-1, num_keys=2)
    idx_k = cis[:, :kk]
    idx_k = jnp.where(idx_k < n, idx_k, -1)
    return idx_k, d2s[:, :kk]


def _inflate_bound(bound, lo=None):
    """Safety inflation of a seeded score bound — ONE copy of the
    correctness-relevant constants, shared by the single-round and
    banded-rounds engines (review r3: they carried verbatim clones that
    a future retune could silently de-synchronize). A LOOSER bound is
    always safe (it only admits extra qualifiers): 9.54e-7 ~ 2^-20
    relative covers the score reduction error, +1e-35 keeps a zero
    bound strictly inflating, and NaN bounds (inf-coordinate data)
    become +inf, which floods the qualifier counts and trips the
    certified fallback — never a silent miss. ``lo`` (the rounds
    engine's band floor) keeps the half-open band monotone."""
    bound = bound + jnp.abs(bound) * 9.54e-7 + 1e-35
    bound = jnp.where(jnp.isnan(bound), jnp.inf, bound)
    if lo is not None:
        bound = jnp.maximum(bound, lo)
    return bound


def _extract_tile_n(n_ops: int, max_tile_n: int, k: int) -> int:
    """Widest 128 * 2^p tile <= max_tile_n dividing the prepadded operand
    width — the moment-extraction kernel needs a power-of-two chunk count
    whose moment columns divide or are divisible by 128 (shared by both
    seeded builders).

    The (k_pad, tile_n) reference tile is double-buffered by the Pallas
    pipeline, so wide k must shrink tile_n just as in fused.pick_tiles
    (same OPERAND_TILE_BUDGET): unclamped, k=768 at tile_n=8192 is a
    24 MB operand tile — 48 MB double-buffered against the ~16 MB
    scoped-VMEM limit (observed OOM, scripts/r14_probe_highk.py)."""
    from tpu_knn.kernels.tuning import OPERAND_TILE_BUDGET

    max_tile_n = min(max_tile_n, OPERAND_TILE_BUDGET // round_up(k, 8))
    t = 128
    while t * 2 <= min(max_tile_n, n_ops) and n_ops % (t * 2) == 0:
        t *= 2
    return t


def _build_seeded_rounds(m: int, n: int, k: int, kk: int, n_ops: int,
                         precision: str):
    """Multi-round seeded engine: SEEDED_ROUND_K < K <=
    SEEDED_MAX_NEIGHBORS at ~2 reference reads per 64 results.

    Round r owns the half-open SCORE band (B_{r-1}, B_r]: a banded 1-NN
    pre-pass over {score > B_{r-1}} yields per-lane minima whose
    needed_r-th smallest upper-bounds the round's needed_r-th remaining
    score; the banded extraction kernel then counts/moments exactly the
    band's qualifiers (same 128-lane-cell cubic geometry as K=64). The
    bands partition the reference by the kernel's own scores, so across
    rounds nothing is lost or double-counted, and the certificate needs
    NO pass1-vs-extraction score agreement: once the accumulated
    per-round recovered counts reach K, the set {score <= B_R} has >= K
    elements, every one of them is a recovered candidate, and the final
    EXACT-distance rerank over the concatenated columns selects at
    oracle conditioning — identical contract to the single-round form.
    Any failure (dense cell, cap overflow, inexact Newton root, short
    count) routes the whole call to the banded passes engine.

    vs the passes engine (one full reference read PER result) this is
    ceil(K/64) * ~2 reads: measured numbers in docs/PERF_NOTES.md
    "Round-3" item 8."""
    tile_m = min(EXTRACT_TILE_M_CUBIC, round_up(m, 8))
    t = _extract_tile_n(n_ops, EXTRACT_TILE_N_CUBIC, k)
    # emit_rem: each round's extraction folds the remainder's per-lane
    # minima in the same read, so rounds >= 2 need NO pre-pass — bound
    # sources chain through the extractions (1 + rounds reference reads
    # instead of 2 * rounds).
    extract = _build_extract_candidates(m, n, k, tile_m, t, precision,
                                        n_ops=n_ops, kk=SEEDED_ROUND_K,
                                        banded=True, emit_rem=True)
    p1_tile_m, p1_tile_n = pick_tiles(k, m, n,
                                      wide=precision == "packed")
    p1_tile_n = min(p1_tile_n, n_ops)
    while n_ops % p1_tile_n != 0:
        p1_tile_n -= 128
    # Round 1's bound source: the VALUE-ONLY minima fold (the index fold
    # is dead weight when only the K-th smallest lane minimum is used —
    # fused.py:_fused_minima_kernel).
    pass1 = _build_minima_candidates(m, n, k, p1_tile_m, p1_tile_n,
                                     precision, n_ops=n_ops)
    fallback_run = _build_topk(m, n, k, kk, n_ops, precision, "passes")
    cell = extract.cell
    solvable = extract.solvable        # 3: the K=64 cubic geometry
    nc = n_ops // cell
    cap_full = min(nc, 2 * SEEDED_ROUND_K + 16)
    nparts = 4
    while nc % nparts != 0 or (nparts > 1 and nc // nparts % 128):
        nparts //= 2
    pw = nc // nparts
    cap_fast = min(48, pw)
    # Unified per-round candidate width: the fast tier compacts
    # nparts * cap_fast cells, the escalation tier cap_full; both
    # dense-compact their recovered columns to the rerank cap (the
    # recovery width carries ~4x slack — see RERANK_COMPACT_CAP) so the
    # per-round lax.cond has one output shape AND the final rerank over
    # the concatenated rounds sorts rounds x 224 columns, not
    # rounds x 576.
    width = min(solvable * max(nparts * cap_fast, cap_full),
                RERANK_COMPACT_CAP)
    rounds = -(-kk // SEEDED_ROUND_K)

    def one_round(search, r_ops, lo, cs1, needed):
        """cs1: (m, 128) per-lane minima of {score > lo} — round 1's
        value-only pass, later rounds' fused remainder fold. Its
        needed-th smallest upper-bounds the needed-th remaining score."""
        bound = jax.lax.sort(cs1, dimension=-1)[:, needed - 1:needed]
        bound = _inflate_bound(bound, lo)
        a_pack, p3, rem = extract(search, r_ops, bound, lo)
        qual = a_pack != 0
        counted = jnp.sum(jnp.minimum(a_pack & 3, solvable), axis=1)
        # The extraction emits the compactor's OR-packed payloads
        # directly (in-kernel digit combine; bit 30 = cnt overflow).
        fields = (a_pack, p3)

        def pad_cols(cols):
            return jnp.pad(cols, ((0, 0), (0, width - cols.shape[1])),
                           constant_values=n)

        def tier(cap_i, parts_i):
            cols, _valid, rec_ok = _compact_and_solve(
                m, nc, parts_i, cap_i, fields, cell=cell, n=n,
                solvable=solvable)
            if cols.shape[1] > width:
                cols, okc = _compact_cols(cols, n, width)
                rec_ok = rec_ok & okc
            return pad_cols(cols), rec_ok

        def escalate(_):
            cols, rec_ok = tier(cap_full, 1)
            qual_rows = jnp.sum(qual, axis=1)
            return cols, rec_ok & jnp.all(qual_rows <= cap_full)

        if nparts > 1:
            part_q = jnp.sum(qual.reshape(m, nparts, pw), axis=2)
            fast_fits = jnp.all(part_q <= cap_fast)
        else:
            fast_fits = jnp.all(jnp.sum(qual, axis=1) <= cap_fast)
        cols_r, ok_r = jax.lax.cond(
            fast_fits, lambda _: tier(cap_fast, nparts), escalate, None)
        cert_r = (jnp.max(a_pack) < (1 << 30)) & ok_r
        return cols_r, cert_r, counted, bound, rem

    @jax.jit
    def run(search, r_ops, ref_aos):
        lo = jnp.full((m, 1), -jnp.inf, jnp.float32)
        # Round 1's bound source is the value-only pass; each extraction
        # then hands the NEXT round its remainder minima — strictly-
        # greater-than-bound band, matching the half-open partition.
        cs1 = pass1(search, r_ops)
        cols_all = []
        cert = jnp.bool_(True)
        counted = jnp.zeros((m,), jnp.int32)
        remaining = kk
        for r in range(rounds):
            needed = min(SEEDED_ROUND_K, remaining)
            cols_r, cert_r, counted_r, bound, cs1 = one_round(
                search, r_ops, lo, cs1, needed)
            cols_all.append(cols_r)
            cert &= cert_r
            counted += counted_r
            lo = bound
            remaining -= needed
        cert &= jnp.all(counted >= kk)
        cols = jnp.concatenate(cols_all, axis=1)
        idx_k, d2_k = _exact_rerank(search, ref_aos, cols, kk, n)

        def fallback(_):
            return fallback_run(search, r_ops, ref_aos)

        return jax.lax.cond(cert, lambda _: (idx_k, d2_k), fallback,
                            None)

    return run


@functools.lru_cache(maxsize=None)
def _build_topk(m: int, n: int, k: int, kk: int, n_ops: int,
                precision: str, method: str = "auto"):
    """Jitted top-K pipeline against a prepadded (k_pad, n_ops) SoA
    operand plus the AoS array for exact distances."""
    if n_ops < n or n_ops % 128 != 0:
        raise ValueError(f"operand width {n_ops} incompatible with n={n}")
    if method == "auto":
        method = _auto_method(m, kk)
    if method == "sweep":
        from tpu_knn.kernels.smallm import (
            SMALLM_MAX_K, SMALLM_MAX_M, smallm_applicable,
        )

        if smallm_applicable(m, k, n):
            # Tiny batches: two diff-form scans (kernels/smallm.py scores,
            # no MXU packed-dot prep). Pass 1 is the existing per-lane
            # top-1 kernel; the K-th smallest of its 128 per-lane minima
            # is a provable upper bound B on the global K-th score (K
            # distinct elements <= B exist), which seeds pass 2's K-state
            # so its insertion chain runs ~K times total instead of per
            # tile — near-K-independent: (16,1,2^24) K=8 5.31 -> 3.21 ms,
            # K=16 9.21 -> 3.39 (PERF_NOTES "Bound-seeded two-pass").
            from tpu_knn.kernels.smallm import _build_smallm_candidates

            pass1 = _build_smallm_candidates(m, n, k)
            pass2 = _build_smallm_topk_candidates(m, n, k, kk, n_ops=n_ops)

            @jax.jit
            def run(search, r_ops, ref_aos):
                _i1, cs1 = pass1(search, r_ops)
                bound = jnp.sort(cs1, axis=-1)[:, kk - 1:kk]   # (m, 1)
                ci, cs = pass2(search, r_ops, bound)
                return _finalize_topk(search, ref_aos, ci, cs, kk, n)

            return run
        else:
            # Batch regime: single unbounded MXU sweep. A bound-seeded
            # two-pass MXU variant (pass 1 fused top-1 -> bound -> seeded
            # sweep with a chunk-level lax.cond) was built and MEASURED
            # WORSE here — m=1024/n=2^20/K=8: 92 ms vs 24.6 (passes) vs
            # 58 (unbounded sweep): with tile_m query rows per tile, some
            # row qualifies in almost every chunk, so the data-dependent
            # branch pays its pipeline stall AND the insertion. Bound
            # seeding only wins in the smallm regime above, where the
            # whole state is 8 rows.
            tile_m, tile_n = _sweep_tiles(k, m, n, kk, precision)
            tile_n = min(tile_n, n_ops)
            while n_ops % tile_n != 0:
                tile_n -= 128
            candidates = _build_sweep_candidates(m, n, k, kk, tile_m, tile_n,
                                                 precision, n_ops=n_ops)

            @jax.jit
            def run(search, r_ops, ref_aos):
                ci, cs = candidates(search, r_ops)
                return _finalize_topk(search, ref_aos, ci, cs, kk, n)

            return run
    if method == "seeded":
        if not 1 <= kk <= SEEDED_MAX_NEIGHBORS:
            raise ValueError(
                f"seeded engine serves K in [1, {SEEDED_MAX_NEIGHBORS}]")
        if m > 2 * SEEDED_CHUNK_ROWS:
            # Split into SEEDED_CHUNK_ROWS-row sub-batches, each a full
            # independent pipeline with its own certification/fallback
            # (cost-neutral vs unsplit since the Pallas compactor — see
            # the constant's note). The chunk sweep is a PYTHON loop of
            # async dispatches of ONE compiled chunk pipeline — measured
            # against the alternatives at m = 2^17, k=16, K=15 (the
            # knn_graph regime, v5e):
            #   unrolled chunks inside one jit: clones the whole pipeline
            #     (Pallas kernels + cond fallback) per chunk — ~150 s
            #     compile for 128 copies; warm 0.22 s;
            #   lax.map over a chunk axis: ONE body but the scan-wrapped
            #     Pallas pipeline compiled ~4x SLOWER still (566 s);
            #     warm 0.29 s;
            #   this form: one ~5 s chunk compile (m=1024, n=2^17); the
            #     loop enqueues all chunks without readback (enqueue is
            #     ~12 us/dispatch, docs/DISPATCH_DECOMP.json), so chunks
            #     pipeline on device and warm time matches the fused
            #     program. Inside an outer trace (bench amplification at
            #     m > 2048, or shard_map's per-shard body) the jitted
            #     inner calls inline, degrading to the unrolled form —
            #     correct either way, so callers that can stay eager
            #     MUST (the `eager_chunked` marker below tells
            #     _build_topk_percall and the prepared-index path not to
            #     wrap this in an outer jit). Ragged tails are
            #     edge-padded into the last chunk, not compiled as a
            #     second size.
            c = SEEDED_CHUNK_ROWS
            m_pad = round_up(m, c)
            inner = _build_topk(c, n, k, kk, n_ops, precision, "seeded")

            def run_chunked(search, r_ops, ref_aos):
                q = search
                if m_pad != m:
                    q = jnp.concatenate(
                        [q, jnp.broadcast_to(q[-1:],
                                             (m_pad - m, q.shape[1]))])
                outs = [inner(q[s:s + c], r_ops, ref_aos)
                        for s in range(0, m_pad, c)]
                return (jnp.concatenate([o[0] for o in outs])[:m],
                        jnp.concatenate([o[1] for o in outs])[:m])

            run_chunked.eager_chunked = True
            return run_chunked
        # 64 < K <= 128 runs as ONE band when the reference is large
        # enough for 64-lane cells to stay sparse: a depth-2 pass 1
        # (each lane's two smallest — 256 distinct elements' scores)
        # provably bounds the global K-th score for K <= 256, replacing
        # the multi-round chain's second full reference read. Small nc
        # (or K > 128) keeps the score-band rounds.
        single_band = kk <= 2 * SEEDED_ROUND_K and n_ops // 64 >= 8 * kk
        if kk > SEEDED_ROUND_K and not single_band:
            return _build_seeded_rounds(m, n, k, kk, n_ops, precision)
        # Measured geometry (v5e tile sweeps, PERF_NOTES "Round-3"):
        # for the 4-field MXU-moment kernel 256x8192 is fastest (3.60 ms
        # at ds11 scale; 128x8192 3.80, 128x4096 4.24) and VMEM-safe —
        # 512x8192 crashes the Mosaic compile. The 8-field (K > 16)
        # mode's weight operand is twice as wide and prefers HALF the
        # tile: 256x4096 measured 7.56 ms P2 vs 8.94 at 256x8192
        # (r5_probe_variants). The kernel needs a power-of-two chunk
        # count whose moment columns divide or are divisible by 128;
        # pick the widest 128 * 2^p tile dividing the operand width
        # (128 always does).
        max_tile_n = (EXTRACT_TILE_N_QUAD if kk <= 16 else
                      EXTRACT_TILE_N_OCT if kk <= 32 else
                      EXTRACT_TILE_N_CUBIC if kk <= 64 else
                      EXTRACT_TILE_N_HEX)
        tile_n = _extract_tile_n(n_ops, max_tile_n, k)
        # Quad tile_m: 256 was tuned at the k=16 (tile_n=8192) geometry
        # (512x8192 crashes the Mosaic compile); at embedding-scale k
        # the VMEM budget already shrinks tile_n <= 2048, where 512 rows
        # fit comfortably AND halve the extraction's operand re-reads
        # (m_tiles 4 -> 2 at m=1024 — the reads are ~6 GB/call at k=768).
        tile_m = min(EXTRACT_TILE_M_CUBIC if (kk > 32 or tile_n <= 2048)
                     else EXTRACT_TILE_M, round_up(m, 8))
        extract = _build_extract_candidates(m, n, k, tile_m, tile_n,
                                            precision, n_ops=n_ops, kk=kk)
        # Pass 1 (the bound): the VALUE-ONLY per-lane minima fold — the
        # K-th smallest lane minimum is all the bound needs, so the
        # banded kernel's index fold (lane iota + second select per
        # chunk) was dead weight (scripts/r15_profile_seeded.py);
        # same score arithmetic and prepadded-operand protocol.
        p1_tile_m, p1_tile_n = pick_tiles(k, m, n,
                                          wide=precision == "packed")
        p1_tile_n = min(p1_tile_n, n_ops)
        while n_ops % p1_tile_n != 0:
            p1_tile_n -= 128
        # PREFIX-HALF bound pass (r5, VERDICT r4 items 3+4): the K-th
        # smallest per-lane minimum over any SUBSET of the reference is
        # still a valid upper bound on the global K-th score (a subset's
        # K-th smallest >= the full set's), so the quadratic path's
        # pass 1 reads only the first half of the operand — measured
        # 1.60 -> 0.84 ms at (16,1024,2^20) and ~half the k=128/768
        # bound-pass matmul (scripts/r23_topk_decomp.py). The looser
        # bound ~doubles the qualifier census (mean 17 -> 34, max 58 at
        # K=16), so the capacity ladder below scales to 4K+16 and the
        # escalating compaction absorbs the spread. K > 16 keeps the
        # full pass: the cubic/single-band paths' capacity is already
        # near the 256-slot compactor ceiling.
        # Fraction by K (measured census ladders, scripts/r23 +
        # /tmp probes committed in PERF_NOTES "Round-5"): K <= 8 reads
        # HALF (census mean ~18, max ~30 — fits the 4K+16 ladder with
        # no overflow tax); K <= 16 reads 3/4 (half's census mean 34 /
        # max 63 made a 3-qualifier CELL a ~30%-per-batch event, and
        # one overflow cell costs every row the expanded rerank:
        # +1.4 ms measured — 3/4's census mean 22.7 / max 37 showed
        # ZERO overflow cells across 5x1024 rows while keeping ~2/3 of
        # the half-prefix read saving). A quarter prefix blows even
        # 8K+16 into the passes fallback (measured 52 ms).
        p1_limit = None
        if kk <= 16 and n_ops >= (1 << 16):
            num, den = (1, 2) if kk <= 8 else (3, 4)
            part = (n_ops * num // den) // p1_tile_n * p1_tile_n
            if part >= p1_tile_n and min(n, part) >= 1024:
                p1_limit = part
        pass1 = _build_minima_candidates(m, n, k, p1_tile_m, p1_tile_n,
                                         precision, n_ops=n_ops,
                                         depth=2 if kk > 64 else 1,
                                         n_limit=p1_limit)
        # The certified fallback: exact for ANY qualifier distribution.
        fallback_run = _build_topk(m, n, k, kk, n_ops, precision, "passes")
        cell = extract.cell
        solvable = extract.solvable
        nc = n_ops // cell
        # Compaction capacity. The positional compactor's slot loop
        # costs cap * nc VPU passes, so a lean fast cap still pays
        # (historically the 48 figure came from XLA top_k's sort-cliff,
        # r5_probe_cap2 — the top_k compaction itself is gone,
        # r7_probe_compact{,2}.py), while the 2K+16 capacity formula
        # wants up to 80 at K=32. ESCALATING compaction gets both: every
        # batch first compacts at the fast cap (48); iff some row holds
        # more qualifiers, a lax.cond re-runs the compaction at full
        # capacity on device (no host sync). Observed qualifier maxima
        # over 64 perturbed reps (r5_probe_cap): 21 cells/row at K=16,
        # 47 at K=32 — so K <= 16 never escalates by construction
        # (cap_full == cap_fast) and K = 32 escalates only on qualifier
        # spikes past 48; only overflow PAST
        # cap_full routes to the fallback (the cap term of `certified`).
        cap_full = min(nc,
                       ((4 if kk <= 8 else 3) * kk + 16) if p1_limit
                       else (2 * kk + 16), 256)
        # The butterfly compactor's cost is cap-independent (cap only
        # sets the kept-slot slice), so the K > 64 single band affords a
        # generous per-part cap: ~2K+16 qualifiers spread over 8 parts
        # (mean ~34/part at K=128) need 96 to keep part spikes off the
        # escalation path.
        # Prefix-half bound (kk <= 16): the census lands at ~2K-4K on
        # EVERY large batch (mean 34, max 58 at K=16 over 1024 rows —
        # r23), so a two-tier 48-then-80 escalation would take the
        # escalated branch nearly always and pay recover+rerank TWICE
        # (measured 6.14 vs 5.05 ms end-to-end): run ONE tier at the
        # full 4K+16 capacity instead (the positional compactor's slot
        # loop grows only ~0.13 ms from 48 -> 80).
        cap_fast = cap_full if p1_limit else min(cap_full,
                                                 96 if kk > 64 else 48)
        # K > 32 needs more capacity than one narrow compaction can give
        # (2K+16 = 144 at K=64, qualifiers up to ~110/row): split the
        # cell axis into 4 parts with per-part cap 48 — total capacity
        # 192, cost K-independent. The Pallas compactor's slot loop
        # costs cap_per_part * nc ops, so the part split also CUTS its
        # cost 4x (the historical reason — keeping every lax.top_k call
        # under the XLA ~48-slot sort cliff, r6_probe_k64{b,c,d} — died
        # with the top_k compaction itself, r7_probe_compact{,2}.py).
        nparts = 8 if kk > 64 else 4 if kk > 32 else 1
        while nc % nparts != 0 or (nparts > 1 and nc // nparts % 128):
            nparts //= 2
        pw = nc // nparts

        @jax.jit
        def run(search, r_ops, ref_aos):
            cs1 = pass1(search, r_ops)
            # B = K-th smallest of the 128 per-lane minima: at least K
            # distinct elements score <= B, so the global K-th score is
            # <= B. Inflation + NaN handling: _inflate_bound.
            bound = jax.lax.sort(cs1, dimension=-1)[:, kk - 1:kk]
            bound = _inflate_bound(bound)
            # The kernel emits the packed payloads directly
            # (bit 30 = cnt-overflow certificate; + p3 for cubic).
            moms = extract(search, r_ops, bound)           # (m, nc) each
            a_pack_raw = moms[0]
            # Overflow cells (cnt > solvable, bit 30) are EXPANDED, not
            # fatal (r5): a cell the root solver cannot recover simply
            # contributes its WHOLE ``cell`` columns to the exact rerank
            # (conditional — the wide gather compiles but only runs on
            # overflow batches). Historically one overflowed cell
            # anywhere sent the entire batch to the ~10-25x passes
            # fallback; with the prefix-half bound's ~2x census that
            # P(cell cnt > 2) coin-flip fired on ~40% of 1024-row
            # batches (measured: k=128 top-16 98 ms vs the engine's
            # 13.2 — scripts/r21_quantized_embed.py vs the cert probe).
            # E = 1 overflow cell per row is expanded; >1 (P ~ 1e-4 per
            # batch) still falls back. Overflow cells are masked OUT of
            # the solver fields (their packed moments wrap — the solver
            # would emit garbage and fail rec_ok) and credit
            # solvable + 1 candidates (cnt > solvable means at least
            # that many) toward the count certificate.
            ov = (a_pack_raw >> 30) & 1                    # (m, nc) 0/1
            ov_rows = jnp.sum(ov, axis=1)
            a_pack = jnp.where(ov != 0, 0, a_pack_raw)
            p3m = moms[1] if solvable == 3 else None
            if p3m is not None:
                p3m = jnp.where(ov != 0, 0, p3m)
            cnt_ok = jnp.all(ov_rows <= 1)
            counted = (jnp.sum(jnp.minimum(a_pack & 3, solvable), axis=1)
                       + ov_rows * (solvable + 1))
            qual = a_pack != 0
            # Per-row overflow-cell id: with E = 1 the first set marker
            # IS the cell (argmax returns the first maximum).
            ov_cellpos = jnp.argmax(ov, axis=1).astype(jnp.int32)[:, None]
            has_ov = ov_rows[:, None] > 0                   # (m, 1)
            any_ov = jnp.any(has_ov)
            ov_cols = jnp.where(
                has_ov,
                ov_cellpos * cell
                + jax.lax.broadcasted_iota(jnp.int32, (m, cell), 1),
                n)                                          # n = sentinel
            # Compact the qualifying cells (escalating capacity; see the
            # cap comment above) with the Pallas positional compactor
            # (_cell_compact_kernel). The moment payloads ride along as
            # OR-packed int32 fields — A = min(cnt,3) | e1<<2 | p2<<12
            # always fits 30 bits for a LEGAL (cnt <= solvable) cell
            # (e1 <= 765 < 2^10, p2 <= 195075 < 2^18 at 256-lane cells)
            # and its low 2 bits are nonzero at every qualifier, which
            # is the kernel's qualifier test AND the compacted slots'
            # validity test; an illegal cell may wrap its high bits, but
            # the max(cnt) certificate already routes that batch to the
            # fallback. This replaced the payload-packed lax.top_k
            # ladder: top_k cost was intrinsic (batching parts into the
            # batch dim or stacking keys measured SLOWER), while the
            # compactor runs the same geometries at 2.4/1.2/0.7 ms vs
            # 6.6/~5/~3 (r7_probe_compact{,2}.py).
            qual_rows = jnp.sum(qual, axis=1)
            fields = (a_pack,) if solvable == 2 else (a_pack, p3m)
            def recover(cap_i, parts_i):
                """Compaction + lane recovery + exact rerank at capacity
                ``cap_i`` per part over ``parts_i`` cell-axis parts.
                Output shapes ((m, kk) twice + a certificate bit) are
                capacity-INDEPENDENT, so the escalation cond below can
                pick a capacity without width padding — the fast path's
                gathers/sort stay at the narrow width."""
                cols, _valid, rec_ok = _compact_and_solve(
                    m, nc, parts_i, cap_i, fields, cell=cell, n=n,
                    solvable=solvable)
                if cols.shape[1] > 256:
                    # K > 32 recovery widths (576 fast / 432 escalated;
                    # 2304 at the K=128 band) carry ~4x slack;
                    # dense-compact before the sort-dominated rerank
                    # (overflow joins the certificate). K > 64 needs
                    # ~2K+ slots: 2 parts x 256.
                    if kk > 64:
                        cols, okc = _compact_cols(cols, n, 256, parts=2)
                    else:
                        cols, okc = _compact_cols(cols, n)
                    rec_ok = rec_ok & okc

                def rr_plain(_):
                    return _exact_rerank(search, ref_aos, cols, kk, n)

                def rr_expanded(_):
                    # Overflow batches append each row's expanded
                    # overflow-cell columns (n sentinels elsewhere).
                    wide = jnp.concatenate([cols, ov_cols], axis=1)
                    return _exact_rerank(search, ref_aos, wide, kk, n)

                idx_k, d2_k = jax.lax.cond(any_ov, rr_expanded, rr_plain,
                                           None)
                return idx_k, d2_k, rec_ok

            # Certification: every qualifier was recovered iff no cell
            # overflowed the root solver (2 for quadratic, 3 for cubic
            # recovery), the cubic Newton iteration landed on an exact
            # root in every compacted cell, no row overflowed the cell
            # cap, and each row yielded >= K candidates. The fast
            # recovery runs UNconditionally (the certified-result cond
            # pattern measurably costs nothing when the heavy work sits
            # outside the cond); a qualifier spike past cap_fast
            # escalates INSIDE the cond chain to a full-capacity
            # recovery, and only overflow past cap_full (or a root-solver
            # overflow) reaches the passes fallback.
            cert_common = cnt_ok & jnp.all(counted >= kk)
            idx_f, d2_f, rec_ok_f = recover(cap_fast, nparts)
            if nparts > 1:
                part_q = jnp.sum(qual.reshape(m, nparts, pw), axis=2)
                fast_fits = jnp.all(part_q <= min(cap_fast, pw))
            else:
                fast_fits = jnp.all(qual_rows <= cap_fast)
            cert_fast = cert_common & rec_ok_f & fast_fits

            def fallback(_):
                return fallback_run(search, r_ops, ref_aos)

            if cap_full == cap_fast and nparts == 1:
                escalate = fallback
            else:
                # K > 64 escalates at parts=2 (2 x 256 capacity): the
                # typical band census is ~2K+16 (272 at K=128), above
                # the compactor's 256-slot per-part ceiling that a
                # parts=1 tier clamps to, so a part spike past cap_fast
                # used to degrade straight to the ~27x passes fallback
                # (ADVICE r4). Same per-part ceiling discipline as the
                # downstream _compact_cols(parts=2).
                esc_parts = (2 if kk > 64 and nc % 2 == 0
                             and (nc // 2) % 128 == 0 else 1)
                # Per-part cap 192 at parts=2 (2x192 = 384 capacity vs
                # the ~2K+16 = 272 typical census): cap 256 with the
                # (m, nc/2) part slices measured 12 KB OVER the 16 MB
                # scoped-VMEM limit at nc=16384 (K=128, n=2^20 — the
                # r17 anchor run); 192 fits with the same certificate.
                esc_cap = min(cap_full, 192) if esc_parts > 1 else cap_full

                def escalate(_):
                    idx_s, d2_s, rec_ok_s = recover(esc_cap, esc_parts)
                    if esc_parts > 1:
                        pq = jnp.sum(
                            qual.reshape(m, esc_parts, nc // esc_parts),
                            axis=2)
                        full_fits = jnp.all(
                            pq <= min(esc_cap, nc // esc_parts))
                    else:
                        full_fits = jnp.all(qual_rows <= cap_full)
                    cert_full = cert_common & rec_ok_s & full_fits
                    return jax.lax.cond(
                        cert_full, lambda _: (idx_s, d2_s), fallback,
                        None)

            return jax.lax.cond(
                cert_fast, lambda _: (idx_f, d2_f), escalate, None)

        return run
    if method != "passes":
        raise ValueError(f"unknown top-K method {method!r}")
    tile_m, tile_n = pick_tiles(k, m, n)
    # The banded kernel's geometry must tile the operand width exactly
    # (extra whole padding tiles are masked by the col < n test).
    tile_n = min(tile_n, n_ops)
    while n_ops % tile_n != 0:
        tile_n -= 128
    candidates = _build_banded_candidates(m, n, k, tile_m, tile_n, precision,
                                          n_ops=n_ops)

    @jax.jit
    def run(search, r_ops, ref_aos):
        def one_pass(carry, _):
            b_s, b_i = carry
            ci, cs = candidates(search, r_ops, b_s, b_i)
            pick, pick_s = _lex_min(ci, cs)
            valid = pick < n
            safe = jnp.where(valid, pick, 0)
            diff = search - jnp.take(ref_aos, safe, axis=0)
            d2 = jnp.where(valid, jnp.sum(diff * diff, axis=-1), jnp.inf)
            idx_out = jnp.where(valid, pick, -1)
            return (pick_s[:, None], pick[:, None]), (idx_out, d2)

        init = (jnp.full((m, 1), -jnp.inf, jnp.float32),
                jnp.full((m, 1), -1, jnp.int32))
        _, (idxs, d2s) = jax.lax.scan(one_pass, init, None, length=kk)
        idxs, d2s = idxs.T, d2s.T  # (m, K), pass order = approx-lex order
        # Output contract: exact (d2, index) ascending — v0's tie rule.
        order = jnp.lexsort((idxs, d2s), axis=-1)
        return (jnp.take_along_axis(idxs, order, axis=-1),
                jnp.take_along_axis(d2s, order, axis=-1))

    return run


@functools.lru_cache(maxsize=None)
def _build_aos_topk(m: int, n: int, k: int, kk: int, masked: bool = False):
    """Zero-prep per-call top-K for m <= 4: the AoS-scan design
    (kernels/smallm.py:_build_aos_scan, PERF_NOTES "Per-call prep
    transpose") extended to K results — no Pallas, no SoA relayout.

    Per query row (unrolled, m <= 4): one fused diff-form pass over the
    caller's (n, k) array materializes the score vector; the K-th
    smallest of the per-CELL minima (cells of C=4096 contiguous scores)
    is a provable upper bound B on the global K-th score (the K cells
    achieving the K smallest minima each contain a distinct point with
    score <= B). Cells holding any qualifier (score <= B) are compacted
    by one tiny sort of the (n/C,) cell ids, their score slices gathered
    as rows, and the (cap_c * C,) gathered block sorted by exact
    (d2, index) — v0's tie rule. More than cap_c qualifying cells (only
    adversarially dense near-duplicates; expected qualifying cells <~ K)
    is certified on device and lax.cond-falls back to a stable
    lax.top_k(-s) — exact for any distribution (XLA top_k breaks ties
    toward the lower index).

    Design note: compacting individual qualifier INDICES with
    jnp.nonzero(size=cap) measured 156 ms at n=2^24 — its sized form
    lowers to a full-length sort. Cell compaction sorts only the n/C
    cell ids (microseconds) and bounds the exact-sort input to
    cap_c * C elements; every pass over the score vector is linear.

    masked=True adds a dynamic ``live`` scalar argument: rows at index
    >= live score +inf (fused into the diff-form pass). A row selected
    anyway (live < K) comes back with d2 = +inf — callers MUST treat
    inf rows as dead (the lax.top_k fallback tier keeps their raw
    index). Positional exclusion for operands whose pad rows cannot
    carry +inf — int8 grid shards (distributed/sharded.py:
    _build_sharded_int8_topk).
    """
    C = 4096
    n_pad = round_up(n, C)
    ncell = n_pad // C
    cap_c = int(min(ncell, kk + 16))

    def _cell_stage(sp, cell_iota, lane_iota):
        """The 1-D postpass over a materialized (n_pad,) score vector."""
        spc = sp.reshape(ncell, C)
        cmin = jnp.min(spc, axis=1)                      # (ncell,)
        bound = jax.lax.sort(cmin)[min(kk, ncell) - 1]
        qual = jnp.any(spc <= bound, axis=1)             # (ncell,)
        nqual = jnp.sum(qual)
        key = jnp.where(qual, cell_iota, ncell)
        cellids = jax.lax.sort(key)[:cap_c]              # ascending
        live_c = cellids < ncell
        rows = spc[jnp.where(live_c, cellids, 0)]        # (cap_c, C)
        rows = jnp.where(live_c[:, None], rows, jnp.inf)
        gidx = jnp.where(live_c, cellids, 0)[:, None] * C + lane_iota
        flat_d = rows.reshape(-1)
        flat_i = jnp.where(
            (flat_d != jnp.inf) & (gidx.reshape(-1) < n),
            gidx.reshape(-1), _I32_MAX)
        ds, isrt = jax.lax.sort((flat_d, flat_i), dimension=0,
                                num_keys=2)
        idx_k = jnp.where(isrt[:kk] != _I32_MAX, isrt[:kk], -1)
        d2_k = ds[:kk]

        def fallback(_):
            nv, ni = jax.lax.top_k(-sp, kk)
            return ni.astype(jnp.int32), -nv

        return jax.lax.cond(nqual <= cap_c,
                            lambda _: (idx_k, d2_k), fallback, None)

    @jax.jit
    def run(search, ref, live=None):
        def mask(s):
            if not masked:
                return s
            return jnp.where(jax.lax.iota(jnp.int32, n) < live, s,
                             jnp.inf)

        cell_iota = jax.lax.iota(jnp.int32, ncell)
        lane_iota = jax.lax.iota(jnp.int32, C)
        if m == 1:
            # 1-D graph (the (1, n) row costs the 8x sublane-tiled
            # layout — same trap as _build_aos_scan).
            s = mask(jnp.sum((ref - search[0]) ** 2, axis=-1))  # (n,)
            sp = (jnp.pad(s, (0, n_pad - n), constant_values=jnp.inf)
                  if n_pad != n else s)
            ri, rd = _cell_stage(sp, cell_iota, lane_iota)
            return ri[None], rd[None]
        # m > 1: per-row 1-D scans. All three m>1 shapes were measured
        # at (m=4, k=16, K=16, n=2^24): this per-row loop 8.2 ms (m
        # roofline ref reads), a joint (m, n) graph 8.9 (sublane-padded
        # score rows), scores-transposed (n, m) + per-row postpass 11.1
        # (the (n,m,k) reduction does not fuse cleanly) — linear-in-m
        # is the best XLA offers here, which is why routing prefers the
        # prepared engines at m >= 2 (k >= 8) / m >= 2 (k < 8, top-K).
        rows_i, rows_d = [], []
        for r in range(m):
            s = mask(jnp.sum((ref - search[r]) ** 2, axis=-1))
            sp = (jnp.pad(s, (0, n_pad - n), constant_values=jnp.inf)
                  if n_pad != n else s)
            ri, rd = _cell_stage(sp, cell_iota, lane_iota)
            rows_i.append(ri)
            rows_d.append(rd)
        return jnp.stack(rows_i), jnp.stack(rows_d)

    return run


@functools.lru_cache(maxsize=None)
def _build_topk_percall(m: int, n: int, k: int, kk: int, precision: str,
                        method: str = "auto"):
    from tpu_knn.kernels.smallm import SMALLM_MAX_K, SMALLM_MAX_M

    if method == "aos" or (
            method == "auto" and kk <= MAX_NEIGHBORS
            and (m <= 2 or (m <= SMALLM_MAX_M
                            and (k < 8 or k > SMALLM_MAX_K)))):
        # Per-call small-m: zero-prep AoS engine (the pad+T relayout
        # alone costs ~2x this engine's whole runtime at (2^24, 16)).
        # The engine is linear in m (one roofline scan per row), so auto
        # hands m >= 3 at k >= 8 back to prep+sweep (~6.9 ms flat at
        # (2^24,16,K=16) vs m x 2.05 here); at k < 8 the relayout's 8/k
        # read amplification keeps aos ahead through m=4, and at
        # embedding-scale k (> 32) the sweep's operand-budget tiles
        # stream far below bandwidth while the relayout doubles the
        # already-large prep traffic — aos covers m <= 4 there too.
        if not (1 <= m <= SMALLM_MAX_M):
            raise ValueError(
                f"aos top-K serves 1 <= m <= {SMALLM_MAX_M}, got {m}")
        if kk > MAX_NEIGHBORS:
            raise ValueError(
                f"aos top-K serves K <= {MAX_NEIGHBORS}, got {kk}")
        return _build_aos_topk(m, n, k, kk)
    if method == "auto":
        method = _auto_method(m, kk)
    if method == "sweep":
        from tpu_knn.kernels.smallm import pick_tile_n, smallm_applicable

        if smallm_applicable(m, k, n):
            tile_n = pick_tile_n(k, n)
        else:
            _, tile_n = _sweep_tiles(k, m, n, kk, precision)
    else:
        _, tile_n = pick_tiles(k, m, n)
    n_ops = round_up(n, tile_n)
    run = _build_topk(m, n, k, kk, n_ops, precision, method)
    k_pad = round_up(k, 8)

    if getattr(run, "eager_chunked", False):
        # Chunked seeded engine (m > 2 * SEEDED_CHUNK_ROWS): wrapping the
        # Python dispatch loop in an outer jit would inline every chunk
        # into one giant XLA program (measured 49 s compile at
        # m = n = 2^17 vs 4.9 s for this form, identical outputs —
        # scripts/r9_graph_cold_decomp2.py). Jit only the operand prep;
        # the chunk calls enqueue eagerly and pipeline on device.
        prep = jax.jit(
            lambda r: jnp.pad(r, ((0, n_ops - n), (0, k_pad - k))).T)

        def go(search, ref):
            return run(search, (prep(ref),), ref)

        return go

    @jax.jit
    def go(search, ref):
        r_op = jnp.pad(ref, ((0, n_ops - n), (0, k_pad - k))).T
        return run(search, (r_op,), ref)

    return go


def topk_knn(search, ref, neighbors: int, method: str = "auto"):
    """Exact K-nearest-neighbors: (m, k) queries against (n, k) refs.

    Returns (idx (m, K) i32, d2 (m, K) f32), each row ascending by exact
    (squared distance, index). Requires neighbors <= n. `method` selects
    the engine: "aos" (zero-prep XLA scan, m <= 4 and K <= 128 — the
    per-call default in that regime), "sweep" (one reference read,
    K <= SWEEP_MAX_NEIGHBORS), "passes" (K banded reads,
    K <= PASSES_MAX_NEIGHBORS), "seeded" (the extraction engine —
    single-round to K = 64, score-band ROUNDS at ~2 reads per 64
    results beyond, to K <= PASSES_MAX_NEIGHBORS), or "auto" (the
    measured winner; the passes engine remains every tier's certified
    fallback and the radius-escalation workhorse).
    """
    search = jnp.asarray(search, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    m, k = search.shape
    n = ref.shape[0]
    if not (1 <= neighbors <= min(n, PASSES_MAX_NEIGHBORS)):
        raise ValueError(
            f"neighbors must be in [1, min(n, {PASSES_MAX_NEIGHBORS})] = "
            f"[1, {min(n, PASSES_MAX_NEIGHBORS)}], got {neighbors}")
    if method == "sweep" and neighbors > SWEEP_MAX_NEIGHBORS:
        raise ValueError(
            f"sweep engine serves K <= {SWEEP_MAX_NEIGHBORS}, got {neighbors}")
    if (method not in ("passes", "seeded", "auto")
            and neighbors > MAX_NEIGHBORS):
        raise ValueError(
            f"K > {MAX_NEIGHBORS} requires method='seeded' or 'passes', "
            f"got {method!r} with K={neighbors}")
    return _build_topk_percall(m, n, k, neighbors,
                               auto_precision(k, n), method)(search, ref)


def _radius_query(topk_fn, n_live: int, radius: float,
                  max_results, start_cap: int = 32):
    """Shared fixed-radius machinery (review r3: the single-shot clamp/
    pad logic and the doubling-escalation loop previously lived twice,
    here and in NNIndex.query_radius, and had already drifted).

    ``topk_fn(eff_cap) -> (idx (m, eff_cap), d2)`` supplies the exact
    top-K engine (per-call or prepared-index). ``max_results`` int =
    single-shot with that cap (clamped to ``n_live``, padded back);
    None = escalate (doubling; each cap a compile-cache bucket) until
    every row's TRUE in-radius set is returned. Returns
    (idx, d2, count); raises past min(n_live, PASSES_MAX_NEIGHBORS).
    """
    if not float(radius) >= 0.0:   # also rejects NaN
        raise ValueError(f"radius must be non-negative, got {radius}")
    limit = min(n_live, PASSES_MAX_NEIGHBORS)
    r2 = float(radius) ** 2

    def one_shot(cap):
        eff = min(cap, n_live)
        if eff > limit:
            raise ValueError(
                f"max_results={cap} exceeds the radius-query engine "
                f"ceiling min(n, {PASSES_MAX_NEIGHBORS}); shrink the cap "
                "or partition the reference set")
        idx, d2 = topk_fn(eff)
        idx, d2 = jnp.asarray(idx), jnp.asarray(d2)
        inside = d2 <= r2
        idx = jnp.where(inside, idx, -1)
        d2 = jnp.where(inside, d2, jnp.inf)
        if eff < cap:   # cap clamped to n_live: pad back to the
            pad = ((0, 0), (0, cap - eff))   # requested static width
            idx = jnp.pad(idx, pad, constant_values=-1)
            d2 = jnp.pad(d2, pad, constant_values=jnp.inf)
        return idx, d2, jnp.sum(inside, axis=-1).astype(jnp.int32)

    if max_results is not None:
        if max_results < 1:
            raise ValueError(
                f"max_results must be >= 1, got {max_results}")
        return one_shot(max_results)
    cap = min(max(1, start_cap), limit)
    while True:
        idx, d2, count = one_shot(cap)
        if cap >= n_live:   # every point examined: complete
            return idx, d2, count
        counts = np.asarray(jax.device_get(count))
        if int(counts.max(initial=0)) < cap:
            return idx, d2, count
        if cap >= limit:
            raise ValueError(
                f"radius {radius} captures >= {limit} neighbors for "
                f"some query — beyond the engine ceiling min(n, "
                f"{PASSES_MAX_NEIGHBORS}); shrink the radius or "
                "partition the reference set")
        cap = min(cap * 2, limit)


def within_radius(search, ref, radius: float, max_results: int,
                  method: str = "auto"):
    """Exact fixed-radius neighbors, capped at ``max_results`` per query
    (the TPU-shaped contract for a variable-size result: static output
    shape, distance-ordered truncation — the convention production NN
    engines use for radius queries on accelerators).

    Returns (idx (m, max_results) i32, d2 (m, max_results) f32,
    count (m,) i32): per query, the up-to-``max_results`` nearest points
    with exact squared distance <= radius**2, rows ascending by exact
    (d2, index) and padded with idx -1 / d2 +inf; ``count`` is the number
    of RETURNED neighbors (== the true in-radius count whenever
    count < max_results — a full row means the cap MAY have truncated;
    ``within_radius_complete`` escalates the cap until no row truncates).
    Built on the top-K engines: one (or two bound-seeded) reference
    read(s) in the serving regime. ``max_results`` beyond ``n`` is served
    (clamped internally — a generous cap on a small reference set is
    valid); beyond PASSES_MAX_NEIGHBORS on a larger set it raises.
    """
    ref = jnp.asarray(ref, jnp.float32)
    return _radius_query(
        lambda eff: topk_knn(search, ref, eff, method),
        ref.shape[0], radius, max_results)


def within_radius_complete(search, ref, radius: float, *,
                           start_cap: int = 32, method: str = "auto"):
    """Fixed-radius neighbors with NO truncation: escalates the result
    cap (doubling — each cap is a compile-cache bucket) until every row
    reports fewer neighbors than the cap, i.e. the true in-radius set.

    Returns (idx (m, cap) i32, d2 (m, cap) f32, count (m,) i32) where
    ``cap`` is the final escalation width and ``count`` is each query's
    TRUE in-radius count. Raises if the radius captures more than
    min(n, PASSES_MAX_NEIGHBORS) points for some query — the static-
    shape contract's honest limit (partition the reference set beyond).
    The recovery loop the reference-style guard/verify/delegate
    discipline implies (VERDICT r2 item 7): each escalation is a fresh
    scan, amortized by the compile cache across calls.
    """
    ref = jnp.asarray(ref, jnp.float32)
    return _radius_query(
        lambda eff: topk_knn(search, ref, eff, method),
        ref.shape[0], radius, None, start_cap=start_cap)
