"""v3-v6 — the fused Pallas streaming 1-NN kernel.

The reference's key optimization arc (core.cu:231-643) fuses the distance
computation with the argmin so the m*n matrix never reaches main memory
(v3), fixes the memory layout for coalescing (v4's AoS->SoA transpose,
core.cu:315-330), and pins operands in specialized read-only memory spaces
(v5 texture, v6 constant). The TPU-native shape of each idea:

- fusion      -> one Pallas kernel: per (m-tile, n-tile) grid step, an MXU
                 matmul produces the score tile  s = ‖r‖² − 2·q·r  (the
                 ‖q‖² term is argmin-invariant and dropped), and a running
                 (best, index) pair lives in VMEM scratch across the
                 sequential n sweep. HBM traffic is exactly one read of R —
                 the "blockwise attention" pattern with (min, argmin) in
                 place of running softmax.
- layout      -> v4 stores R as SoA (k, n): n rides the 128-wide lanes, k
                 the sublanes, so reference loads use full lanes and the
                 matmul contraction sits on the RHS sublane axis. v3 keeps
                 the AoS (n, k) layout and pays an on-chip transpose per
                 tile, preserving the reference's v3-vs-v4 capability
                 distinction (and its measurable cost).
- memory space-> queries are VMEM-resident across the whole n sweep (their
                 block index map is constant in the n grid axis, so Pallas
                 fetches them once per m-tile) — v6's constant-memory
                 broadcast. v6 additionally keeps the *entire* query set
                 resident with a VMEM-budget guard and v4 fallback,
                 mirroring v6's k*m<=16384 guard (core.cu:603-607).

Two TPU-specific performance choices, both measured on v5e:

1. The score matmul runs as a manual bf16x3 split by default ("bf16x3"):
   q and r are split into bf16 (hi, lo) pairs and q·r is computed as
   hi·hi + hi·lo + lo·hi on the MXU with f32 accumulation — 3 MXU passes
   instead of HIGHEST's 6, with ~2^-21 relative error, far inside the
   harness' ±1e-3 tolerance (the reference itself compiles -use_fast_math
   and gates by tolerance, BASELINE.md). "highest" (true f32) and
   "default" (single bf16 pass — fails the gate at n=2^20; kept for
   measurement) are selectable.
2. The running reduction is elementwise per lane slot: scratch holds a
   (tile_m, 128) best-score and best-index pair, folded with pure VPU
   compare/select ops — no cross-lane reduction anywhere in the hot loop.
   The kernel emits the 128 per-lane candidates; a final XLA pass
   (_refine) recomputes their distances exactly in f32 diff form — whose
   error scales with d² itself, fixing the norm-trick's catastrophic
   cancellation for near-duplicates — and resolves exact ties to the
   lowest reference index, preserving v0's semantics (core.cu:50-54).

The refinement output (exact squared distance per winner) is what
multi-level reducers fold: v7's single-chip two-level reduce and v8's
cross-chip allreduce compare exact d², which is directly comparable across
reference shards.
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

#: Score-matmul precision mode: "bf16x3" (default), "highest", "default".
DEFAULT_PRECISION = "bf16x3"

_I32_MAX = np.int32(2**31 - 1)


def _split_bf16(x):
    """Split f32 into (hi, lo) bf16 so x ≈ hi + lo (error ~2^-17 |x|)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_bf16_3(x):
    """Split f32 into (hi, mid, lo) bf16: x ≈ hi+mid+lo, error ~2^-26 |x|
    (more mantissa than f32 itself carries — effectively exact)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _packed_terms(k_pad: int):
    """Choose the packed-contraction term list for k_pad contraction rows.

    The MXU pass cost is k-independent below 128 (the systolic depth is
    always padded), so unused contraction slots are FREE precision: packing
    split-product terms side by side computes a multi-term compensated dot
    in a single pass. Returns (n_splits, term_pairs) where term_pairs lists
    (q_part_idx, r_part_idx) into the split tuple.
    """
    if 9 * k_pad <= 128:
        # full 3x3: near-exact (~2^-26 relative)
        return 3, [(i, j) for i in range(3) for j in range(3)]
    if 8 * k_pad <= 128:
        # 3-split, drop lo·lo (~2^-34 relative — still effectively exact)
        return 3, [(i, j) for i in range(3) for j in range(3)
                   if not (i == 2 and j == 2)]
    if 4 * k_pad <= 128:
        # 2x2: bf16x4 quality (~2^-17 representation error)
        return 2, [(i, j) for i in range(2) for j in range(2)]
    return 0, []  # does not fit — caller falls back to multi-pass


def _qr_dot_packed(q_tile, r_tile, n_splits: int, pairs):
    """Single-pass compensated dot: split q (lanes) and r (sublanes) into
    bf16 parts and concatenate one (q_part, r_part) block per term along
    the contraction axis."""
    q_parts = _split_bf16_3(q_tile) if n_splits == 3 else _split_bf16(q_tile)
    r_parts = _split_bf16_3(r_tile) if n_splits == 3 else _split_bf16(r_tile)
    q_cat = jnp.concatenate([q_parts[i] for i, _ in pairs], axis=1)
    r_cat = jnp.concatenate([r_parts[j] for _, j in pairs], axis=0)
    return jax.lax.dot_general(
        q_cat, r_cat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _qr_dot(q_tile, r_tile, precision: str):
    """(tile_m, kp) x (kp, tile_n) -> (tile_m, tile_n) f32 on the MXU."""
    dims = (((1,), (0,)), ((), ()))
    if precision == "bf16_raw":
        # ONE uncompensated bf16 pass (~2^-8 relative representation
        # error) — 3x less MXU than bf16x3 at contraction widths too
        # wide to pack. Selection-quality only: callers must pair it
        # with exact refinement AND accept bf16-resolution near-tie
        # misrank (evaluated at embedding scale in
        # scripts/r16_measure_misc.py section E).
        return jax.lax.dot_general(
            q_tile.astype(jnp.bfloat16), r_tile.astype(jnp.bfloat16),
            dimension_numbers=dims, preferred_element_type=jnp.float32)
    if precision == "qsplit2":
        # Quantized-store tier (NNIndex store="bf16"/"int8"): the stored
        # operand is EXACTLY representable in bf16 (bf16 points / grid
        # integers <= 127), so the bf16x3 ladder's r-side split is dead
        # weight (r_lo = 0 identically). Two MXU passes (q_hi·r + q_lo·r)
        # carry the SAME error term as bf16x3 — only q's 2-split
        # truncation, ~2^-17 relative — at 2/3 the MXU time, and the
        # operand stays bf16 in HBM (half the reads). UNSOUND for f32
        # operands (the downcast would silently lose 2^-8 of r):
        # fused_knn rejects it at the public entry; NNIndex selects it
        # only for bf16-exact stores (VERDICT r4 item 1).
        q_hi, q_lo = _split_bf16(q_tile)
        r_bf = r_tile.astype(jnp.bfloat16)

        def d2p(a):
            return jax.lax.dot_general(
                a, r_bf, dimension_numbers=dims,
                preferred_element_type=jnp.float32)

        return d2p(q_hi) + d2p(q_lo)
    if precision == "packed":
        n_splits, pairs = _packed_terms(q_tile.shape[1])
        if n_splits:
            return _qr_dot_packed(q_tile, r_tile, n_splits, pairs)
        precision = "bf16x3"  # contraction too wide to pack — multi-pass
    if precision in ("bf16x3", "bf16x3_presplit", "bf16x4"):
        q_hi, q_lo = _split_bf16(q_tile)
        r_hi, r_lo = _split_bf16(r_tile)

        def d(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )

        qr = d(q_hi, r_hi) + (d(q_hi, r_lo) + d(q_lo, r_hi))
        if precision == "bf16x4":
            # The lo·lo term (~2^-18 of |q||r| per term) dominates bf16x3's
            # error; including it buys ~8x margin where near-ties are
            # uncorrelated (large n, small k — see auto_precision).
            qr = qr + d(q_lo, r_lo)
        return qr
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        q_tile, r_tile, dimension_numbers=dims,
        preferred_element_type=jnp.float32, precision=prec,
    )


def auto_precision(k: int, n: int) -> str:
    """Precision tier for the score matmul.

    The ±1e-3 gate is tightest where nearest-neighbor distances are tiny
    relative to coordinate scale: for uniform data d_NN ~ n^(-1/k), so the
    squared-space gate width shrinks as n grows and k falls. Observed:
    bf16x3 passes everywhere tested up to n=2^20, but at (k=3, n=2^24) a
    lane eviction exceeded tolerance (caught by v11's exact window path).
    For k <= 32 the packed single-pass dot applies (unused contraction
    slots carry the split terms): k_pad <= 16 gives ~2^-26 relative error
    (beyond f32 — always gate-safe), k <= 32 gives bf16x4 quality, which
    is safe wherever the log-rule wouldn't demand better (that only
    happens for k <= 3, where the exact 3-split always fits). For k > 32
    the multi-pass ladder applies: bf16x3 -> bf16x4 when log2(n) > 5k ->
    full f32 when log2(n) > 7k — at (k=3, n=2^24) bf16x4's 2^-17
    representation error left 1/16 queries beyond tolerance, which is how
    this rule was calibrated (caught by v11's exact window path).
    """
    import math

    from tpu_knn.utils.shapes import round_up as _ru

    if 4 * _ru(k, 8) <= 128:
        return "packed"
    log2n = math.log2(max(n, 2))
    if log2n > 7 * k:
        return "highest"
    if log2n > 5 * k:
        return "bf16x4"
    return DEFAULT_PRECISION


def _score_tile(q_tile, r_tile, *, soa: bool, precision: str,
                fuse_norm: bool = False):
    """Scores for one tile.

    fuse_norm=False: the norm-trick form ‖r‖²−2q·r (lower = nearer).
    fuse_norm=True: the operands arrive augmented — r carries an extra row
    holding ‖r‖² and q an extra -0.5 column — so the MXU computes
    s' = q·r − ‖r‖²/2 = −(‖r‖²−2q·r)/2 in the same passes (the padded
    contraction makes the extra row free) and HIGHER is nearer; the norm
    subtraction disappears from the VPU hot loop entirely.

    soa: r_tile is (kp, tile_n); aos: r_tile is (tile_n, kp) and pays an
    on-chip transpose (the v3-vs-v4 distinction, README.md:105-111).

    A bf16 r_tile (NNIndex store="bf16": the operand holds quantized
    points) is upcast here — exactly representable, so every downstream
    score equals the f32 pipeline's over the quantized point set, and
    the bf16 splits see r_lo = 0.
    """
    if r_tile.dtype != jnp.float32:
        r_tile = r_tile.astype(jnp.float32)
    if not soa:
        r_tile = r_tile.T
    if fuse_norm:
        return _qr_dot(q_tile, r_tile, precision)
    r_norm = jnp.sum(r_tile * r_tile, axis=0, keepdims=True)  # (1, tile_n)
    return r_norm - 2.0 * _qr_dot(q_tile, r_tile, precision)


def _fold_scores(s, base_col, cur_s, cur_i, maximize: bool = False):
    """Fold a (tile_m, tile_n) score tile into the per-lane running
    (score, index) pair with pure elementwise VPU ops. Strict compare keeps
    the earliest (lowest) n per lane slot."""
    tile_m, tile_n = s.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_m, 128), 1)
    for c in range(tile_n // 128):
        sc = s[:, c * 128:(c + 1) * 128]
        better = sc > cur_s if maximize else sc < cur_s
        cur_i = jnp.where(better, lane + (base_col + c * 128), cur_i)
        # where (not minimum/maximum): padded rows can score NaN through
        # the bf16 split of an inf norm, and min/max would propagate it.
        cur_s = jnp.where(better, sc, cur_s)
    return cur_s, cur_i


def _score_tile_presplit(q_tile, r_hi, r_lo, r_norm):
    """Scores from pre-split bf16 operands: the three bf16 MXU passes cost
    barely more than one (measured 2.44 vs 2.33 ms for 3x vs 1x at ds11
    shape — the passes pipeline), while in-kernel f32->bf16 splitting plus
    f32 operand traffic costs ~2x. q is split here (tiny); r arrives as
    (hi, lo) bf16 rows plus a precomputed f32 ‖r‖² row from the XLA prep."""
    q_hi, q_lo = _split_bf16(q_tile)

    def d(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    qr = d(q_hi, r_hi) + (d(q_hi, r_lo) + d(q_lo, r_hi))
    return r_norm - 2.0 * qr


def _fused_presplit_kernel(q_ref, r_hi_ref, r_lo_ref, r_norm_ref, out_i_ref,
                           out_s_ref, best_s, best_i, *,
                           n: int, tile_n: int, n_tiles: int):
    """Pre-split SoA variant of _fused_kernel (same fold/tie semantics)."""
    j = pl.program_id(1)
    ragged = n_tiles * tile_n != n

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, jnp.inf)
        best_i[:] = jnp.full_like(best_i, _I32_MAX)

    s = _score_tile_presplit(q_ref[:], r_hi_ref[:], r_lo_ref[:], r_norm_ref[:])
    tile_m = s.shape[0]
    if ragged:
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 1) + j * tile_n
        s = jnp.where(col < n, s, jnp.inf)

    cur_s, cur_i = _fold_scores(s, j * tile_n, best_s[:], best_i[:])
    best_s[:] = cur_s
    best_i[:] = cur_i

    @pl.when(j == n_tiles - 1)
    def _():
        out_i_ref[:] = cur_i
        out_s_ref[:] = cur_s


def _fused_kernel(q_ref, r_ref, out_i_ref, out_s_ref, best_s, best_i, *,
                  n: int, tile_n: int, n_tiles: int, soa: bool,
                  precision: str, fuse_norm: bool = False):
    """Grid (m_tiles, n_tiles), n innermost; scratch carries the per-lane
    running (score, index) across the n sweep.

    Output is the (tile_m, 128) per-lane *candidate set*, not a single
    winner: the norm-trick score suffers catastrophic cancellation when
    the true distance is tiny (error is relative to ‖r‖², not d²), so the
    final selection recomputes exact f32 diff-form distances over the 128
    candidates outside the kernel (see _refine) — errors there scale with
    d² itself, matching the reference's diff-form conditioning
    (core.cu:44-49)."""
    j = pl.program_id(1)
    ragged = n_tiles * tile_n != n
    worst = -jnp.inf if fuse_norm else jnp.inf

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, worst)
        best_i[:] = jnp.full_like(best_i, _I32_MAX)

    s = _score_tile(q_ref[:], r_ref[:], soa=soa, precision=precision,
                    fuse_norm=fuse_norm)
    tile_m = s.shape[0]
    if ragged:
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 1) + j * tile_n
        s = jnp.where(col < n, s, worst)

    cur_s, cur_i = _fold_scores(s, j * tile_n, best_s[:], best_i[:],
                                maximize=fuse_norm)
    best_s[:] = cur_s
    best_i[:] = cur_i

    @pl.when(j == n_tiles - 1)
    def _():
        out_i_ref[:] = cur_i
        # Scores are ordinal (selection only): negate the fused-norm
        # variant's running-max form so lower = nearer uniformly.
        out_s_ref[:] = -cur_s if fuse_norm else cur_s


@functools.lru_cache(maxsize=None)
def _build_fused_candidates(m: int, n: int, k: int,
                            tile_m: int, tile_n: int, soa: bool,
                            precision: str = DEFAULT_PRECISION,
                            fuse_norm: bool = False,
                            prepadded_soa: bool = False):
    # fuse_norm measured slower on v5e (k_pad 16->24 costs an extra
    # ceil(k/8) contraction group per MXU pass; tile_n=1024 additionally
    # hits a pathological Mosaic path) — kept as an option, off by default.
    """Build the candidate stage: (search (m,k), ref (n,k)) -> (m, 128)
    per-lane candidate indices. Traceable (jit/vmap-able); v7 vmaps it over
    n-partitions and v8 runs it per mesh shard.

    prepadded_soa: the reference operand arrives already in the padded
    (k_pad, n_pad) SoA layout (NNIndex's prepared path) — skip the per-call
    pad+transpose."""
    if prepadded_soa and (not soa or fuse_norm):
        raise ValueError("prepadded_soa requires soa=True, fuse_norm=False")
    # EXPERIMENTAL non-default: pre-split r into bf16 (hi, lo) + f32 norms
    # in the XLA prep. A microbenchmark showed 3 bf16 MXU passes pipeline
    # to ~1-pass cost with bf16 operands, but the full kernel miscompiles
    # or hits a pathological Mosaic path on v5e (1.3 s AND 496/1024 real
    # errors at k=3, n=2^20, while interpret mode is correct) — kept for
    # investigation, off by default. See docs/PERF_NOTES.md.
    presplit = soa and precision == "bf16x3_presplit" and not fuse_norm
    if tile_n % 128 != 0 or tile_n <= 0:
        raise ValueError(
            f"tile_n must be a positive multiple of 128 (lane width), got "
            f"{tile_n}: the per-lane fold would silently drop the remainder"
        )
    if tile_m % 8 != 0 or tile_m <= 0:
        raise ValueError(
            f"tile_m must be a positive multiple of 8 (f32 sublanes), got {tile_m}"
        )
    fuse_norm = fuse_norm and soa
    # SoA blocks put k on sublanes (pad to 8); AoS blocks put k on lanes,
    # where padding k would force XLA to materialize an 8-16x padded copy
    # of the whole reference array (observed HBM OOM at n=2^24, k=3) — the
    # MXU pads the contraction internally instead.
    k_aug = k + 1 if fuse_norm else k  # extra row carries ‖r‖²
    if presplit:
        k_pad = round_up(k_aug, 16)  # bf16 sublane granularity
    elif soa:
        k_pad = round_up(k_aug, 8)
    else:
        k_pad = k
    m_pad = round_up(m, tile_m)
    n_pad = round_up(n, tile_n)
    m_tiles = m_pad // tile_m
    n_tiles = n_pad // tile_n
    q_spec = pl.BlockSpec((tile_m, k_pad), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_m, 128), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    common = dict(
        grid=(m_tiles, n_tiles),
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((m_pad, 128), jnp.int32),
                   jax.ShapeDtypeStruct((m_pad, 128), jnp.float32)],
        scratch_shapes=[
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
    if presplit:
        kernel = functools.partial(
            _fused_presplit_kernel, n=n, tile_n=tile_n, n_tiles=n_tiles,
        )
        rb_spec = lambda: pl.BlockSpec((k_pad, tile_n), lambda i, j: (0, j),
                                       memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            in_specs=[
                q_spec,
                rb_spec(),
                rb_spec(),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            **common,
        )
    else:
        kernel = functools.partial(
            _fused_kernel, n=n, tile_n=tile_n, n_tiles=n_tiles, soa=soa,
            precision=precision, fuse_norm=fuse_norm,
        )
        if soa:
            r_spec = pl.BlockSpec((k_pad, tile_n), lambda i, j: (0, j),
                                  memory_space=pltpu.VMEM)
        else:
            r_spec = pl.BlockSpec((tile_n, k_pad), lambda i, j: (j, 0),
                                  memory_space=pltpu.VMEM)
        call = pl.pallas_call(kernel, in_specs=[q_spec, r_spec], **common)

    def prep_soa(ref):
        """(n, k) f32 -> the kernel's reference operands."""
        r = jnp.pad(ref, ((0, n_pad - n), (0, k_pad - k))).T  # (k_pad, n_pad)
        if not presplit:
            return (r,)
        hi = r.astype(jnp.bfloat16)
        lo = (r - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rn = jnp.sum(r * r, axis=0, keepdims=True)  # (1, n_pad) f32
        return hi, lo, rn

    def candidates(search, ref):
        """Returns (idx (m,128) i32, score (m,128) f32) — the per-lane
        candidate set plus its ordinal scores (consumed by _refine's
        top-T selection; lower = nearer in every variant)."""
        if prepadded_soa:
            # `ref` is the operand tuple produced by candidates.prep_soa.
            q = jnp.pad(search, ((0, m_pad - m), (0, k_pad - k)))
            ci, cs = call(q, *ref)
            return ci[:m], cs[:m]
        if fuse_norm:
            # Augment: r gains a ‖r‖² row, q a matching -0.5 column, so the
            # MXU computes q·r − ‖r‖²/2 in the same (contraction-padded)
            # passes and the kernel's fold is a pure running max.
            r_norm = jnp.sum(ref * ref, axis=1, keepdims=True)
            ref_aug = jnp.concatenate([ref, r_norm], axis=1)
            q_col = jnp.full((search.shape[0], 1), -0.5, search.dtype)
            search_aug = jnp.concatenate([search, q_col], axis=1)
            q = jnp.pad(search_aug, ((0, m_pad - m), (0, k_pad - k_aug)))
            r = jnp.pad(ref_aug, ((0, n_pad - n), (0, k_pad - k_aug))).T
            ci, cs = call(q, r)
            return ci[:m], cs[:m]
        q = jnp.pad(search, ((0, m_pad - m), (0, k_pad - k)))
        if soa:
            # v4's mat_inv analog: one XLA transpose into (k, n) so n rides
            # the lanes (reference core.cu:315-330; README.md:105-111) —
            # fused with the bf16 split / norm precompute for presplit.
            ci, cs = call(q, *prep_soa(ref))
            return ci[:m], cs[:m]
        r = jnp.pad(ref, ((0, n_pad - n), (0, 0)))
        ci, cs = call(q, r)
        return ci[:m], cs[:m]

    candidates.prep_soa = prep_soa
    return candidates


def _fused_banded_kernel(q_ref, r_ref, bs_ref, bi_ref, out_i_ref, out_s_ref,
                         best_s, best_i, *,
                         n: int, tile_n: int, n_tiles: int,
                         precision: str):
    """Lex-banded variant of _fused_kernel for top-K sweeps: elements with
    (score, col) lexicographically <= the per-query bound are masked to
    +inf BEFORE the fold. The bound is a previously-REPORTED point's score
    from this very kernel, so the comparison is approx-vs-approx and the
    exclusion is bit-exact — the excluded point's lane then yields its
    runner-up (per-lane top-1 state is enough for K passes)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, jnp.inf)
        best_i[:] = jnp.full_like(best_i, _I32_MAX)

    s = _score_tile(q_ref[:], r_ref[:], soa=True, precision=precision)
    tile_m = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 1) + j * tile_n
    b_s = bs_ref[:]  # (tile_m, 1)
    b_i = bi_ref[:]
    eligible = ((s > b_s) | ((s == b_s) & (col > b_i))) & (col < n)
    s = jnp.where(eligible, s, jnp.inf)

    cur_s, cur_i = _fold_scores(s, j * tile_n, best_s[:], best_i[:])
    best_s[:] = cur_s
    best_i[:] = cur_i

    @pl.when(j == n_tiles - 1)
    def _():
        out_i_ref[:] = cur_i
        out_s_ref[:] = cur_s


@functools.lru_cache(maxsize=None)
def _build_banded_candidates(m: int, n: int, k: int,
                             tile_m: int, tile_n: int,
                             precision: str = DEFAULT_PRECISION,
                             n_ops: int | None = None):
    """(search (m,k), SoA ref, bound_s (m,1), bound_i (m,1)) ->
    (idx (m,128) i32, score (m,128) f32): the fused candidate stage
    restricted to candidates lexicographically ABOVE the per-query bound
    (see kernels/topk.py). SoA only; scores are the same arithmetic as
    the unbanded kernel, so bounds from earlier passes compare bit-exactly."""
    if tile_n % 128 != 0 or tile_m % 8 != 0:
        raise ValueError("tile_n % 128 == 0 and tile_m % 8 == 0 required")
    k_pad = round_up(k, 8)
    m_pad = round_up(m, tile_m)
    # n_ops: serve an operand wider than this geometry needs (whole extra
    # padding tiles, e.g. NNIndex's own tiling) — masked by col < n.
    n_pad = n_ops if n_ops is not None else round_up(n, tile_n)
    if n_pad < n or n_pad % tile_n != 0:
        raise ValueError(f"operand width {n_pad} incompatible with "
                         f"n={n}, tile_n={tile_n}")
    m_tiles = m_pad // tile_m
    n_tiles = n_pad // tile_n
    out_spec = pl.BlockSpec((tile_m, 128), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_fused_banded_kernel, n=n, tile_n=tile_n,
                          n_tiles=n_tiles, precision=precision),
        grid=(m_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_m, k_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((m_pad, 128), jnp.int32),
                   jax.ShapeDtypeStruct((m_pad, 128), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((tile_m, 128), jnp.float32),
            pltpu.VMEM((tile_m, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=m_pad * k_pad * 4 + n_pad * k_pad * 4 + m_pad * 1024,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )

    def prep_soa(ref):
        return (jnp.pad(ref, ((0, n_pad - n), (0, k_pad - k))).T,)

    def candidates(search, ref_ops, bound_s, bound_i):
        (r_op,) = ref_ops
        if r_op.shape != (k_pad, n_pad):
            raise ValueError(
                f"operand shape {r_op.shape} != ({k_pad}, {n_pad})")
        q = jnp.pad(search, ((0, m_pad - m), (0, k_pad - k)))
        bs = jnp.pad(bound_s, ((0, m_pad - m), (0, 0)),
                     constant_values=jnp.inf)
        bi = jnp.pad(bound_i, ((0, m_pad - m), (0, 0)))
        ci, cs = call(q, r_op, bs, bi)
        return ci[:m], cs[:m]

    candidates.prep_soa = prep_soa
    return candidates


def _fused_minima_kernel(q_ref, r_ref, *rest,
                         n: int, tile_n: int, n_tiles: int,
                         precision: str, banded: bool, depth: int = 1):
    """VALUE-ONLY per-lane minima fold — the seeded engines' pass 1.

    The seeded top-K bound (kernels/topk.py) needs only the K-th smallest
    of each row's 128 per-lane score minima; the banded kernel's index
    fold (lane iota + a second select per 128-lane chunk) is dead weight
    there — this kernel's hot loop is one compare + one select
    (measured against the banded fold in scripts/r15_profile_seeded.py).
    Value semantics match _fold_scores exactly (strict <,
    NaN never enters the carry — a NaN bound is turned +inf by
    _inflate_bound and floods the certificate, never a silent miss).
    ``banded=True`` adds a per-row exclusive lower bound lo: only
    s > lo folds — the strictly-greater band the multi-round engine's
    pass 1 uses (bound_i == I32_MAX lex semantics).

    ``depth=2`` keeps each lane's TWO smallest scores (out (m, 256):
    min1 lanes 0-127, min2 lanes 128-255). The union holds 2*128
    DISTINCT elements' scores, so its K-th smallest upper-bounds the
    global K-th score for K <= 256 — the single-band K <= 128 top-K
    engine's bound source (kernels/topk.py), replacing the multi-round
    chain's second full reference read. Fold: new1 = min(s, m1);
    the displaced mid = (s < m1 ? m1 : s) then folds into m2 — a NaN
    mid is dropped by the second strict compare, preserving the
    NaN-never-enters invariant."""
    if banded:
        lo_ref, out_s_ref, best_s = rest
    else:
        out_s_ref, best_s = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, jnp.inf)

    s = _score_tile(q_ref[:], r_ref[:], soa=True, precision=precision)
    tile_m = s.shape[0]
    if n_tiles * tile_n != n:
        col = (jax.lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 1)
               + j * tile_n)
        s = jnp.where(col < n, s, jnp.inf)
    if banded:
        s = jnp.where(s > lo_ref[:], s, jnp.inf)
    if depth == 1:
        cur = best_s[:]
        for c in range(tile_n // 128):
            sc = s[:, c * 128:(c + 1) * 128]
            cur = jnp.where(sc < cur, sc, cur)
        best_s[:] = cur
    else:
        cur1 = best_s[:, :128]
        cur2 = best_s[:, 128:]
        for c in range(tile_n // 128):
            sc = s[:, c * 128:(c + 1) * 128]
            lt = sc < cur1
            new1 = jnp.where(lt, sc, cur1)
            mid = jnp.where(lt, cur1, sc)
            cur2 = jnp.where(mid < cur2, mid, cur2)
            cur1 = new1
        cur = jnp.concatenate([cur1, cur2], axis=1)
        best_s[:] = cur

    @pl.when(j == n_tiles - 1)
    def _():
        out_s_ref[:] = cur


@functools.lru_cache(maxsize=None)
def _build_minima_candidates(m: int, n: int, k: int,
                             tile_m: int, tile_n: int,
                             precision: str = DEFAULT_PRECISION,
                             n_ops: int | None = None,
                             banded: bool = False, depth: int = 1,
                             n_limit: int | None = None):
    """(search (m,k), SoA ref[, lo (m,1)]) -> (m, 128) f32 per-lane score
    minima (no indices) — see _fused_minima_kernel. Same score arithmetic
    and prepadded-operand protocol as _build_banded_candidates, so bounds
    derived here compare bit-exactly against the extraction kernel's
    scores.

    ``n_limit`` (r5, VERDICT r4 item 3): fold only the first n_limit
    columns of the (full-width) operand — the grid simply covers fewer
    tiles, so the pass READS only the prefix. The K-th smallest per-lane
    minimum over any SUBSET of the reference is still a valid upper
    bound on the global K-th score (a subset's K-th smallest >= the full
    set's), so bound passes can trade read volume for bound tightness
    (the caller must size its qualifier capacity for the looser bound)."""
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
    if n_limit is not None:
        if n_limit % tile_n != 0 or not 0 < n_limit <= n_pad:
            raise ValueError(f"n_limit={n_limit} must be a multiple of "
                             f"tile_n={tile_n} within the operand")
        n = min(n, n_limit)   # mask within the prefix only
        n_tiles = n_limit // tile_n
    scalar_spec = pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
    ow = 128 * depth
    if depth not in (1, 2) or (depth == 2 and banded):
        raise ValueError("depth must be 1 or 2 (2 only unbanded)")
    call = pl.pallas_call(
        functools.partial(_fused_minima_kernel, n=n, tile_n=tile_n,
                          n_tiles=n_tiles, precision=precision,
                          banded=banded, depth=depth),
        grid=(m_tiles, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_m, k_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ] + ([scalar_spec] if banded else []),
        out_specs=[pl.BlockSpec((tile_m, ow), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((m_pad, ow), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((tile_m, ow), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=m_pad * k_pad * 4 + n_pad * k_pad * 4
            + m_pad * 512,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )

    def prep_soa(ref):
        return (jnp.pad(ref, ((0, n_pad - n), (0, k_pad - k))).T,)

    def minima(search, ref_ops, lo_s=None):
        if (lo_s is None) == banded:
            raise ValueError("lo_s must be passed iff banded=True")
        (r_op,) = ref_ops
        if r_op.shape != (k_pad, n_pad):
            raise ValueError(
                f"operand shape {r_op.shape} != ({k_pad}, {n_pad})")
        q = jnp.pad(search, ((0, m_pad - m), (0, k_pad - k)))
        if banded:
            lo = jnp.pad(lo_s, ((0, m_pad - m), (0, 0)),
                         constant_values=jnp.inf)
            (cs,) = call(q, r_op, lo)
        else:
            (cs,) = call(q, r_op)
        return cs[:m]

    minima.prep_soa = prep_soa
    return minima


@functools.lru_cache(maxsize=None)
def _build_fused(m: int, n: int, k: int,
                 tile_m: int, tile_n: int, soa: bool,
                 precision: str = DEFAULT_PRECISION):
    """Compile-cached fused pipeline: candidates + exact refinement, all
    inside ONE jit so a call is a single device dispatch."""
    candidates = _build_fused_candidates(m, n, k, tile_m, tile_n, soa,
                                         precision)
    cutoff = select_cutoff(precision, k)

    @jax.jit
    def run(search, ref):
        return _refine(search, ref, candidates(search, ref), n,
                       cutoff=cutoff)

    return run


def _exact_rerank(search, src, cand, n_valid, tie_src=None):
    """Exact diff-form selection over a candidate set.

    search: (..., k) queries; src: (N, k) points gathered by `cand`
    (..., C) indices; entries >= n_valid are masked out. Ties on the exact
    squared distance break to the smallest reported index — `cand` itself,
    or `tie_src[cand]` when `tie_src` maps src positions to external ids
    (e.g. sorted position -> original index) — v0's lowest-index semantics
    (core.cu:50-54) at diff-form conditioning.
    Returns (idx (...,) i32 reported ids, d2 (...,) f32).
    """
    valid = cand < n_valid
    safe = jnp.where(valid, cand, 0)
    pts = jnp.take(src, safe.reshape(-1), axis=0)
    pts = pts.reshape(*cand.shape, src.shape[1])
    diff = search[..., None, :] - pts
    d2 = jnp.sum(diff * diff, axis=-1)              # (..., C) f32 exact-form
    d2 = jnp.where(valid, d2, jnp.inf)
    t = safe if tie_src is None else jnp.take(tie_src, safe.reshape(-1)
                                              ).reshape(safe.shape)
    v = jnp.min(d2, axis=-1, keepdims=True)
    tie = jnp.where((d2 == v) & valid, t, _I32_MAX)
    idx = jnp.min(tie, axis=-1).astype(jnp.int32)   # lowest index among ties
    return idx, jnp.squeeze(v, -1)


#: Candidate lanes kept for the exact rerank when the safety certificate
#: holds (see _refine_guarded): cuts the rerank's random row gathers 16x
#: (0.77 -> ~0.1 ms at ds11, 31% of the pipeline; docs/PERF_NOTES.md).
REFINE_TOP_T = 8


#: Score-magnitude cutoff for the top-T pre-selection AT THE PACKED
#: 3-SPLIT TIER (relative score error ~2^-26). The selection scores are
#: approximate with error ~eps_tier * |score|: their hazard regime is
#: |score| >> d^2 — large-coordinate data, where the norm-trick
#: cancellation lets the error rival REAL distance gaps and a top-T cut
#: by approximate score can drop the true nearest lane (observed:
#: unit-gap neighbors at coordinate scale ~4000, returning a d2=4 decoy
#: over the true d2=1 — 1000x outside the +-1e-3 gate). At this cutoff
#: the absolute error is <= 4096 * 2^-26 = 6e-5, orders below any gap
#: the gate resolves for in-contract (unit-scale) data, whose scores
#: stay ~O(k) — so at the packed-3 tier (k <= 16, every benched shape)
#: the fast path is taken deterministically.
#: Other precision tiers scale the cutoff down by their error ratio
#: (select_cutoff) so the certified absolute error budget is tier-
#: independent. CONSEQUENCE (deliberate, review r3): the scaled
#: cutoffs for coarser tiers (packed2 at 17 <= k <= 32 -> 8.0; the
#: bf16x3/x4 ladder -> 8-128) sit below typical in-contract score
#: magnitudes (~k/3 and up), so those bands run the FULL 128-lane
#: exact rerank on ~every call — correctness strictly first; the 16x
#: gather saving applies only where the approximation provably cannot
#: matter. A per-row (T+1)-th-vs-T-th gap certificate was tried
#: instead and rejected: benign near-ties trip it on ~every large batch
#: (any-row semantics), silently degrading ds11 1.90 -> 2.55 ms.
SELECT_SCORE_CUTOFF = 4096.0

#: Conservative relative score error per precision tier (the packed tier
#: splits by k: k_pad <= 16 fits the 3-way split's 8-9 terms, k <= 32
#: only the 2x2 — bf16x4 quality). "exact" is the diff-form VPU path
#: (smallm), whose error scales with d^2 itself, never with |score| —
#: the magnitude certificate does not apply there.
_TIER_EPS = {
    "packed3": 2.0 ** -26, "packed2": 2.0 ** -17,
    "bf16x3": 2.0 ** -17, "bf16x3_presplit": 2.0 ** -17,
    "bf16x4": 2.0 ** -17, "highest": 2.0 ** -24, "default": 2.0 ** -8,
    # q 2-split over an exactly-bf16 operand: the same single dropped
    # term as bf16x3's ladder (q's truncation), no r-side loss.
    "qsplit2": 2.0 ** -17,
}


def select_cutoff(precision: str, k: int) -> float:
    """Score-magnitude bound under which _refine_guarded's top-T cut is
    certified safe for the given score arithmetic: the absolute error
    admitted at the cutoff (cutoff * eps_tier) equals the packed tier's
    6e-5 budget for every tier (ADVICE r2: a flat 4096 cutoff let the
    bf16x3/bf16x4 ladder admit ~2^9 more error than certified)."""
    if precision == "exact":
        return float(np.inf)
    if precision == "packed":
        n_splits, _ = _packed_terms(round_up(k, 8))
        precision = "packed3" if n_splits == 3 else (
            "packed2" if n_splits == 2 else "bf16x3")
    eps = _TIER_EPS.get(precision, 2.0 ** -8)
    return SELECT_SCORE_CUTOFF * min(1.0, (2.0 ** -26) / eps)


def _refine_guarded(search, ref, idx, score, n, t: int = REFINE_TOP_T,
                    cutoff: float = SELECT_SCORE_CUTOFF):
    """Top-T pre-selection with a magnitude-certified fast path: keep the
    t lexicographically-(score, index)-smallest candidate lanes per row
    (exact duplicates carry bit-identical scores, so tied-at-the-minimum
    groups extract lowest-index-first — v0's tie rule survives into the
    rerank), unless any score magnitude exceeds ``cutoff`` (tier-scaled,
    see select_cutoff) — then rerank every lane exactly (correctness
    first; the 16x gather saving only where the approximation provably
    cannot matter)."""
    score = jnp.where(jnp.isnan(score), jnp.inf, score)
    s = score
    picks = []
    for _ in range(t):
        v = jnp.min(s, axis=-1, keepdims=True)
        tie = jnp.where(s == v, idx, _I32_MAX)
        pick = jnp.min(tie, axis=-1)
        picks.append(pick)
        s = jnp.where(idx == pick[..., None], jnp.inf, s)
    sel = jnp.stack(picks, axis=-1)
    if not np.isfinite(cutoff):   # exact-score tier: always certified
        return _exact_rerank(search, ref, sel, n)
    finite_mag = jnp.where(jnp.isfinite(score), jnp.abs(score), 0.0)
    unsafe = jnp.max(finite_mag) > cutoff
    return jax.lax.cond(
        unsafe,
        lambda _: _exact_rerank(search, ref, idx, n),
        lambda _: _exact_rerank(search, ref, sel, n),
        None,
    )


def _refine(search, ref, cand, n, cutoff: float = SELECT_SCORE_CUTOFF):
    """Exact selection over per-lane candidates (see _exact_rerank).

    `cand` is either (idx, score) — the candidates() contract, enabling
    the certified top-T pre-selection (_refine_guarded) — or a plain
    index array (v5's DMA kernel), which reranks in full. ``cutoff`` is
    the tier-scaled certification bound (select_cutoff); callers whose
    scores come from a non-packed tier MUST pass it."""
    if isinstance(cand, (tuple, list)):
        idx, score = cand
        if idx.shape[-1] > REFINE_TOP_T:
            return _refine_guarded(search, ref, idx, score, n,
                                   cutoff=cutoff)
        cand = idx
    return _exact_rerank(search, ref, cand, n)


#: Precision tiers whose SELECTION can miss the true neighbor outright
#: (candidate never enters the rerank, so exact refinement cannot save
#: it): bf16_raw measured 1/1024 exact-gate errors at k=768
#: (docs/SERVING.md). Callers must opt in explicitly — the repo's ±1e-3
#: contract does not hold for these tiers.
UNCERTIFIED_PRECISIONS = frozenset({"bf16_raw"})


def _check_precision_certified(precision, allow_approximate: bool):
    if precision in UNCERTIFIED_PRECISIONS and not allow_approximate:
        raise ValueError(
            f"precision={precision!r} is selection-approximate (can drop "
            "the true neighbor before exact refinement; measured 1/1024 "
            "gate errors at k=768 — docs/SERVING.md). Pass "
            "allow_approximate=True to accept results outside the ±1e-3 "
            "contract.")
    if precision == "qsplit2":
        # Certified ONLY over operands that are exactly bf16 (quantized
        # stores); per-call f32 references would silently lose 2^-8 of
        # r in the downcast.
        raise ValueError(
            "precision='qsplit2' is the quantized-store tier (requires a "
            "bf16-exact operand); NNIndex(store='bf16'/'int8') selects "
            "it automatically — it cannot serve per-call f32 references")


def fused_knn(search, ref, *, soa: bool = True,
              tile_m: int | None = None, tile_n: int | None = None,
              precision: str | None = None,
              allow_approximate: bool = False):
    """Run the fused kernel on (m,k)/(n,k) arrays.

    Returns (indices (m,) i32, true squared distances (m,) f32) as device
    arrays (distances from the exact diff-form refinement pass).
    Padding: k zero-padded to a sublane multiple (distance-neutral), m to
    tile_m (extra rows dropped), n to tile_n (masked in-kernel with +inf).
    Uncertified precision tiers (UNCERTIFIED_PRECISIONS) require
    allow_approximate=True.
    """
    _check_precision_certified(precision, allow_approximate)
    search = jnp.asarray(search, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    m, k = search.shape
    n = ref.shape[0]
    if tile_m is None and tile_n is None and soa and precision is None:
        # Tiny batches route to the zero-prep diff-form AoS scan
        # (smallm.py): at m<=4 the packed dot's per-element split/concat
        # work dominates while the MXU runs at <=8/128-row utilization,
        # diff-form scores are exact f32 outright, and XLA fuses the
        # whole reduction into one roofline pass over the caller's AoS
        # array — no SoA relayout (PERF_NOTES "Per-call prep
        # transpose"). Explicit tile/precision arguments signal
        # measurement intent and keep the MXU path.
        from tpu_knn.kernels.smallm import (
            aos_scan_applicable, smallm_applicable, smallm_knn,
        )

        if smallm_applicable(m, k, n) or aos_scan_applicable(m, k, n):
            # aos_scan_applicable: embedding-scale k (> 32) at m <= 4 —
            # the fused pipeline's operand-budget tiles stream far below
            # HBM bandwidth there while the AoS scan stays at roofline
            # (measured m=1 k=768: 37.4 -> ~5 ms, r14_probe_highk).
            return smallm_knn(search, ref)
        # Small reference sets skip the streaming pipeline entirely: the
        # dense exact path beats the fold/select/rerank fixed costs below
        # a few thousand points (kernels/dense.py).
        from tpu_knn.kernels.dense import dense_applicable, dense_knn

        if dense_applicable(m, k, n):
            return dense_knn(search, ref)
    if precision is None:
        precision = auto_precision(k, n)
    # Wide tiles require the packed dot to ACTUALLY fit (an explicit
    # precision='packed' with k>32 silently falls back to bf16x3 in
    # _qr_dot, whose f32 temps OOM at wide tiles).
    packed_fits = _packed_terms(round_up(k, 8))[0] != 0
    if tile_m is None or tile_n is None:
        tm, tn = pick_tiles(k, m, n, tile_m=tile_m,
                            wide=(precision == "packed" and packed_fits))
        tile_m = tile_m or tm
        tile_n = tile_n or tn
    run = _build_fused(m, n, k, tile_m, tile_n, soa, precision)
    return run(search, ref)


def _to_host(idx) -> np.ndarray:
    return np.asarray(jax.device_get(idx), dtype=np.int32)


#: v3 keeps the reference in AoS (n, k) layout. On TPU an (n, k<=16) f32
#: array is stored in (8, 128)-tiled HBM pages, so the operand occupies
#: round_up(n,8)*128*4 bytes regardless of k — 8 GB at n=2^24, which
#: crashes the AOT compile helper (docs/VERSION_BENCH.md footnote [1]).
#: Cap the padded operand at 2 GB (n <= 2^22) and delegate bigger n to
#: v4, whose one XLA relayout produces the SoA (k, n) operand that packs
#: lanes densely — the same delegation discipline as the reference's
#: v5->v4 / v6->v4 guards (core.cu:481-485, 603-607).
V3_MAX_PADDED_AOS_BYTES = 2 << 30


def _v3_guard(k, m, n):
    return round_up(n, 8) * 128 * 4 <= V3_MAX_PADDED_AOS_BYTES


def v3_callback(k, m, n, search, ref):
    idx, _ = fused_knn(search, ref, soa=False)
    return _to_host(idx)


def v4_callback(k, m, n, search, ref):
    idx, _ = fused_knn(search, ref, soa=True)
    return _to_host(idx)


#: v6 covers all of m in one tile; beyond this the (tile_m, 128) running
#: pair + output blocks would blow VMEM, so the guard delegates to v4
#: (like the reference's k*m<=16384 constant-memory guard, core.cu:603-607).
V6_MAX_TILE_M = 2048


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
    "fused Pallas streaming kernel, AoS reference layout with per-tile "
    "on-chip transpose (reference v3, core.cu:231-312)",
    guard=_v3_guard,
    fallback="v4",
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
    guard=lambda k, m, n: (
        round_up(m, 8) * round_up(k, 8) * 4 <= V6_QUERY_VMEM_BYTES
        and round_up(m, 8) <= V6_MAX_TILE_M
    ),
    fallback="v4",
)
