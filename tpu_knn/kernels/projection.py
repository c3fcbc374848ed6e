"""v11 — projection-sorted window index (beyond the reference ladder).

The reference's only sublinear structure is the KD-tree (v9/v10), whose
pointer-chasing traversal is hostile to TPUs (docs/PERF_NOTES.md: ~1000x
slower than its CPU twin). This is the TPU-native answer to spatial
pruning: everything is dense, batched, and branch-free.

Build: sort the reference points by their coordinate on the maximum-
variance axis (the same split heuristic as the KD-tree root,
core.cu:991-1003 — but applied once, globally).

Query: for each query, `searchsorted` locates its projection in the
sorted order; a fixed-width window of W consecutive points around that
position is scanned: approximate norm-trick scores (f32, HIGHEST) select
a 128-slot candidate set per query, which is re-ranked with EXACT f32
diff-form distances — the same select-then-refine discipline as the fused
kernel, so near-d=0 cancellation cannot mis-rank survivors. The window
answer is certified per query when the nearest out-of-window projections
on both sides are strictly farther (in the 1-D projection metric, which
lower-bounds the full distance) than the exact best in-window distance:

    d²(q, r) >= (q[d] - r[d])²   for any axis d,

so if (q[d] - proj_outside)² > d²_best on both sides, no outside point
can beat (or tie) the certified winner. Uncertified queries take the
fused full scan, merged per query — correctness never depends on the
data distribution, only speed does. The bound's hit rate falls with k
(measured: 48% at k=3, n=2^20 uniform; 0% at k=16), hence the k<=8
registry guard; adversarial identical-projection data degrades to v4's
cost plus a cheap window pass.

Tie-breaking matches v0: within the window, equal computed distances pick
the smallest ORIGINAL reference index (the sort permutation is carried
alongside); the strict ">" bound means tied points can never be outside
the window.

Exactness fine print: candidate SELECTION inside the window uses f32
norm-trick scores per 128-lane slot before the exact re-rank, so a true
NN sharing a lane slot with a near-tie inside the score's rounding error
(~1e-7 relative, squared space) can be evicted — an error of at most
sqrt(score_err) in distance, orders of magnitude inside the reference's
±1e-3 gate, and undetectable by the projection bound (which certifies
against OUT-of-window points only). The fused kernel makes the same
trade (docs/PERF_NOTES.md); exact duplicates still produce identical
scores and exact ties.

Two engines:

- "pallas" (default): a PrefetchScalarGridSpec kernel — the per-query
  window start is a scalar-prefetch operand consumed by the reference
  BlockSpec's index map, so each (query, window-tile) grid step DMAs
  exactly the slice it needs. Measured 1.1 ms for a small batch at
  (k=3, n=2^24) vs the fused full scan's 5.0 ms — the sub-linear win is
  real. (The XLA "scan" engine is kept as a cross-check: its building
  blocks — lax.scan steps, dynamic_slice, gathers — each run 10-100x off
  hardware cost on this stack.)
- Caveat: `projection_knn`'s certification decision (`bool(all(ok))`)
  costs one device→host sync per call — microseconds on a real TPU host,
  ~25 ms on this dev environment's tunnel. Pipelined servers should use
  the raw runner (`_build_pallas_window_query(...)` → (idx, d2, ok)) and
  resolve fallbacks asynchronously.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_knn.engine.registry import register_version
from tpu_knn.kernels.fused import _I32_MAX, fused_knn
from tpu_knn.utils.shapes import round_up

#: Padding fill whose scores overflow to +inf (never wins).
PAD_VALUE = 1e30

DEFAULT_WINDOW = 4096


def auto_window(k: int, n: int) -> int:
    """Window size for a high certification rate on uniform-ish data.

    The bound needs the window's projection half-width (~w/(2n) of the
    data range) to exceed d_NN ~ n^(-1/k), i.e. w >~ 2·n^(1-1/k). Use 4x
    for slack, 128-aligned. This grows almost linearly in n for small k —
    the honest geometry of 1-D projection pruning (it thins as n^(1/k)),
    which is why v11's niche is small query batches, where per-query
    windows are still far cheaper than m full scans.
    """
    w = int(4.0 * n ** (1.0 - 1.0 / max(k, 1)))
    w = max(DEFAULT_WINDOW, min(n, w))
    return max(128, (w // 128) * 128)


@functools.partial(jax.jit, static_argnames=("axis",))
def build_projection_index(ref, axis: int | None = None):
    """Returns (ref_sorted (n,k), order (n,) i32, axis (scalar i32),
    proj (n,) f32 sorted projections, rnorm (n,) f32 sorted ‖r‖²,
    inv_order (n,) i32 with inv_order[original] = sorted position,
    r_pallas (k_pad, n_pad) f32 — the Pallas window kernel's augmented SoA
    operand, built once here because per-call augmentation of the full
    array costs tens of ms at n=2^24).

    axis: fixed split axis, or None to pick the max-variance one.
    """
    if axis is None:
        var = jnp.var(ref, axis=0)
        d = jnp.argmax(var)
    else:
        d = jnp.int32(axis)
    n, k = ref.shape
    proj = jnp.take_along_axis(ref, jnp.broadcast_to(d, (n, 1)),
                               axis=1)[:, 0]
    order = jnp.argsort(proj, stable=True).astype(jnp.int32)
    ref_sorted = ref[order]
    rnorm = jnp.sum(ref_sorted * ref_sorted, axis=1)
    inv_order = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    # Pallas operand: [coords | ‖r‖² | zero pad] rows, transposed to SoA;
    # padded columns score -inf (s' = q·r - inf/2) and can never win.
    k_pad = round_up(k + 1, 8)
    n_pad = round_up(n, TILE_W) + TILE_W
    r_aug = jnp.concatenate([ref_sorted, rnorm[:, None]], axis=1)
    r_aug = jnp.pad(r_aug, ((0, 0), (0, k_pad - k - 1)))
    pad_rows = jnp.concatenate(
        [jnp.full((n_pad - n, k), PAD_VALUE, jnp.float32),
         jnp.full((n_pad - n, 1), jnp.inf, jnp.float32),
         jnp.zeros((n_pad - n, k_pad - k - 1), jnp.float32)], axis=1)
    r_pallas = jnp.concatenate([r_aug, pad_rows], axis=0).T
    return ref_sorted, order, d, proj[order], rnorm, inv_order, r_pallas


#: Queries per group in the grouped-window scan. Small groups keep the
#: group's projection spread (and so the slice length) small.
DEFAULT_GROUP = 8


@functools.lru_cache(maxsize=None)
def _build_window_query(m: int, n: int, k: int, window: int,
                        group: int = DEFAULT_GROUP):
    """Grouped contiguous-slice scan.

    A naive per-query window gather is gather-bound on TPU (measured
    76-104 ms at m=1024 — 30x slower than the full fused scan). Instead:
    sort the QUERIES by projection too, take groups of `group` consecutive
    queries, and give each group ONE contiguous slice of the sorted
    reference array covering every member's window — `lax.scan` over
    groups with `dynamic_slice` is dense block traffic, no gathers.

    The slice length must be static: window + a spread budget sized for
    `group` consecutive uniform-ish queries. Queries whose ideal window
    doesn't fit their group's slice simply fail the per-query bound and
    take the full-scan fallback — exactness never depends on the budget.
    """
    g = min(group, m)
    num_groups = -(-m // g)
    m_pad = num_groups * g
    w = min(window, n)
    # Spread budget: g consecutive order statistics of m uniform queries
    # span ~n·g/m reference positions; 4x for slack. Meaningless for g=1
    # (each query gets exactly its own window). For small m the spread
    # formula degenerates toward n — callers should use g=1 there.
    spread = 0 if g == 1 else min(n, 4 * (n * g) // max(m, 1) + 256)
    # 128-aligned for the lane-slot candidate reshape (callers guard n>=128).
    L = max(128, (min(n, w + spread) // 128) * 128)

    @jax.jit
    def run(search, ref_sorted, order, axis, proj, rnorm, inv_order,
            r_pallas=None):
        del r_pallas  # the scan engine slices ref_sorted directly
        q_proj = jnp.take_along_axis(
            search, jnp.broadcast_to(axis, (m, 1)), axis=1)[:, 0]
        pos = jnp.searchsorted(proj, q_proj).astype(jnp.int32)

        # Sort queries by projection; process groups; un-permute at the end.
        q_order = jnp.argsort(q_proj, stable=True).astype(jnp.int32)
        q_sorted = search[q_order]
        pos_sorted = pos[q_order]
        qp_sorted = q_proj[q_order]
        pad = m_pad - m
        if pad:
            # Edge-pad: zero padding would drag the last group's slice
            # anchor (min over pos) to position 0 and fail its bound.
            q_sorted = jnp.pad(q_sorted, ((0, pad), (0, 0)), mode="edge")
            pos_sorted = jnp.pad(pos_sorted, (0, pad), mode="edge")
            qp_sorted = jnp.pad(qp_sorted, (0, pad), mode="edge")
        qg = q_sorted.reshape(num_groups, g, k)
        posg = pos_sorted.reshape(num_groups, g)
        qpg = qp_sorted.reshape(num_groups, g)

        # Group slice start: cover the lowest member's left window edge.
        start_g = jnp.clip(jnp.min(posg, axis=1) - w // 2, 0, n - L)

        L128 = L // 128

        def step(_, xs):
            q_grp, pos_grp, qp_grp, start = xs
            win = jax.lax.dynamic_slice(ref_sorted, (start, 0), (L, k))
            ord_win = jax.lax.dynamic_slice(order, (start,), (L,))
            rn_win = jax.lax.dynamic_slice(rnorm, (start,), (L,))
            # Norm-trick matmul, not the (g, L, k) diff broadcast: a
            # last-dim-k intermediate puts k<=16 on the 128-wide lanes
            # (8-40x padding waste — measured 27-64 ms for the batch).
            qw = jax.lax.dot_general(
                q_grp, win, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            qn2 = jnp.sum(q_grp * q_grp, axis=1, keepdims=True)
            s = qn2 + rn_win[None, :] - 2.0 * qw            # (g, L) approx
            # Approximate scores carry cancellation error near d=0 and can
            # mis-rank (observed: a planted exact duplicate losing to a
            # 1e-4-offset point). Like the fused kernel, select a 128-slot
            # candidate set by approx score, then re-rank those candidates
            # with EXACT f32 diff-form distances.
            s_c = s.reshape(g, L128, 128)
            slot = jnp.argmin(s_c, axis=1)                  # (g, 128)
            lane = jnp.arange(128, dtype=jnp.int32)[None, :]
            cand_col = slot.astype(jnp.int32) * 128 + lane  # (g, 128)
            from tpu_knn.kernels.fused import _exact_rerank

            idx, d_best = _exact_rerank(q_grp, win, cand_col, L,
                                        tie_src=ord_win)
            # Per-query exactness bound against the slice edges: points
            # outside the slice must be strictly farther in projection.
            lp = jnp.where(start >= 1,
                           proj[jnp.maximum(start - 1, 0)], -jnp.inf)
            rp = jnp.where(start + L < n,
                           proj[jnp.minimum(start + L, n - 1)], jnp.inf)
            dl = qp_grp - lp
            dr = rp - qp_grp
            ok = (dl * dl > d_best) & (dr * dr > d_best)
            return 0, (idx, d_best, ok)

        _, (idx_g, d_g, ok_g) = jax.lax.scan(
            step, 0, (qg, posg, qpg, start_g))
        idx_s = idx_g.reshape(m_pad)[:m]
        ok_s = ok_g.reshape(m_pad)[:m]
        # Un-permute back to input query order.
        inv = jnp.zeros((m,), jnp.int32).at[q_order].set(
            jnp.arange(m, dtype=jnp.int32))
        idx_out = idx_s[inv]
        ok_out = ok_s[inv]
        # Winner distances recomputed in exact f32 diff form (the in-scan
        # norm-trick values select correctly but carry cancellation error
        # near d=0); one m-row gather, negligible. inv_order is prebuilt —
        # an n-sized scatter here cost ~140 ms per call at n=2^24.
        diff = search - jnp.take(ref_sorted, jnp.take(inv_order, idx_out),
                                 axis=0)
        d_exact = jnp.sum(diff * diff, axis=1)
        return idx_out, d_exact, ok_out

    return run


#: Pallas window kernel tile along the window axis.
TILE_W = 4096


@functools.lru_cache(maxsize=None)
def _build_pallas_window_query(m: int, n: int, k: int, window: int):
    """Per-query window scan as ONE Pallas kernel.

    The XLA composition (scan + dynamic_slice + gathers) pays 10-100x
    hardware cost per step on this stack; here the per-query window start
    is a scalar-prefetch operand consumed by the reference BlockSpec's
    index map, so each (query i, window-tile j) grid step DMAs exactly the
    (k_pad, TILE_W) slice it needs with the same double-buffered pipeline
    the fused kernel enjoys. Per-lane fold + exact diff-form re-ranking
    mirror the fused kernel's discipline; indices are in SORTED space
    until the final order[] mapping.
    """
    from tpu_knn.kernels.fused import _fold_scores
    from tpu_knn.utils.platform import interpret_mode

    k_pad = round_up(k + 1, 8)  # extra contraction row carries ‖r‖²
    n_pad = round_up(n, TILE_W) + TILE_W  # slack for start alignment
    w_tiles = -(-min(window, n) // TILE_W) + 1

    def kernel(tiles_ref, q_ref, r_ref, out_i_ref, best_s, best_i):
        # q block = the query (augmented with a -0.5 slot against the ‖r‖²
        # row, so s' = q·r − ‖r‖²/2 and HIGHER is nearer) replicated over 8
        # sublanes — Mosaic rejects 1->8 sublane broadcasts in-kernel, so
        # every score row is identical and row 0 carries the answer.
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            best_s[:] = jnp.full_like(best_s, -jnp.inf)
            best_i[:] = jnp.full_like(best_i, _I32_MAX)

        s = jax.lax.dot_general(
            q_ref[:], r_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)      # (8, TILE_W)
        base = (tiles_ref[pl.program_id(0)] + j) * TILE_W
        cur_s, cur_i = _fold_scores(s, base, best_s[:], best_i[:],
                                    maximize=True)
        best_s[:] = cur_s
        best_i[:] = cur_i

        @pl.when(j == w_tiles - 1)
        def _():
            out_i_ref[:] = cur_i

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m, w_tiles),
        in_specs=[
            pl.BlockSpec((8, k_pad), lambda i, j, tiles: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, TILE_W), lambda i, j, tiles: (0, tiles[i] + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j, tiles: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.int32),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8 * m, 128), jnp.int32),
        interpret=interpret_mode(),
    )

    @jax.jit
    def run(search, ref_sorted, order, axis, proj, rnorm, inv_order,
            r_pallas):
        q_proj = jnp.take_along_axis(
            search, jnp.broadcast_to(axis, (m, 1)), axis=1)[:, 0]
        pos = jnp.searchsorted(proj, q_proj, method="scan").astype(jnp.int32)
        w = min(window, n)
        start = jnp.clip(pos - w // 2, 0, max(n - w, 0))
        tiles = (start // TILE_W).astype(jnp.int32)     # aligned-down
        # Query augmented with the -0.5 norm slot, replicated over 8
        # sublanes (see kernel comment).
        q_col = jnp.full((m, 1), -0.5, jnp.float32)
        q_aug = jnp.concatenate([search, q_col], axis=1)
        q_aug = jnp.pad(q_aug, ((0, 0), (0, k_pad - k - 1)))
        q_rep = jnp.repeat(q_aug, 8, axis=0)            # (8m, k_pad)
        out = call(tiles, q_rep, r_pallas)              # (8m, 128)
        cand_sorted = out.reshape(m, 8, 128)[:, 0, :]   # rows identical
        # Exact diff-form re-ranking over candidates, reporting/tying on
        # the ORIGINAL index (v0 semantics).
        from tpu_knn.kernels.fused import _exact_rerank

        idx, d_best = _exact_rerank(search, ref_sorted, cand_sorted, n,
                                    tie_src=order)
        # Certification bound vs the points just outside the tile-aligned
        # coverage [tiles*TILE_W, tiles*TILE_W + w_tiles*TILE_W).
        lo = tiles * TILE_W
        hi = lo + w_tiles * TILE_W
        lp = jnp.where(lo >= 1, jnp.take(proj, jnp.maximum(lo - 1, 0)),
                       -jnp.inf)
        rp = jnp.where(hi < n, jnp.take(proj, jnp.minimum(hi, n - 1)),
                       jnp.inf)
        dl = q_proj - lp
        dr = rp - q_proj
        ok = (dl * dl > d_best) & (dr * dr > d_best)
        return idx, d_best, ok

    return run


@functools.lru_cache(maxsize=None)
def _build_projection_pipeline(m: int, n: int, k: int, window: int):
    """ONE dispatch for the whole query: window scan + certification +
    merged full-scan fallback, with the fallback under `lax.cond` so the
    fused scan only executes (on device) when some query's bound failed —
    no per-call device->host certification sync (the `bool(jnp.all(ok))`
    sync cost ~25 ms on the dev tunnel; VERDICT round 1, weak #4).

    Returns run(search, ref, *index) -> (idx, d2, ok)."""
    from tpu_knn.kernels.fused import _build_fused, _packed_terms, auto_precision
    from tpu_knn.kernels.tuning import pick_tiles

    win_run = _build_pallas_window_query(m, n, k, window)
    precision = auto_precision(k, n)
    wide = precision == "packed" and _packed_terms(round_up(k, 8))[0] != 0
    tile_m, tile_n = pick_tiles(k, m, n, wide=wide)
    fused_run = _build_fused(m, n, k, tile_m, tile_n, True, precision)

    @jax.jit
    def run(search, ref, ref_sorted, order, axis, proj, rnorm, inv_order,
            r_pallas):
        idx, d2, ok = win_run(search, ref_sorted, order, axis, proj,
                              rnorm, inv_order, r_pallas)

        def certified(_):
            return idx, d2

        def fallback(_):
            f_idx, f_d2 = fused_run(search, ref)
            return jnp.where(ok, idx, f_idx), jnp.where(ok, d2, f_d2)

        idx_out, d2_out = jax.lax.cond(jnp.all(ok), certified, fallback, 0)
        return idx_out, d2_out, ok

    return run


def projection_work(k: int, n: int, m: int) -> int:
    """Reference rows the window path touches for an m-query batch (the
    Pallas kernel's tile-aligned coverage) — the dispatch cost model."""
    w_tiles = -(-min(auto_window(k, n), n) // TILE_W) + 1
    return m * w_tiles * TILE_W


def projection_wins(k: int, m: int, n: int) -> bool:
    """True where the window path should beat the fused full scan by a
    safe margin: the bound must be useful (k small — hit rate measured 48%
    at k=3 n=2^20, 0% at k=16), the batch small (window work is m-linear),
    and the covered rows well under one full scan."""
    return (k <= 4 and m <= 64 and n >= (1 << 20)
            and 2 * projection_work(k, n, m) <= n)


def projection_knn(search, ref, *, window: int | None = None,
                   group: int | None = None, prebuilt=None,
                   engine: str | None = None):
    """Exact 1-NN via the projection index.

    Returns (idx (m,) i32, d2 (m,) f32) device arrays. `prebuilt` is the
    build_projection_index output for reuse (NNIndex); built per call
    otherwise (the reference's per-call KD-tree build, core.cu:1030).
    """
    search = jnp.asarray(search, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    m, k = search.shape
    n = ref.shape[0]
    if n < 128:
        return fused_knn(search, ref)
    if window is None:
        window = auto_window(k, n)
    if group is None:
        # Small batches: one slice per query (its exact window, no spread
        # waste); large sorted batches amortize slices across neighbors.
        group = 1 if m <= 64 else DEFAULT_GROUP
    index = (prebuilt if prebuilt is not None
             else build_projection_index(ref))
    if engine is None:
        engine = "pallas"
    if engine == "pallas":
        # Single-dispatch pipeline: certification + merged fallback happen
        # on device under lax.cond — no host sync on the hot path.
        run = _build_projection_pipeline(m, n, k, window)
        idx, d2, _ok = run(search, ref, *index)
        return idx, d2
    run = _build_window_query(m, n, k, window, group)
    idx, d2, ok = run(search, *index)
    if bool(jnp.all(ok)):
        return idx, d2
    # Bound failed for some queries: full fused scan once, merged
    # per-query (window answers where the bound certifies them, fused
    # answers elsewhere) — correct for any data distribution.
    f_idx, f_d2 = fused_knn(search, ref)
    return jnp.where(ok, idx, f_idx), jnp.where(ok, d2, f_d2)


def v11_callback(k, m, n, search, ref):
    idx, _ = projection_knn(search, ref)
    return np.asarray(jax.device_get(idx), dtype=np.int32)


register_version(
    "v11",
    v11_callback,
    "projection-sorted window index: dense batched spatial pruning with "
    "per-query exactness bound and fused-scan fallback (TPU-native, beyond "
    "the reference ladder)",
    # The 1-D projection bound stops paying as k grows (measured: bound
    # holds for 0/1024 uniform queries at k=16, n=2^20) — same shape of
    # cutoff as the KD-tree's.
    guard=lambda k, m, n: k <= 8 and n >= 128,
    fallback="v4",
)
