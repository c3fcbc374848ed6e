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

Performance status (docs/PERF_NOTES.md): correct and certified
everywhere, but on this stack every XLA building block it needs is
10-100x off its hardware cost — `lax.scan` steps ~0.3 ms, a 262144-row
dynamic_slice ~3 ms in ANY layout, window gathers ~55 rows/us — so it
loses to the brute-force fused kernel at every measured shape. The
pairs-count asymptotics favor it strongly (O(m·w) vs O(m·n), w ~
4·n^(1-1/k)); the planned fix is a Pallas PrefetchScalarGridSpec kernel
whose r-block index map reads per-query window starts, replacing scan +
dynamic_slice with the same double-buffered DMA streaming the fused
kernel enjoys.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.engine.registry import register_version
from tpu_knn.kernels.fused import _I32_MAX, fused_knn
from tpu_knn.utils.shapes import round_up

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
    inv_order (n,) i32 with inv_order[original] = sorted position).

    axis: fixed split axis, or None to pick the max-variance one.
    """
    if axis is None:
        var = jnp.var(ref, axis=0)
        d = jnp.argmax(var)
    else:
        d = jnp.int32(axis)
    proj = jnp.take_along_axis(ref, jnp.broadcast_to(d, (ref.shape[0], 1)),
                               axis=1)[:, 0]
    order = jnp.argsort(proj, stable=True).astype(jnp.int32)
    ref_sorted = ref[order]
    rnorm = jnp.sum(ref_sorted * ref_sorted, axis=1)
    n = ref.shape[0]
    inv_order = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return ref_sorted, order, d, proj[order], rnorm, inv_order


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
    def run(search, ref_sorted, order, axis, proj, rnorm, inv_order):
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
            cand_pts = jnp.take(win, cand_col.reshape(-1), axis=0)
            cand_pts = cand_pts.reshape(g, 128, k)
            diff = q_grp[:, None, :] - cand_pts
            d2 = jnp.sum(diff * diff, axis=-1)              # (g, 128) exact
            cand_orig = jnp.take(ord_win, cand_col.reshape(-1)).reshape(g, 128)
            v = jnp.min(d2, axis=1, keepdims=True)
            tie = jnp.where(d2 == v, cand_orig, _I32_MAX)
            idx = jnp.min(tie, axis=1).astype(jnp.int32)
            d_best = v[:, 0]
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


def projection_knn(search, ref, *, window: int | None = None,
                   group: int | None = None, prebuilt=None):
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
