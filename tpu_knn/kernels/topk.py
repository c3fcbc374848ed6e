"""Exact top-K nearest neighbors — a serving extension beyond the
reference's 1-NN contract (core.h:71 returns a single argmin per query;
production NN services almost always want the K nearest).

Two engines with IDENTICAL selection semantics (differentially tested
against each other):

- "sweep" (auto-selected in the serving regime, m*K <= SWEEP_AUTO_BUDGET
  and K <= SWEEP_MAX_NEIGHBORS): ONE pass over the
  reference set with per-lane sorted K-deep (score, index) state in VMEM
  scratch (_sweep_kernel). Each incoming 128-wide score chunk runs a
  K-level compare-exchange insertion chain; a tile-level skip guard
  (`pl.when` on "any element beats some lane's current k-th best") makes
  the steady-state fold cost one compare per element — improvements decay
  harmonically over a random stream, so almost every tile skips. HBM
  traffic: one read of R, same as 1-NN.
- "passes": K lexicographically-banded 1-NN sweeps. Pass j re-runs the
  fused candidate kernel with every element whose (score, index) is
  lex-<= the previous pass's reported (score, index) masked out BEFORE
  the per-lane fold (fused._fused_banded_kernel). Because the bound is
  the reported point's score from the SAME kernel arithmetic, the
  comparison is approx-vs-approx and bit-exact: the reported point's lane
  yields its runner-up on the next pass, so per-lane top-1 state suffices
  for any K <= MAX_NEIGHBORS. Cost: K full reference reads — kept as the
  large-K fallback and as the independent implementation the sweep engine
  is differentially tested against.

Both enumerate the K smallest points under (kernel-score, index)
lexicographic order. Kernel scores carry the packed-dot's <= 2^-26
relative error, so the REPORTED SET matches the true top-K unless an
approximate-score inversion crosses the K boundary — the same tolerance
class as the 1-NN engine's candidate selection (and the returned
distances are always exact f32 diff-form). The output is sorted by exact
(d2, index), v0's tie rule (core.cu:50-54) extended to K results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_knn.kernels.fused import (
    _build_banded_candidates, _score_tile, _I32_MAX, auto_precision,
)
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.platform import interpret_mode
from tpu_knn.utils.shapes import round_up

#: Largest K served; bounds compile size (the banded engine's scan is
#: length-K) and keeps the designs honest about their regime.
MAX_NEIGHBORS = 128

#: Largest K the single-sweep engine serves: the per-lane K-state costs
#: K * tile_m KiB of VMEM scratch (f32+i32) plus an equally-sized output
#: block, and the insertion chain is K compare-exchanges per non-skipped
#: chunk; past this the K-pass engine's linear cost is the better trade.
SWEEP_MAX_NEIGHBORS = 32

#: Auto-routing boundary, measured on v5e at n=2^20, k=16 (2026-08-17):
#: the sweep's insertion fold costs ~K compare-exchanges per score element
#: over tile_m rows, while the K-pass engine costs K full reference scans
#: independent of m — sweep wins the serving regime (small query batches,
#: one reference read) and loses once m*K grows past ~256: m=8/K=8 sweep
#: 2.4x faster (0.354 vs 0.859 ms), m=32/K=8 parity (0.945 vs 1.047),
#: m=64/K=8 passes 1.65x faster (1.510 vs 2.497), m=1/n=2^24/K=8 sweep
#: 2.75x faster (5.31 vs 14.59 ms).
SWEEP_AUTO_BUDGET = 256


def _auto_method(m: int, kk: int) -> str:
    if kk <= SWEEP_MAX_NEIGHBORS and m * kk <= SWEEP_AUTO_BUDGET:
        return "sweep"
    return "passes"


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
            ls, li = list(ls), list(li)
            for l in range(kk):
                # In-lane ties (new_s == ls[l]) need the index clause only
                # for CASCADED elements: fresh elements arrive in ascending
                # col order, but a displaced equal-score element carries a
                # lower col than deeper levels may hold.
                beats = (new_s < ls[l]) | ((new_s == ls[l]) & (new_i < li[l]))
                old_s, old_i = ls[l], li[l]
                ls[l] = jnp.where(beats, new_s, old_s)
                li[l] = jnp.where(beats, new_i, old_i)
                new_s = jnp.where(beats, old_s, new_s)
                new_i = jnp.where(beats, old_i, new_i)
            return tuple(ls), tuple(li)

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
        tile_m //= 2
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


def _lex_min(idx, score):
    """Per-row lexicographic (score, index) minimum of the candidate set.
    Exact duplicates carry bit-identical scores, so the lowest index among
    tied minima is returned (v0's tie rule at the candidate level)."""
    v = jnp.min(score, axis=-1, keepdims=True)
    tie = jnp.where(score == v, idx, _I32_MAX)
    return jnp.min(tie, axis=-1), jnp.squeeze(v, -1)


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
def _build_topk_percall(m: int, n: int, k: int, kk: int, precision: str,
                        method: str = "auto"):
    if method == "auto":
        method = _auto_method(m, kk)
    if method == "sweep":
        _, tile_n = _sweep_tiles(k, m, n, kk, precision)
    else:
        _, tile_n = pick_tiles(k, m, n)
    n_ops = round_up(n, tile_n)
    run = _build_topk(m, n, k, kk, n_ops, precision, method)
    k_pad = round_up(k, 8)

    @jax.jit
    def go(search, ref):
        r_op = jnp.pad(ref, ((0, n_ops - n), (0, k_pad - k))).T
        return run(search, (r_op,), ref)

    return go


def topk_knn(search, ref, neighbors: int, method: str = "auto"):
    """Exact K-nearest-neighbors: (m, k) queries against (n, k) refs.

    Returns (idx (m, K) i32, d2 (m, K) f32), each row ascending by exact
    (squared distance, index). Requires neighbors <= n. `method` selects
    the engine: "sweep" (one reference read, K <= SWEEP_MAX_NEIGHBORS),
    "passes" (K banded reads, K <= MAX_NEIGHBORS), or "auto".
    """
    search = jnp.asarray(search, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    m, k = search.shape
    n = ref.shape[0]
    if not (1 <= neighbors <= min(n, MAX_NEIGHBORS)):
        raise ValueError(
            f"neighbors must be in [1, min(n, {MAX_NEIGHBORS})] = "
            f"[1, {min(n, MAX_NEIGHBORS)}], got {neighbors}")
    if method == "sweep" and neighbors > SWEEP_MAX_NEIGHBORS:
        raise ValueError(
            f"sweep engine serves K <= {SWEEP_MAX_NEIGHBORS}, got {neighbors}")
    return _build_topk_percall(m, n, k, neighbors,
                               auto_precision(k, n), method)(search, ref)
