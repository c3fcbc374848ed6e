"""Exact top-K nearest neighbors — a serving extension beyond the
reference's 1-NN contract (core.h:71 returns a single argmin per query;
production NN services almost always want the K nearest).

Algorithm: K lexicographically-banded 1-NN sweeps. Pass j re-runs the
fused candidate kernel with every element whose (score, index) is lex-<=
the previous pass's reported (score, index) masked out BEFORE the
per-lane fold (fused._fused_banded_kernel). Because the bound is the
reported point's score from the SAME kernel arithmetic, the comparison
is approx-vs-approx and bit-exact: the reported point's lane yields its
runner-up on the next pass, so per-lane top-1 state suffices for any K.

The pass sequence therefore enumerates points in exact (kernel-score,
index) lexicographic order. Kernel scores carry the packed-dot's
<= 2^-26 relative error, so the REPORTED SET matches the true top-K
unless an approximate-score inversion crosses the K boundary — the same
tolerance class as the 1-NN engine's candidate selection (and the
returned distances are always exact f32 diff-form). The output is
re-sorted by exact (d2, index), v0's tie rule (core.cu:50-54) extended
to K results.

Cost: K single-pass scans (one reference read each). This is a
capability path, not a bandwidth-optimal one — a fused multi-state
kernel would trade fold width for passes; not needed at serving K <= 16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.kernels.fused import (
    _build_banded_candidates, _I32_MAX, auto_precision,
)
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.shapes import round_up

#: Largest K served; bounds compile size (the scan is length-K) and keeps
#: the K-passes design honest about its regime.
MAX_NEIGHBORS = 128


def _lex_min(idx, score):
    """Per-row lexicographic (score, index) minimum of the candidate set.
    Exact duplicates carry bit-identical scores, so the lowest index among
    tied minima is returned (v0's tie rule at the candidate level)."""
    v = jnp.min(score, axis=-1, keepdims=True)
    tie = jnp.where(score == v, idx, _I32_MAX)
    return jnp.min(tie, axis=-1), jnp.squeeze(v, -1)


@functools.lru_cache(maxsize=None)
def _build_topk(m: int, n: int, k: int, kk: int, n_ops: int,
                precision: str):
    """Jitted K-pass pipeline against a prepadded (k_pad, n_ops) SoA
    operand plus the AoS array for exact distances."""
    if n_ops < n or n_ops % 128 != 0:
        raise ValueError(f"operand width {n_ops} incompatible with n={n}")
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
def _build_topk_percall(m: int, n: int, k: int, kk: int, precision: str):
    tile_m, tile_n = pick_tiles(k, m, n)
    n_ops = round_up(n, tile_n)
    run = _build_topk(m, n, k, kk, n_ops, precision)
    cand = _build_banded_candidates(m, n, k, tile_m, tile_n, precision)

    @jax.jit
    def go(search, ref):
        return run(search, cand.prep_soa(ref), ref)

    return go


def topk_knn(search, ref, neighbors: int):
    """Exact K-nearest-neighbors: (m, k) queries against (n, k) refs.

    Returns (idx (m, K) i32, d2 (m, K) f32), each row ascending by exact
    (squared distance, index). Requires neighbors <= n.
    """
    search = jnp.asarray(search, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    m, k = search.shape
    n = ref.shape[0]
    if not (1 <= neighbors <= min(n, MAX_NEIGHBORS)):
        raise ValueError(
            f"neighbors must be in [1, min(n, {MAX_NEIGHBORS})] = "
            f"[1, {min(n, MAX_NEIGHBORS)}], got {neighbors}")
    return _build_topk_percall(m, n, k, neighbors,
                               auto_precision(k, n))(search, ref)
