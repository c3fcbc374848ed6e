"""Exact top-K neighbors (kernels/topk.py) — the serving extension beyond
the reference's 1-NN contract. Output rows must be ascending by exact
(squared distance, index): v0's lowest-index tie rule extended to K."""

import numpy as np
import pytest

import tpu_knn
from tpu_knn.engine.index import NNIndex
from tpu_knn.kernels.topk import MAX_NEIGHBORS, topk_knn


def oracle_topk(q, r, kk):
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    return np.array(
        [np.lexsort((np.arange(len(row)), row))[:kk] for row in d2])


@pytest.mark.parametrize("k,m,n,kk", [
    (3, 4, 1000, 5),
    (16, 8, 4096, 8),
    (5, 1, 2000, 16),
    (3, 2, 128, 128),   # K = n: full ordering
    (8, 4, 777, 3),     # ragged n
])
def test_topk_conformance(k, m, n, kk):
    rng = np.random.default_rng(hash((k, m, n, kk)) % 2**31)
    q = rng.random((m, k), np.float32)
    r = rng.random((n, k), np.float32)
    idx, d2 = topk_knn(q, r, kk)
    want = oracle_topk(q, r, kk)
    np.testing.assert_array_equal(np.asarray(idx), want)
    np.testing.assert_allclose(
        np.asarray(d2),
        np.take_along_axis(((q[:, None, :] - r[None, :, :]) ** 2).sum(-1),
                           want, axis=1),
        rtol=1e-6, atol=1e-7)
    # rows sorted ascending by (d2, idx)
    d2n = np.asarray(d2)
    assert np.all(np.diff(d2n, axis=1) >= 0)


def test_topk_duplicates_ordered_by_index():
    rng = np.random.default_rng(2)
    q = rng.random((1, 3), np.float32)
    r = rng.random((500, 3), np.float32) + 2.0
    spots = (401, 77, 240, 333, 105)
    for s in spots:
        r[s] = q[0]
    idx, d2 = topk_knn(q, r, 4)
    np.testing.assert_array_equal(np.asarray(idx)[0], sorted(spots)[:4])
    assert np.all(np.asarray(d2)[0] == 0.0)


def test_topk_engines_differential():
    """The sweep engine (one read, per-lane K-state) and the K-pass banded
    engine select by the same (kernel-score, index) lex rule over the same
    score arithmetic — outputs must match exactly, including planted
    duplicate ties."""
    rng = np.random.default_rng(11)
    q = rng.random((16, 5), np.float32)
    r = rng.random((7000, 5), np.float32)
    r[303] = r[5999]  # exact duplicate pair crossing the candidate lanes
    r[42] = q[3]
    for kk in (2, 7, 32):
        si, sd = topk_knn(q, r, kk, method="sweep")
        pi, pd = topk_knn(q, r, kk, method="passes")
        np.testing.assert_array_equal(np.asarray(si), np.asarray(pi))
        np.testing.assert_array_equal(np.asarray(sd), np.asarray(pd))
    # K above the sweep limit routes to passes; explicit sweep raises
    from tpu_knn.kernels.topk import SWEEP_MAX_NEIGHBORS
    with pytest.raises(ValueError, match="sweep"):
        topk_knn(q, r, SWEEP_MAX_NEIGHBORS + 1, method="sweep")


def test_topk_k1_matches_1nn():
    rng = np.random.default_rng(3)
    q = rng.random((6, 4), np.float32)
    r = rng.random((3000, 4), np.float32)
    idx, _ = topk_knn(q, r, 1)
    np.testing.assert_array_equal(
        np.asarray(idx)[:, 0], tpu_knn.nearest_neighbors(q, r))


def test_topk_nnindex_and_api():
    rng = np.random.default_rng(4)
    ref = rng.random((10_000, 7), np.float32)
    q = rng.random((3, 7), np.float32)
    want = oracle_topk(q, ref, 6)
    index = NNIndex(ref, strategy="fused")
    gi, gd = index.query(q, neighbors=6)
    np.testing.assert_array_equal(np.asarray(gi), want)
    out = tpu_knn.nearest_neighbors(q, ref, neighbors=6)
    np.testing.assert_array_equal(out, want)
    # m=0 degenerate through the API
    assert tpu_knn.nearest_neighbors(
        np.zeros((0, 7), np.float32), ref, neighbors=6).shape == (0, 6)


def test_topk_validation():
    rng = np.random.default_rng(5)
    q = rng.random((2, 3), np.float32)
    r = rng.random((50, 3), np.float32)
    with pytest.raises(ValueError, match="neighbors"):
        topk_knn(q, r, 51)  # K > n
    with pytest.raises(ValueError, match="neighbors"):
        topk_knn(q, r, 0)
    # K above MAX_NEIGHBORS routes to the passes engine (the radius-
    # escalation ceiling lift, VERDICT r2 item 7)...
    big_r = np.random.rand(MAX_NEIGHBORS + 10, 3).astype(np.float32)
    gi, _ = topk_knn(q, big_r, MAX_NEIGHBORS + 1)
    d2b = ((q[:, None, :] - big_r[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(
        gi, np.argsort(d2b, axis=1, kind="stable")[:, : MAX_NEIGHBORS + 1])
    # ...but only 'passes' serves it, and PASSES_MAX_NEIGHBORS is hard.
    with pytest.raises(ValueError, match="sweep"):
        topk_knn(q, big_r, MAX_NEIGHBORS + 1, method="sweep")
    from tpu_knn.kernels.topk import PASSES_MAX_NEIGHBORS

    with pytest.raises(ValueError, match="neighbors"):
        topk_knn(q, np.random.rand(PASSES_MAX_NEIGHBORS + 10, 3
                                   ).astype(np.float32),
                 PASSES_MAX_NEIGHBORS + 1)
    with pytest.raises(ValueError, match="version"):
        tpu_knn.nearest_neighbors(q, r, version="v4", neighbors=3)
    # kdtree + native backend now SERVES top-K (tk_kdtree_query_topk);
    # only the strategies without a position-indexed operand or native
    # tree refuse.
    from tpu_knn import native

    index = NNIndex(r, strategy="kdtree")
    if native.available():
        gi, _ = index.query(q, neighbors=2)
        d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(
            gi, np.argsort(d2, axis=1, kind="stable")[:, :2])
    # sharded now SERVES top-K off its prepared shard-resident operands
    # (VERDICT r2 item 4).
    index = NNIndex(r, strategy="sharded")
    gi, _ = index.query(q, neighbors=2)
    d2s = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(
        np.asarray(gi), np.argsort(d2s, axis=1, kind="stable")[:, :2])


def test_topk_bounded_pass_same_lane_duplicates():
    """The m<=4 bounded two-pass route: duplicates planted in the SAME
    128-lane slot (cols 128 apart) must all surface via one lane's K-deep
    state, ordered by index — and boundary ties at the bound B (score ==
    B) must be admitted by the (B, I32_MAX) seed."""
    rng = np.random.default_rng(70)
    q = rng.random((1, 3), np.float32)
    r = rng.random((4000, 3), np.float32) + 2.0
    spots = (100, 228, 356, 484, 612)           # same lane: 100 + 128*j
    for s in spots:
        r[s] = q[0]
    idx, d2 = topk_knn(q, r, 5)
    np.testing.assert_array_equal(np.asarray(idx)[0], spots)
    assert np.all(np.asarray(d2)[0] == 0.0)
    # K smaller than the tie group: lowest indices win
    idx, _ = topk_knn(q, r, 3)
    np.testing.assert_array_equal(np.asarray(idx)[0], spots[:3])


def test_sweep_tiles_stay_sublane_aligned():
    """Review regression: VMEM-budget halving of tile_m must preserve the
    multiple-of-8 invariant (88 -> 40, not 44, which the builder rejects
    — crashed topk_knn(m=88, n=2^20, K=16, method='sweep'))."""
    from tpu_knn.kernels.topk import _build_sweep_candidates, _sweep_tiles

    for m, kk in ((88, 16), (200, 32), (1000, 8)):
        tm, tn = _sweep_tiles(3, m, 1 << 20, kk, "packed")
        assert tm % 8 == 0 and tn % 128 == 0, (m, kk, tm, tn)
        _build_sweep_candidates(m, 1 << 20, 3, kk, tm, tn, "packed")


def test_neighbors_one_returns_2d_rows():
    """Review regression: neighbors=1 must honor the top-K contract
    ((m, 1) rows) and the version-incompatibility check, not silently
    fall through to the 1-NN path."""
    rng = np.random.default_rng(80)
    q = rng.random((5, 3), np.float32)
    r = rng.random((400, 3), np.float32)
    out = tpu_knn.nearest_neighbors(q, r, neighbors=1)
    assert out.shape == (5, 1)
    np.testing.assert_array_equal(out[:, 0], tpu_knn.nearest_neighbors(q, r))
    gi, gd = NNIndex(r).query(q, neighbors=1)
    assert np.asarray(gi).shape == (5, 1) and np.asarray(gd).shape == (5, 1)
    with pytest.raises(ValueError, match="version"):
        tpu_knn.nearest_neighbors(q, r, version="v4", neighbors=1)


def test_within_radius():
    from tpu_knn.kernels.topk import within_radius

    rng = np.random.default_rng(90)
    q = rng.random((6, 4), np.float32)
    r = rng.random((3000, 4), np.float32)
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    radius = 0.22
    idx, d2, cnt = within_radius(q, r, radius, 16)
    idx, d2, cnt = np.asarray(idx), np.asarray(d2), np.asarray(cnt)
    for i in range(6):
        true = np.nonzero(D[i] <= radius ** 2)[0]
        want = true[np.lexsort((true, D[i, true]))][:16]
        got = idx[i][idx[i] >= 0]
        assert cnt[i] == len(got)
        np.testing.assert_array_equal(got, want)
        assert np.all(np.isinf(d2[i][len(got):]))
    # radius covering nothing
    _, _, cnt0 = within_radius(q, r + 50.0, 0.1, 4)
    assert np.all(np.asarray(cnt0) == 0)
    with pytest.raises(ValueError, match="radius"):
        within_radius(q, r, -1.0, 4)


def test_within_radius_complete_escalates():
    """Plant MORE in-radius points than the starting cap: the escalating
    variant must return the full in-radius set (VERDICT r2 item 7)."""
    from tpu_knn.kernels.topk import within_radius, within_radius_complete

    rng = np.random.default_rng(92)
    r = rng.random((1200, 3), np.float32) * 10.0
    q = rng.random((3, 3), np.float32)
    # 70 points clustered within radius 0.5 of query 0 (> start_cap=32).
    r[100:170] = q[0] + rng.normal(0, 0.1, (70, 3)).astype(np.float32)
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    radius = 0.5
    # Single-shot at cap 32 truncates (count == cap flags it)...
    _, _, cnt32 = within_radius(q, r, radius, 32)
    assert int(np.asarray(cnt32)[0]) == 32
    # ...the complete variant escalates until every row is exact.
    idx, d2, cnt = within_radius_complete(q, r, radius, start_cap=32)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for i in range(3):
        true = np.nonzero(D[i] <= radius ** 2)[0]
        assert cnt[i] == len(true) < idx.shape[1]
        got = idx[i][idx[i] >= 0]
        want = true[np.lexsort((true, D[i, true]))]
        np.testing.assert_array_equal(got, want)


def test_within_radius_cap_clamped_and_ceiling():
    from tpu_knn.kernels.topk import (
        PASSES_MAX_NEIGHBORS, within_radius, within_radius_complete,
    )

    rng = np.random.default_rng(93)
    r = rng.random((40, 3), np.float32)
    q = rng.random((2, 3), np.float32)
    # A generous cap on a small reference set is valid: clamped to n,
    # output padded back to the requested static width (ADVICE r2).
    idx, d2, cnt = within_radius(q, r, 10.0, 64)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    assert idx.shape == (2, 64)
    assert np.all(cnt == 40) and np.all(idx[:, 40:] == -1)
    # Beyond the engine ceiling on a large set: a radius-specific error.
    big = rng.random((PASSES_MAX_NEIGHBORS + 100, 3), np.float32)
    with pytest.raises(ValueError, match="max_results"):
        within_radius(q, big, 0.1, PASSES_MAX_NEIGHBORS + 1)
    # complete variant: radius capturing everything on a big set raises
    # once the ceiling is hit.
    dense_cloud = np.zeros((PASSES_MAX_NEIGHBORS + 50, 3), np.float32)
    with pytest.raises(ValueError, match="ceiling"):
        within_radius_complete(np.zeros((1, 3), np.float32), dense_cloud,
                               1.0, start_cap=256)


def test_query_radius_escalating_default():
    """NNIndex.query_radius(max_results=None) returns the TRUE in-radius
    set, escalating past the planted cluster size."""
    from tpu_knn.engine.index import NNIndex

    rng = np.random.default_rng(94)
    r = rng.random((800, 4), np.float32) * 8.0
    q = rng.random((2, 4), np.float32)
    r[10:60] = q[1] + rng.normal(0, 0.05, (50, 4)).astype(np.float32)
    ix = NNIndex(r)
    idx, d2, cnt = ix.query_radius(q, 0.4)
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for i in range(2):
        true = np.nonzero(D[i] <= 0.4 ** 2)[0]
        assert cnt[i] == len(true)
        np.testing.assert_array_equal(
            idx[i][idx[i] >= 0], true[np.lexsort((true, D[i, true]))])
    # Explicit generous cap on a small/shrinking set: clamped, padded.
    ix_small = NNIndex(r[:400])
    idx2, _, cnt2 = ix_small.query_radius(q, 30.0, 450)
    assert np.asarray(idx2).shape == (2, 450)
    assert np.all(np.asarray(cnt2) == 400)
    # A cap the engine ceiling cannot serve raises.
    with pytest.raises(ValueError, match="ceiling"):
        ix.query_radius(q, 30.0, 900)


def test_api_neighbors_validation_consistent_at_m0():
    """ADVICE r2: K validation must run before the empty-batch early
    return so the contract matches the non-empty path."""
    r = np.random.default_rng(95).random((50, 3)).astype(np.float32)
    empty = np.zeros((0, 3), np.float32)
    for bad in (0, -3, 51):
        with pytest.raises(ValueError, match="neighbors"):
            tpu_knn.nearest_neighbors(empty, r, neighbors=bad)
    assert tpu_knn.nearest_neighbors(empty, r, neighbors=5).shape == (0, 5)


def test_seeded_engine_differential():
    """The extraction-based batch engine (VERDICT r2 item 1) vs the
    K-pass banded engine and the oracle. The extraction engine selects
    by EXACT distance over a certified superset of the approx-score
    top-K, so per-rank exact distances must match the oracle exactly up
    to f32 reduction noise; planted duplicates (d2 == 0, unambiguous)
    must match index-for-index including the lex tie rule."""
    rng = np.random.default_rng(21)
    q = rng.random((48, 5), np.float32)
    r = rng.random((9000, 5), np.float32)
    r[303] = r[5999]          # duplicate pair across candidate lanes
    r[100] = r[228] = r[356]  # same-lane triplet (128 apart)
    r[42] = q[3]              # d=0 hit
    r[77] = q[7]
    r[77 + 128] = q[7]        # d=0 duplicate in the same lane/cell
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    for kk in (2, 8, 32):
        si, sd = topk_knn(q, r, kk, method="seeded")
        pi, pd = topk_knn(q, r, kk, method="passes")
        want_d = np.sort(D, axis=1)[:, :kk]
        for got in (np.asarray(sd), np.asarray(pd)):
            np.testing.assert_allclose(got, want_d, rtol=1e-5, atol=1e-6)
        # unambiguous rows (planted zeros + clear gaps): exact indices
        np.testing.assert_array_equal(np.asarray(si)[3, 0], 42)
        np.testing.assert_array_equal(np.asarray(pi)[3, 0], 42)
        if kk >= 2:
            np.testing.assert_array_equal(np.asarray(si)[7, :2],
                                          [77, 77 + 128])


def test_seeded_engine_large_batch_and_duplicate_fallback():
    """Large m (the extraction engine is stateless — no batch split) and
    the certified fallback: a cell with >= 3 qualifiers (planted
    duplicate cluster inside one 128-lane cell) must route the batch to
    the passes engine and stay exact."""
    rng = np.random.default_rng(22)
    kk = 16
    m = 520
    q = rng.random((m, 3)).astype(np.float32)
    r = rng.random((4000, 3)).astype(np.float32)
    r[1234] = q[519]
    r[99] = q[511]
    si, sd = topk_knn(q, r, kk, method="seeded")
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(sd), np.sort(D, 1)[:, :kk],
                               rtol=1e-5, atol=1e-6)
    assert int(np.asarray(si)[519, 0]) == 1234
    # >= 3 duplicates of a query point within ONE cell (cols 5, 17, 29
    # share cell 0): cnt >= 3 -> certified fallback -> still exact.
    r2 = rng.random((4000, 3)).astype(np.float32) + 2.0
    for c in (5, 17, 29, 41):
        r2[c] = q[0]
    si2, sd2 = topk_knn(q[:8], r2, 4, method="seeded")
    np.testing.assert_array_equal(np.asarray(si2)[0], [5, 17, 29, 41])
    assert np.all(np.asarray(sd2)[0] == 0.0)


def test_seeded_engine_ragged_n_and_auto_routing():
    from tpu_knn.kernels.topk import _auto_method

    # auto routes the batch regime to seeded now
    assert _auto_method(1024, 8) == "seeded"
    assert _auto_method(64, 8) == "seeded"
    assert _auto_method(8, 8) == "sweep"
    assert _auto_method(1024, 64) == "seeded"
    assert _auto_method(1024, 65) == "seeded"   # multi-round past 64
    assert _auto_method(1024, 512) == "seeded"
    assert _auto_method(1024, 513) == "passes"
    rng = np.random.default_rng(23)
    q = rng.random((40, 7), np.float32)
    r = rng.random((2777, 7), np.float32)   # ragged vs any tile width
    si, sd = topk_knn(q, r, 8, method="seeded")
    np.testing.assert_array_equal(np.asarray(si), oracle_topk(q, r, 8))
    # K == n shorter than the lane width: bounds from +inf lanes
    q2 = rng.random((36, 3), np.float32)
    r2 = rng.random((100, 3), np.float32)
    si2, _ = topk_knn(q2, r2, 16, method="seeded")
    np.testing.assert_array_equal(np.asarray(si2), oracle_topk(q2, r2, 16))


def test_seeded_engine_escalating_compaction():
    """Qualifier spike past the fast compaction cap (48) but within the
    full 2K+16 capacity: the on-device escalation (lax.cond re-running
    the packed top_k at full cap) must recover every planted neighbor
    exactly — 60 near-duplicates of query 0, one per distinct 256-lane
    cell, all at nearly equal distance, so 60 cells qualify at K=32."""
    rng = np.random.default_rng(25)
    k, n, m, kk = 8, 1 << 16, 16, 32    # nc=256: cap_fast=48, cap_full=80
    r = (rng.random((n, k)) * 10 + 5).astype(np.float32)
    q = rng.random((m, k)).astype(np.float32)
    for j in range(60):
        r[j * 256 + 7] = q[0] + np.float32(1e-4 * (j + 1))
    si, sd = topk_knn(q, r, kk, method="seeded")
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    oi = np.argsort(D, axis=1, kind="stable")[:, :kk]
    np.testing.assert_array_equal(np.asarray(si), oi)
    np.testing.assert_allclose(np.asarray(sd),
                               np.take_along_axis(D, oi, axis=1),
                               rtol=1e-5, atol=1e-6)


def test_seeded_engine_k_beyond_32():
    """32 < K <= 64: 128-lane cells + 4-way part-split compaction.
    Differential vs the oracle on uniform data, plus a one-part
    qualifier pileup (60 near-duplicate cells all in part 0) that must
    escalate to the single-part tier and stay exact."""
    rng = np.random.default_rng(26)
    q = rng.random((40, 7), np.float32)
    r = rng.random((6000, 7), np.float32)
    r[123] = q[11]                      # d=0 hit
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    for kk in (48, 64):
        si, sd = topk_knn(q, r, kk, method="seeded")
        np.testing.assert_allclose(np.asarray(sd),
                                   np.sort(D, 1)[:, :kk],
                                   rtol=1e-5, atol=1e-6)
        assert int(np.asarray(si)[11, 0]) == 123
    # skew: every planted cell lands in part 0 of the 4-way split
    r2 = (rng.random((1 << 15, 5)) * 10 + 5).astype(np.float32)
    q2 = rng.random((8, 5)).astype(np.float32)
    for j in range(60):
        r2[j * 128 + 3] = q2[0] + np.float32(1e-4 * (j + 1))
    si2, _ = topk_knn(q2, r2, 48, method="seeded")
    D2 = ((q2[:, None, :] - r2[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(
        np.asarray(si2), np.argsort(D2, 1, kind="stable")[:, :48])


def test_seeded_engine_multi_round_k_beyond_64():
    """K > 64: ceil(K/64) score-band rounds, each a banded 1-NN pre-pass
    + banded extraction over its half-open band (B_{r-1}, B_r]; one
    exact rerank over the concatenated candidates. Differential vs the
    oracle with a planted duplicate pair (tie -> lowest index first)."""
    rng = np.random.default_rng(31)
    q = rng.random((24, 7), np.float32)
    r = rng.random((20000, 7), np.float32)
    r[123] = q[11]
    r[9000] = q[11]                    # exact duplicate of r[123]
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    for kk in (100, 128, 200):
        si, sd = topk_knn(q, r, kk, method="seeded")
        np.testing.assert_allclose(np.asarray(sd),
                                   np.sort(D, 1)[:, :kk],
                                   rtol=1e-5, atol=1e-6)
        assert int(np.asarray(si)[11, 0]) == 123
        assert int(np.asarray(si)[11, 1]) == 9000


def test_seeded_engine_multi_round_fallback_paths():
    """Rounds that cannot certify must land on the passes fallback and
    stay exact: (a) K == n (later rounds exhaust; the bound goes +inf
    and floods the counts), (b) dense near-duplicate clusters (cells
    beyond the cubic solver)."""
    rng = np.random.default_rng(7)
    q = rng.random((6, 5), np.float32)
    r = rng.random((300, 5), np.float32)
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    si, sd = topk_knn(q, r, 300, method="seeded")
    np.testing.assert_allclose(np.asarray(sd), np.sort(D, 1),
                               rtol=1e-5, atol=1e-6)
    r2 = np.zeros((5000, 5), np.float32)
    r2[:200] = q[0] + 1e-6             # 200 near-identical points
    D2 = ((q[:, None, :] - r2[None, :, :]) ** 2).sum(-1)
    si2, sd2 = topk_knn(q, r2, 100, method="seeded")
    np.testing.assert_allclose(np.asarray(sd2), np.sort(D2, 1)[:, :100],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(si2), np.argsort(D2, 1, kind="stable")[:, :100])


def test_solve_cells_integer_quadratic_and_certificate():
    """Regression for the XLA:TPU approximate-sqrt trap (CLAUDE.md):
    sqrt(9025) measured one ulp above 95.0 on TPU, so the deflation
    quadratic's truncating cast shifted lane 11 to 10 (the K=512
    differential caught one lost candidate in 524288 —
    scripts/r6_rounds_debug*.py). quad_lanes must treat the float sqrt
    as a seed: round, verify d*d == disc in int32, and halve in
    integers. This case is the exact offending cell (lanes 11/106/127);
    the corrupt-moment case must flip the new certificate instead of
    silently mis-recovering."""
    import jax
    import jax.numpy as jnp

    from tpu_knn.kernels.topk import _solve_cells

    solve = jax.jit(lambda *a: _solve_cells(
        *a, cell=128, n=1 << 20, solvable=3))
    cellc = jnp.array([[6419]], jnp.int32)
    valid = jnp.array([[True]])
    c_cnt = jnp.array([[3]], jnp.int32)
    cols, ok = solve(cellc, valid, c_cnt,
                     jnp.array([[244]], jnp.int32),      # 11+106+127
                     jnp.array([[27486]], jnp.int32),    # sum l^2
                     jnp.array([[3240730]], jnp.int32))  # sum l^3
    assert bool(ok)
    assert sorted(np.asarray(cols)[0].tolist()) == [
        6419 * 128 + 11, 6419 * 128 + 106, 6419 * 128 + 127]
    # corrupt p2 (disc no longer a perfect square): certificate trips
    _cols2, ok2 = solve(cellc, valid, c_cnt,
                        jnp.array([[244]], jnp.int32),
                        jnp.array([[27487]], jnp.int32),
                        jnp.array([[3240730]], jnp.int32))
    assert not bool(ok2)


def test_cell_compactor_positional_differential():
    """The Pallas positional compactor (prefix count + slot scatter,
    r7) vs a NumPy reference: random qualifier patterns — including
    overflow rows past cap, all-empty rows, part splits, ragged m, and
    the multi-width-chunk path (pw > max_cw) — must land every part's
    qualifiers in its first cap slots in ascending cell order, with
    zeros beyond (field 0 != 0 is the validity contract)."""
    import jax.numpy as jnp

    from tpu_knn.kernels.topk import _build_cell_compactor

    rng = np.random.default_rng(77)
    for m, nc, parts, cap, nf, dens in [
            (16, 512, 1, 8, 1, 0.02),
            (16, 512, 1, 8, 2, 0.08),       # overflow rows
            (12, 1024, 4, 8, 2, 0.02),      # parts, ragged m
            (8, 8192, 1, 48, 2, 0.004),     # widest butterfly part
            (4, 16384, 1, 16, 2, 0.001),    # w_tiles > 1: slot loop
            (16, 512, 1, 8, 2, 0.0)]:       # all-empty
        qual = rng.random((m, nc)) < dens
        fields = [
            np.where(qual, rng.integers(1, 1 << 30, (m, nc)), 0)
            .astype(np.int32)]
        for _ in range(nf - 1):
            fields.append(
                np.where(qual, rng.integers(0, 1 << 26, (m, nc)), 0)
                .astype(np.int32))
        comp = _build_cell_compactor(m, nc, parts, cap, nf)
        got = [np.asarray(o) for o in comp(*map(jnp.asarray, fields))]
        pw = nc // parts
        want = [np.zeros((m, parts * cap), np.int32)
                for _ in range(nf + 1)]
        for r in range(m):
            for p in range(parts):
                s = 0
                for c in range(pw):
                    if fields[0][r, p * pw + c] and s < cap:
                        want[0][r, p * cap + s] = c
                        for f in range(nf):
                            want[f + 1][r, p * cap + s] = (
                                fields[f][r, p * pw + c])
                        s += 1
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)


def test_seeded_engine_row_chunking_beyond_2048():
    """m > 2048 splits into 1024-row sub-batches (post-compaction cost
    is nonlinear in m); results must be seamless across boundaries."""
    rng = np.random.default_rng(24)
    m = 2056
    q = rng.random((m, 3)).astype(np.float32)
    r = rng.random((1500, 3)).astype(np.float32)
    r[700] = q[2055]   # d=0 in the final ragged sub-batch
    si, sd = topk_knn(q, r, 4, method="seeded")
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(sd), np.sort(D, 1)[:, :4],
                               rtol=1e-5, atol=1e-6)
    assert int(np.asarray(si)[2055, 0]) == 700


def test_extraction_masks_whole_padding_tiles():
    """Review r3 regression (CONFIRMED bug): a prepadded operand with
    WHOLE zero-point padding tiles (n % tile_n == 0 but n_ops > n) must
    not leak phantom qualifiers into the moment counts — phantom cells
    flooded cnt and silently routed every batch to the K-pass fallback
    on zero-centered data."""
    from tpu_knn.kernels.topk import _build_extract_candidates, _build_topk

    rng = np.random.default_rng(30)
    m, n, k = 16, 1024, 8
    q = rng.normal(0, 1, (m, k)).astype(np.float32)
    r = rng.normal(0, 1, (n, k)).astype(np.float32)
    import jax.numpy as jnp

    r_op = jnp.pad(jnp.asarray(r), ((0, 1536 - n), (0, 0))).T
    mom = _build_extract_candidates(m, n, k, 8, 512, "packed", n_ops=1536)
    (ap,) = mom(jnp.asarray(q), (r_op,),
                jnp.full((m, 1), 5.0, jnp.float32))
    ap = np.asarray(ap)
    assert int((ap[:, -(-n // mom.cell):] != 0).sum()) == 0
    # the cubic (K > 32) mode packs in-kernel: phantom cells must not
    # qualify there either
    momc = _build_extract_candidates(m, n, k, 8, 512, "packed",
                                     n_ops=1536, kk=64)
    apc, _p3 = momc(jnp.asarray(q), (r_op,),
                    jnp.full((m, 1), 5.0, jnp.float32))
    apc = np.asarray(apc)
    assert int((apc[:, -(-n // momc.cell):] != 0).sum()) == 0
    # end-to-end through the engine on the same operand width
    run = _build_topk(m, n, k, 4, 1536, "packed", "seeded")
    si, sd = run(jnp.asarray(q), (r_op,), jnp.asarray(r))
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(sd), np.sort(D, 1)[:, :4],
                               rtol=1e-5, atol=1e-6)


def test_moment_weights_exact_and_cell_policy():
    """The MXU moment matmul is exact only because every weight is an
    integer <= 255 (bf16-exact) — verify the weight matrix bit-survives
    the bf16 cast and that a float mask @ weights product reproduces
    integer moments, in both the quadratic (4-field) and cubic
    (8-field) modes. Cell policy: 256-lane cells whenever the tile
    allows; K > 16 switches to 8 fields (cubic recovery)."""
    from tpu_knn.kernels.topk import (_extract_mode, _moment_weights,
                                      _EXTRACT_FIELDS,
                                      _EXTRACT_FIELDS_CUBIC)

    for tile_n, cell, nf in ((512, 256, 4), (512, 128, 4), (256, 128, 4),
                             (512, 256, 8), (512, 128, 8)):
        w = np.asarray(_moment_weights(tile_n, cell, nf)).astype(np.float64)
        assert w.max() <= 255 and np.all(w == np.round(w))
        rng = np.random.default_rng(31)
        mask = (rng.random((4, tile_n)) < 0.1).astype(np.float64)
        # field-major layout: field f spans columns [f*cpt, (f+1)*cpt)
        cpt = tile_n // cell
        mo = (mask @ w).reshape(4, nf, cpt)
        l = np.arange(tile_n) % cell
        lc = l.reshape(cpt, cell)
        mk3 = mask.reshape(4, cpt, cell)
        np.testing.assert_array_equal(mo[:, 0], mk3.sum(-1))
        np.testing.assert_array_equal(mo[:, 1], (mk3 * lc).sum(-1))
        sumsq = 256.0 * mo[:, 2] + mo[:, 3]
        np.testing.assert_array_equal(sumsq, (mk3 * lc * lc).sum(-1))
        if nf == _EXTRACT_FIELDS_CUBIC:
            sumcu = (65536.0 * mo[:, 4] + 256.0 * mo[:, 5] + mo[:, 6])
            np.testing.assert_array_equal(sumcu, (mk3 * lc ** 3).sum(-1))
            np.testing.assert_array_equal(mo[:, 7], 0.0)
    assert _extract_mode(8192, 8) == (256, _EXTRACT_FIELDS)
    assert _extract_mode(8192, 16) == (256, _EXTRACT_FIELDS)
    assert _extract_mode(8192, 32) == (256, _EXTRACT_FIELDS_CUBIC)
    # r5: narrow tiles (<= 2048 — the VMEM budget's embedding-scale-k
    # signature) drop quad cells to 64 lanes: overflow 64x rarer and
    # the overflow-cell expansion 4x narrower at wide k.
    assert _extract_mode(2048, 16) == (64, _EXTRACT_FIELDS)
    assert _extract_mode(128, 8) == (64, _EXTRACT_FIELDS)
    assert _extract_mode(128, 32) == (128, _EXTRACT_FIELDS_CUBIC)


def test_cubic_recovery_triples_and_fallback():
    """K > 16 routes the extraction engine to cubic (8-field) recovery:
    a cell holding THREE qualifiers must be solved exactly from its
    power sums (Newton's identities), including when lane 0 of the cell
    is one of them (the phantom-zero-root case); FOUR qualifiers in one
    cell must trip the certified fallback and stay exact."""
    rng = np.random.default_rng(27)
    kk = 32
    q = rng.random((20, 6), np.float32)
    r = rng.random((3000, 6), np.float32) + 2.0  # far background
    # Triple inside one cell (cols within a 128-lane span share a cell
    # at EITHER cell width); col 512 is lane 0 at both widths and
    # exercises the phantom-zero-root tie.
    for c in (512, 550, 600):
        r[c] = q[0]
    # Another triple for a different row, all lanes > 0.
    for c in (1027, 1060, 1100):
        r[c] = q[1]
    si, sd = topk_knn(q, r, kk, method="seeded")
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(sd), np.sort(D, 1)[:, :kk],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(si)[0, :3], [512, 550, 600])
    np.testing.assert_array_equal(np.asarray(si)[1, :3],
                                  [1027, 1060, 1100])
    # 4 qualifiers in cell 0 (all cols < 128, one cell at either
    # width) -> cnt=4 > solvable=3 -> passes fallback.
    r2 = rng.random((3000, 6), np.float32) + 2.0
    for c in (3, 30, 60, 90):
        r2[c] = q[2]
    si2, sd2 = topk_knn(q, r2, kk, method="seeded")
    np.testing.assert_allclose(np.asarray(sd2),
                               np.sort(((q[:, None, :] - r2[None, :, :])
                                        ** 2).sum(-1), 1)[:, :kk],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(si2)[2, :4],
                                  [3, 30, 60, 90])


def test_aos_percall_topk_differential_and_fallback():
    """The zero-prep per-call engine (m <= 4): differential vs passes,
    lowest-index ties, and the certified fallback when one query's
    qualifier count exceeds cap = 4K + 64 (planted duplicate flood)."""
    rng = np.random.default_rng(33)
    q = rng.random((3, 6), np.float32)
    r = rng.random((5000, 6), np.float32)
    r[303] = r[999]          # duplicate pair
    r[42] = q[1]             # d=0 hit
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    for kk in (1, 4, 16):
        ai, ad = topk_knn(q, r, kk, method="aos")
        pi, pd = topk_knn(q, r, kk, method="passes")
        np.testing.assert_allclose(np.asarray(ad), np.sort(D, 1)[:, :kk],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ai), np.asarray(pi))
    assert int(np.asarray(topk_knn(q, r, 1, method="aos")[0])[1, 0]) == 42
    # auto routes per-call m<=4 to aos
    from tpu_knn.kernels.topk import _build_aos_topk
    misses0 = _build_aos_topk.cache_info().misses
    topk_knn(q, r, 3)
    assert _build_aos_topk.cache_info().misses == misses0 + 1
    # duplicate flood INSIDE one 4096-cell: all qualifiers gathered with
    # the cell — solved exactly, no fallback needed.
    r2 = rng.random((5000, 6), np.float32) + 2.0
    r2[:80] = q[0]
    fi, fd = topk_knn(q, r2, 2, method="aos")
    np.testing.assert_array_equal(np.asarray(fi)[0], [0, 1])
    assert np.all(np.asarray(fd)[0] == 0.0)
    # duplicates spread across > cap_c = kk+16 DISTINCT cells -> the
    # certified fallback (stable lax.top_k), still exact lowest-index.
    r4 = rng.random((90_000, 6), np.float32) + 2.0
    spread = [i * 4096 for i in range(20)]
    for c in spread:
        r4[c] = q[0]
    fi4, fd4 = topk_knn(q, r4, 2, method="aos")
    np.testing.assert_array_equal(np.asarray(fi4)[0], spread[:2])
    assert np.all(np.asarray(fd4)[0] == 0.0)
    # ragged n (not a lane multiple) + tiny n edge
    q3 = rng.random((2, 3), np.float32)
    r3 = rng.random((203, 3), np.float32)
    ai3, _ = topk_knn(q3, r3, 8, method="aos")
    np.testing.assert_array_equal(np.asarray(ai3), oracle_topk(q3, r3, 8))


def test_nnindex_topk_m1_routes_aos():
    """Prepared top-K at m == 1 routes the zero-prep AoS cell engine
    over the resident ref (beats the prepared bounded sweep at every
    measured k; the engine is linear in m so m >= 2 keeps the one-scan
    prepared engines); tombstones self-exclude after removal."""
    from tpu_knn.engine.index import NNIndex
    from tpu_knn.kernels.topk import _build_aos_topk

    rng = np.random.default_rng(41)
    r = rng.random((3000, 3), np.float32)
    index = NNIndex(r, mutable=True)
    q = rng.random((1, 3), np.float32)
    misses0 = _build_aos_topk.cache_info().misses
    gi, gd = index.query(q, neighbors=5)
    assert _build_aos_topk.cache_info().misses > misses0
    np.testing.assert_array_equal(np.asarray(gi), oracle_topk(q, r, 5))
    index.remove([int(gi[0, 0]), int(gi[0, 1])])
    gi2, gd2 = index.query(q, neighbors=5)
    assert int(gi2[0, 0]) == int(gi[0, 2])
    # m >= 2 buckets keep the prepared engine path
    misses1 = _build_aos_topk.cache_info().misses
    q8 = rng.random((8, 3), np.float32)
    gi8, _ = index.query(q8, neighbors=5)
    assert gi8.shape == (8, 5)
    assert _build_aos_topk.cache_info().misses == misses1


def test_within_radius_accepts_sequences():
    """Review r3 regression: plain list refs worked before the cap
    validation read ref.shape early."""
    from tpu_knn.kernels.topk import within_radius, within_radius_complete

    q = [[0.1, 0.2], [0.9, 0.8]]
    r = [[0.1, 0.2], [0.5, 0.5], [0.95, 0.85]]
    idx, d2, cnt = within_radius(np.asarray(q, np.float32), r, 0.2, 2)
    assert int(np.asarray(cnt)[0]) == 1
    idx2, _, cnt2 = within_radius_complete(np.asarray(q, np.float32), r, 5.0)
    assert np.all(np.asarray(cnt2) == 3)


def test_compact_and_solve_p3_gather_cubic():
    """The cubic geometries gather p3 at the recovered cell indices
    instead of carrying it through the compactor's slot loop
    (scripts/r17_compact_iso.py: the loop costs cap*nc VPU ops PER
    field). Differential: compacted cubic recovery over scattered
    3-lane cells must reproduce every planted lane exactly."""
    import jax.numpy as jnp

    from tpu_knn.kernels.topk import _compact_and_solve

    rng = np.random.default_rng(93)
    m, nc, cell = 8, 1024, 128
    n = nc * cell
    qual = np.zeros((m, nc), bool)
    lanes_per_cell = {}
    for r in range(m):
        for c in rng.choice(nc, 30, replace=False):
            qual[r, c] = True
            ls = sorted(rng.choice(cell, rng.integers(1, 4),
                                   replace=False).tolist())
            lanes_per_cell[(r, c)] = ls
    cnt = np.zeros((m, nc), np.int64)
    e1 = np.zeros((m, nc), np.int64)
    p2 = np.zeros((m, nc), np.int64)
    p3 = np.zeros((m, nc), np.int64)
    for (r, c), ls in lanes_per_cell.items():
        cnt[r, c] = len(ls)
        e1[r, c] = sum(ls)
        p2[r, c] = sum(l * l for l in ls)
        p3[r, c] = sum(l ** 3 for l in ls)
    a = (np.minimum(cnt, 3) | (e1 << 2) | (p2 << 12)).astype(np.int32)
    fields = (jnp.asarray(a), jnp.asarray(p3.astype(np.int32)))
    cols, _valid, ok = _compact_and_solve(
        m, nc, 4, 48, fields, cell=cell, n=n, solvable=3)
    assert bool(ok)
    for r in range(m):
        got = sorted(int(c) for c in np.asarray(cols)[r] if c < n)
        want = sorted(c * cell + l
                      for (rr, c), ls in lanes_per_cell.items()
                      if rr == r for l in ls)
        assert got == want


def test_seeded_engine_single_band_k_beyond_64():
    """64 < K <= 128 at large-enough nc runs as ONE band: a depth-2
    pass 1 (each lane's two smallest scores = 256 distinct elements)
    bounds the global K-th score, 64-lane cells keep the cubic solver
    viable, and the whole chain needs 2 reference reads instead of the
    multi-round engine's 3. Differential vs the oracle with planted
    duplicates; a dense near-duplicate cluster must still certify into
    the passes fallback and stay exact."""
    rng = np.random.default_rng(94)
    q = rng.random((6, 9), np.float32)
    r = rng.random((1 << 16, 9), np.float32)   # nc64 = 1024 = 8*128
    r[123] = q[2]
    r[9000] = q[2]                             # duplicate pair tie
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    for kk in (72, 128):
        si, sd = topk_knn(q, r, kk, method="seeded")
        np.testing.assert_allclose(np.asarray(sd),
                                   np.sort(D, 1)[:, :kk],
                                   rtol=1e-5, atol=1e-6)
        assert int(np.asarray(si)[2, 0]) == 123
        assert int(np.asarray(si)[2, 1]) == 9000
    # dense cluster: >3 qualifiers in one 64-lane cell -> cnt overflow
    # certificate -> passes fallback, still exact
    r2 = (rng.random((1 << 16, 9)) * 10 + 5).astype(np.float32)
    for j in range(6):
        r2[40 + j] = q[0] + np.float32(1e-5 * (j + 1))
    si2, sd2 = topk_knn(q, r2, 96, method="seeded")
    D2 = ((q[:, None, :] - r2[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(
        np.asarray(si2), np.argsort(D2, 1, kind="stable")[:, :96])


def test_seeded_single_band_escalation_parts2():
    """K=128 part spike with a row census ABOVE 256: 280 exactly-tied
    planted cells — 128 in fast-part 0 (spike past cap_fast=96 forces
    escalation) and 152 in the second escalation half. The escalation
    tier now runs parts=2 (2 x 256 capacity; ADVICE r4 — a parts=1
    tier clamped at 256 sent any >256-census row to the ~27x passes
    fallback); each half fits, so the escalated recovery certifies and
    must be exact with lowest-index tie order."""
    rng = np.random.default_rng(95)
    k, n, m, kk = 9, 1 << 16, 4, 128    # cell=64 -> nc=1024, 8 parts
    q = rng.random((m, k), np.float32)
    r = (rng.random((n, k)) * 10 + 5).astype(np.float32)
    planted = list(range(128)) + list(range(512, 664))
    for c in planted:
        r[c * 64 + 3] = q[0] + np.float32(1e-4)
    si, sd = topk_knn(q, r, kk, method="seeded")
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    want = np.lexsort((np.tile(np.arange(n), (m, 1)), D))[:, :kk]
    np.testing.assert_array_equal(np.asarray(si), want)
    np.testing.assert_allclose(np.asarray(sd),
                               np.take_along_axis(D, want, axis=1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed,k,m,n,kk,recipe", [
    (11, 5, 9, 124928, 91, "quantized"),
    (15, 23, 2, 107520, 74, "duplicates"),
    (3, 9, 6, 99328, 128, "uniform"),
])
def test_seeded_single_band_fuzz(seed, k, m, n, kk, recipe):
    """Randomized differential over the single-band K range (65..128),
    distilled from a 16-config sweep (all exact) — quantized data plants
    dense exact-tie groups across 64-lane cells; duplicates cross the
    band/cert boundaries."""
    rng = np.random.default_rng(seed)
    q = rng.random((m, k), np.float32)
    r = rng.random((n, k), np.float32)
    if recipe == "quantized":
        q = np.round(q * 8) / 8
        r = np.round(r * 8) / 8
    elif recipe == "duplicates":
        for _ in range(10):
            i, j = rng.integers(0, n, 2)
            r[i] = r[j]
        r[rng.integers(0, n)] = q[rng.integers(0, m)]
    si, _sd = topk_knn(q, r, kk, method="seeded")
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    want = np.lexsort((np.tile(np.arange(n), (m, 1)), D))[:, :kk]
    np.testing.assert_array_equal(np.asarray(si), want)
