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
    with pytest.raises(ValueError, match="neighbors"):
        topk_knn(q, np.random.rand(MAX_NEIGHBORS + 10, 3).astype(np.float32),
                 MAX_NEIGHBORS + 1)
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
    index = NNIndex(r, strategy="sharded")
    with pytest.raises(ValueError, match="fused/auto"):
        index.query(q, neighbors=2)


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
