"""knn_graph: exact K-NN graph with index-based self-exclusion."""

import numpy as np
import pytest

import tpu_knn


def _gold(points, kk):
    n = points.shape[0]
    d = ((points[:, None, :] - points[None, :, :]) ** 2).sum(
        -1, dtype=np.float32)
    d[np.arange(n), np.arange(n)] = np.inf   # self excluded by index
    order = np.argsort(d, 1, kind="stable")[:, :kk]
    return order, np.take_along_axis(d, order, 1)


@pytest.mark.parametrize("n,k,kk", [(500, 3, 5), (900, 16, 10), (64, 2, 1)])
def test_graph_matches_bruteforce(n, k, kk):
    rng = np.random.default_rng(n + kk)
    pts = rng.random((n, k), np.float32)
    gi, gd = tpu_knn.knn_graph(pts, kk)
    wi, wd = _gold(pts, kk)
    np.testing.assert_array_equal(np.asarray(gi), wi)
    np.testing.assert_allclose(np.asarray(gd), wd, rtol=1e-6)


def test_graph_duplicates_stay_mutual_neighbors():
    """Duplicate points: d2=0 edges to the OTHER copies, never to self;
    >= K+1 exact duplicates exercise the self-absent compaction branch
    (the row's own index never enters its top-(K+1))."""
    rng = np.random.default_rng(7)
    pts = rng.random((300, 4), np.float32)
    dup = [10, 50, 90, 130, 170, 210]        # 6 copies, K+1 > 3
    for i in dup[1:]:
        pts[i] = pts[dup[0]]
    gi, gd = tpu_knn.knn_graph(pts, 3)
    gi, gd = np.asarray(gi), np.asarray(gd)
    for pos, i in enumerate(dup):
        others = [j for j in dup if j != i][:3]
        assert list(gi[i]) == others, (i, gi[i])
        np.testing.assert_array_equal(gd[i], 0.0)
    # No row may contain its own index.
    assert not (gi == np.arange(300)[:, None]).any()


def test_graph_batch_regime():
    """n large enough that the self-query auto-routes to the seeded
    batch engine."""
    rng = np.random.default_rng(8)
    pts = rng.random((2_048, 6), np.float32)
    gi, gd = tpu_knn.knn_graph(pts, 8)
    wi, wd = _gold(pts, 8)
    np.testing.assert_array_equal(np.asarray(gi), wi)


def test_graph_validation():
    pts = np.random.rand(8, 3).astype(np.float32)
    with pytest.raises(ValueError, match="OTHER"):
        tpu_knn.knn_graph(pts, 8)            # needs K <= n-1
    with pytest.raises(ValueError, match="OTHER"):
        tpu_knn.knn_graph(pts, 0)
    gi, gd = tpu_knn.knn_graph(pts, 7)
    assert np.asarray(gi).shape == (8, 7)


def test_graph_sharded_mesh_matches_bruteforce():
    """mesh=: the self-join runs dp x sp sharded (rows split as queries,
    the same set scanned as sp shards); results must match the
    single-chip graph's exact (d2, index) rows."""
    from tpu_knn.distributed.sharded import default_mesh

    rng = np.random.default_rng(11)
    pts = rng.random((1_000, 5), np.float32)    # ragged over 4 sp shards
    gi, gd = tpu_knn.knn_graph(pts, 6, mesh=default_mesh(dp=2, sp=4))
    wi, wd = _gold(pts, 6)
    np.testing.assert_array_equal(np.asarray(gi), wi)
    np.testing.assert_allclose(np.asarray(gd), wd, rtol=1e-6)
    assert not (np.asarray(gi) == np.arange(1_000)[:, None]).any()


def test_graph_sharded_duplicates_across_shards():
    """Exact duplicates planted in DIFFERENT sp shards: self-exclusion is
    by index, so cross-shard copies must surface as d2=0 neighbors with
    the lowest-index tie rule intact through the mesh merge."""
    from tpu_knn.distributed.sharded import default_mesh

    rng = np.random.default_rng(12)
    n = 800
    pts = rng.random((n, 4), np.float32)
    dup = [3, 203, 403, 603]                 # one per sp=4 shard of 200
    for i in dup[1:]:
        pts[i] = pts[dup[0]]
    gi, gd = tpu_knn.knn_graph(pts, 3, mesh=default_mesh(dp=1, sp=8))
    gi, gd = np.asarray(gi), np.asarray(gd)
    for i in dup:
        others = [j for j in dup if j != i][:3]
        assert list(gi[i]) == others, (i, gi[i])
        np.testing.assert_array_equal(gd[i], 0.0)
