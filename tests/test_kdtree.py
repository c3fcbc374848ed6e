"""KD-tree tests: build invariants, CPU query (v9), device traversal (v10)."""

import numpy as np
import pytest

from tpu_knn.kdtree.build import KDTree, build_kdtree, query_numpy, _build_numpy
from tpu_knn.kdtree.traversal import DeviceKDTree
from tpu_knn.oracle import oracle_callback


def oracle(search, ref):
    m, k = search.shape
    return oracle_callback(k, m, ref.shape[0], search, ref)


@pytest.mark.parametrize("native_build", [True, False])
def test_build_invariants(native_build):
    rng = np.random.default_rng(0)
    ref = rng.random((500, 4), np.float32)
    tree = build_kdtree(ref, prefer_native=native_build)
    n = 500
    assert tree.p.shape == (4 * n,)
    # Every point appears exactly once.
    stored = np.sort(tree.p[tree.p >= 0])
    np.testing.assert_array_equal(stored, np.arange(n))
    # BST property along each node's split dimension.
    def check(node, lo_bounds, hi_bounds):
        if node >= 4 * n or tree.p[node] < 0:
            return
        pt = tree.ref[tree.p[node]]
        for d in range(4):
            assert pt[d] >= lo_bounds[d] - 1e-7
            assert pt[d] <= hi_bounds[d] + 1e-7
        d = tree.dim[node]
        v = tree.split_val[node]
        lo2, hi2 = list(lo_bounds), list(hi_bounds)
        hi2[d] = min(hi_bounds[d], v)
        lo2[d] = max(lo_bounds[d], v)
        check(2 * node, lo_bounds, hi2)
        check(2 * node + 1, lo2, hi_bounds)
    check(1, [-np.inf] * 4, [np.inf] * 4)


def test_numpy_and_native_builds_both_query_exactly():
    rng = np.random.default_rng(1)
    ref = rng.random((2000, 3), np.float32)
    q = rng.random((50, 3), np.float32)
    want = oracle(q, ref)
    for prefer in (True, False):
        tree = build_kdtree(ref, prefer_native=prefer)
        idx, d2 = query_numpy(tree, q)
        # Tie-tolerant exactness: distances must equal the oracle's.
        d_or = np.sum((q - ref[want]) ** 2, axis=1)
        d_got = np.sum((q - ref[idx]) ** 2, axis=1)
        np.testing.assert_allclose(d_got, d_or, rtol=1e-6, atol=0)


def test_v9_native_vs_oracle():
    import tpu_knn

    rng = np.random.default_rng(2)
    ref = rng.random((5000, 3), np.float32)
    q = rng.random((200, 3), np.float32)
    got = tpu_knn.knn_callback(3, 200, 5000, q, ref, version="v9")
    np.testing.assert_array_equal(got, oracle(q, ref))


def test_v10_device_traversal_vs_oracle():
    rng = np.random.default_rng(3)
    ref = rng.random((3000, 3), np.float32)
    q = rng.random((64, 3), np.float32)
    tree = build_kdtree(ref)
    idx, d2 = DeviceKDTree(tree).query(q)
    np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))
    np.testing.assert_allclose(
        np.asarray(d2), np.sum((q - ref[np.asarray(idx)]) ** 2, axis=1), rtol=1e-6
    )


def test_v10_duplicates_tie_to_lowest_index():
    ref = np.ones((64, 3), np.float32)
    ref[10] = 0.25
    ref[40] = 0.25  # duplicate, higher index
    q = np.full((1, 3), 0.25, np.float32)
    tree = build_kdtree(ref)
    idx, d2 = DeviceKDTree(tree).query(q)
    assert int(idx[0]) == 10 and float(d2[0]) == 0.0


def test_v10_points_on_split_plane():
    """Equal-coordinate points across the splitting plane must be found
    (prune is strict >)."""
    ref = np.array([[0.5, 0.0], [0.5, 1.0], [0.5, 0.5], [0.1, 0.5], [0.9, 0.5]],
                   np.float32)
    q = np.array([[0.5, 0.55]], np.float32)
    tree = build_kdtree(ref)
    idx, _ = DeviceKDTree(tree).query(q)
    np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))


def test_k_guard_falls_back_to_oracle():
    import tpu_knn

    rng = np.random.default_rng(4)
    ref = rng.random((100, 20), np.float32)  # k=20 > 16
    q = rng.random((5, 20), np.float32)
    for v in ("v9", "v10"):
        got = tpu_knn.knn_callback(20, 5, 100, q, ref, version=v)
        np.testing.assert_array_equal(got, oracle(q, ref))


def test_v10_ta_shape():
    import tpu_knn

    rng = np.random.default_rng(5)
    ref = rng.random((65536, 3), np.float32)
    q = rng.random((128, 3), np.float32)
    got = tpu_knn.knn_callback(3, 128, 65536, q, ref, version="v10")
    want = oracle(q, ref)
    d_or = np.sum((q - ref[want]) ** 2, axis=1)
    d_got = np.sum((q - ref[got]) ** 2, axis=1)
    np.testing.assert_allclose(d_got, d_or, rtol=1e-6, atol=0)


def test_kdtree_save_load(tmp_path):
    rng = np.random.default_rng(6)
    ref = rng.random((512, 4), np.float32)
    tree = build_kdtree(ref)
    path = str(tmp_path / "tree.npz")
    tree.save(path)
    loaded = KDTree.load(path)
    np.testing.assert_array_equal(loaded.p, tree.p)
    np.testing.assert_array_equal(loaded.dim, tree.dim)
    q = rng.random((10, 4), np.float32)
    idx, _ = DeviceKDTree(loaded).query(q)
    np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))


def test_v10_never_selected_by_dispatch():
    """v10 decision (docs/PARITY.md): the device traversal is a capability
    demo — production dispatch must never reach it, and the kdtree serving
    index must prefer the native CPU query when available (it wins by ~3
    orders of magnitude; bench.py carries the committed evidence row)."""
    from tpu_knn import native
    from tpu_knn.engine.index import NNIndex
    from tpu_knn.engine.registry import PREFERENCE_ORDER

    assert "v10" not in PREFERENCE_ORDER
    assert "v9" not in PREFERENCE_ORDER

    if native.available():
        rng = np.random.default_rng(9)
        index = NNIndex(rng.random((4096, 3), np.float32), strategy="kdtree")
        assert index.use_native_query
        assert index.dev_tree is None


@pytest.mark.parametrize("data", ["tied_uniform", "constant_dim", "lattice",
                                  "duplicates", "all_constant"])
def test_native_vs_numpy_build_adversarial_variance(data):
    """Native and NumPy builds must be EQUIVALENT on data where the
    max-variance / median split heuristics tie (VERDICT round 1, item 9).
    std::nth_element and np.argpartition legally order tied elements
    differently, so the trees' arrays may differ; the equivalence contract
    is behavioral — both trees hold every point exactly once and return
    identical, oracle-exact answers with lowest-index tie-breaking."""
    from tpu_knn import native

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(11)
    n = 512
    if data == "tied_uniform":
        col = rng.random((n, 1), np.float32)
        ref = np.repeat(col, 4, axis=1)            # all dims identical
    elif data == "constant_dim":
        ref = rng.random((n, 3), np.float32)
        ref[:, 1] = 0.25                           # zero variance on dim 1
    elif data == "lattice":
        g = np.stack(np.meshgrid(np.arange(8), np.arange(8), np.arange(8)),
                     axis=-1).reshape(-1, 3).astype(np.float32)
        ref = g / 8.0                              # exactly equal variances
    elif data == "duplicates":
        base = rng.random((8, 4), np.float32)
        ref = np.repeat(base, n // 8, axis=0)      # massive duplication
    else:  # all_constant
        # EVERY real dim's sampled variance rounds negative (catastrophic
        # cancellation in sum2/used - mean^2), so a zero-padded dim's exact
        # 0.0 variance would win unless the scan is limited to real dims —
        # the packed build then stores dim[node] >= k and the native query
        # reads past the k-wide row (regression: kd_build_rec_t).
        ref = np.full((n, 3), 0.1, np.float32)
    ref = np.ascontiguousarray(ref, np.float32)
    nat = build_kdtree(ref, prefer_native=True)
    pyt = build_kdtree(ref, prefer_native=False)
    for tree in (nat, pyt):
        stored = np.sort(tree.p[tree.p >= 0])
        np.testing.assert_array_equal(stored, np.arange(ref.shape[0]))
    q = rng.random((32, ref.shape[1]), np.float32).astype(np.float32)
    q[:8] = ref[::2][:8]  # planted exact hits force tie pressure
    idx_nat, d_nat = query_numpy(nat, q)
    idx_py, d_py = query_numpy(pyt, q)
    want = oracle(q, ref)
    np.testing.assert_array_equal(idx_nat, want)
    np.testing.assert_array_equal(idx_py, want)
    np.testing.assert_array_equal(d_nat, d_py)

    # The native QUERY on the native tree must agree too.
    from tpu_knn import native as native_mod

    idx_nq, _ = native_mod.kdtree_query(q, ref, nat.p, nat.dim)
    np.testing.assert_array_equal(idx_nq, want)


def test_native_kdtree_topk():
    """Native CPU tree K-NN (tk_kdtree_query_topk): exact rows ascending
    by (d2, index), duplicate ties by lowest index, n<K tail filled."""
    from tpu_knn import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(60)
    r = rng.random((5000, 5), np.float32)
    q = rng.random((64, 5), np.float32)
    r[777] = r[33]                        # duplicate pair
    q[3] = r[33]
    p, dim = native.kdtree_build(r)
    idx, d2 = native.kdtree_query_topk(q, r, p, dim, 7)
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    want = np.array([np.lexsort((np.arange(5000), row))[:7] for row in D])
    np.testing.assert_array_equal(idx, want)
    assert idx[3, 0] == 33 and idx[3, 1] == 777 and d2[3, 1] == 0.0
    # n < K: tail is -1 / +inf
    r2 = r[:3]
    p2, dim2 = native.kdtree_build(r2)
    i2, dd2 = native.kdtree_query_topk(q[:2], r2, p2, dim2, 5)
    assert (i2[:, 3:] == -1).all() and np.isinf(dd2[:, 3:]).all()
    D2 = ((q[:2, None, :] - r2[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(i2[:, :3], np.argsort(D2, 1, kind="stable"))


def test_nnindex_kdtree_topk():
    from tpu_knn import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    from tpu_knn.engine.index import NNIndex

    rng = np.random.default_rng(61)
    r = rng.random((3000, 4), np.float32)
    q = rng.random((10, 4), np.float32)
    ix = NNIndex(r, strategy="kdtree")
    idx, d2 = ix.query(q, neighbors=5)
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    want = np.array([np.lexsort((np.arange(3000), row))[:5] for row in D])
    np.testing.assert_array_equal(idx, want)
    with pytest.raises(ValueError, match="neighbors"):
        ix.query(q, neighbors=0)


# ---- kdt2: the native leaf-bucketed serving tree ------------------------

def _native_or_skip():
    from tpu_knn import native

    if not native.available():
        pytest.skip("native lib unavailable")
    return native


@pytest.mark.parametrize("n,k", [(1, 3), (2, 1), (17, 2), (333, 3),
                                 (4096, 3), (2000, 16)])
def test_kdt2_matches_oracle(n, k):
    """kdt2 (sampled-pivot leaf-bucketed build, iterative traversal) is
    exact with v0's lowest-index tie rule, across leaf-boundary sizes."""
    native = _native_or_skip()
    rng = np.random.default_rng(n * 31 + k)
    ref = rng.random((n, k), np.float32)
    q = np.concatenate([rng.random((40, k), np.float32),
                        ref[: min(8, n)]])  # planted exact hits
    t = native.Kdt2Index(ref)
    idx, d2 = t.query(q)
    np.testing.assert_array_equal(idx, oracle(q, ref))


def test_kdt2_ties_lowest_index():
    """Exact duplicates anywhere in the set: kdt2 must report the LOWEST
    reference index among equal distances, like every other reducer."""
    native = _native_or_skip()
    rng = np.random.default_rng(5)
    base = rng.random((64, 3), np.float32)
    ref = np.repeat(base, 8, axis=0)         # 8 copies of each point
    perm = rng.permutation(len(ref))
    ref = ref[perm]                          # scatter duplicates
    q = base.copy()
    t = native.Kdt2Index(ref)
    idx, d2 = t.query(q)
    np.testing.assert_array_equal(idx, oracle(q, ref))
    np.testing.assert_allclose(d2, 0.0)


def test_kdt2_topk_matches_reference_tree():
    """kdt2 top-K equals the reference-format tree's top-K (both lex
    (d2, idx) ascending), including the n < K padded tail."""
    native = _native_or_skip()
    rng = np.random.default_rng(7)
    for n, k, K in [(500, 3, 8), (500, 3, 128), (50, 4, 70), (5, 2, 9)]:
        ref = rng.random((n, k), np.float32)
        q = rng.random((17, k), np.float32)
        t = native.Kdt2Index(ref)
        gi, gd = t.query_topk(q, min(K, 128))
        ri, rd = native.kdtree_query_topk(
            q, ref, *native.kdtree_build(ref), min(K, 128))
        np.testing.assert_array_equal(gi, ri)
        np.testing.assert_allclose(gd, rd)


def test_kdt2_adversarial_distributions():
    """Sampled pivots must stay exact (not merely balanced) on data that
    defeats the sampling: duplicates, constant dims, clusters."""
    native = _native_or_skip()
    rng = np.random.default_rng(13)
    cases = []
    ref = np.repeat(rng.random((16, 3), np.float32), 256, axis=0)
    cases.append(ref)                                    # mass duplication
    ref = rng.random((4096, 3), np.float32)
    ref[:, 0] = 0.5
    cases.append(ref)                                    # dead dimension
    centers = rng.random((4, 3), np.float32) * 100
    ref = (centers[rng.integers(0, 4, 4096)]
           + rng.normal(0, 1e-4, (4096, 3))).astype(np.float32)
    cases.append(ref)                                    # tight clusters
    for ref in cases:
        q = np.concatenate([rng.random((32, 3), np.float32), ref[:8]])
        t = native.Kdt2Index(np.ascontiguousarray(ref))
        idx, _ = t.query(q)
        np.testing.assert_array_equal(idx, oracle(q, np.ascontiguousarray(ref)))


def test_nnindex_kdtree_serves_from_kdt2_and_checkpoints():
    """NNIndex(kdtree): serving runs on kdt2; the reference-format tree
    materializes lazily for save(); load() restores the saved arrays
    byte-identically and still answers exactly."""
    from tpu_knn.engine.index import NNIndex

    native = _native_or_skip()
    rng = np.random.default_rng(17)
    ref = rng.random((3000, 3), np.float32)
    q = rng.random((32, 3), np.float32)
    ix = NNIndex(ref, strategy="kdtree")
    assert ix._kdt2 is not None and ix._tree is None  # lazy ref-format tree
    idx, _ = ix.query(q)
    np.testing.assert_array_equal(idx, oracle(q, ref))
    ti, _ = ix.query(q, neighbors=5)
    ri, _ = native.kdtree_query_topk(q, ref, *native.kdtree_build(ref), 5)
    np.testing.assert_array_equal(ti, ri)
    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "kd.npz")
    ix.save(path)
    assert ix._tree is not None                        # built for save
    back = NNIndex.load(path)
    np.testing.assert_array_equal(back.tree.p, ix.tree.p)
    bi, _ = back.query(q)
    np.testing.assert_array_equal(bi, idx)
