"""NNIndex serving API: prepare once, query many, across strategies."""

import numpy as np
import pytest

from tpu_knn.engine.index import NNIndex
from tpu_knn.oracle import oracle_callback


def oracle(search, ref):
    m, k = search.shape
    return oracle_callback(k, m, ref.shape[0], search, ref)


@pytest.mark.parametrize("strategy", ["fused", "kdtree", "sharded", "projection"])
def test_strategies_match_oracle(strategy):
    rng = np.random.default_rng(0)
    ref = rng.random((20_000, 6), np.float32)
    index = NNIndex(ref, strategy=strategy)
    for m in (1, 7, 64):
        q = rng.random((m, 6), np.float32)
        idx, d2 = index.query(q)
        np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))
        np.testing.assert_allclose(
            np.asarray(d2), np.sum((q - ref[np.asarray(idx)]) ** 2, axis=1),
            rtol=1e-6)


def test_fused_index_reuses_prepared_layout():
    rng = np.random.default_rng(1)
    ref = rng.random((5_000, 3), np.float32)
    index = NNIndex(ref, strategy="fused")
    q1 = rng.random((4, 3), np.float32)
    q2 = rng.random((4, 3), np.float32)
    i1, _ = index.query(q1)
    i2, _ = index.query(q2)
    np.testing.assert_array_equal(np.asarray(i1), oracle(q1, ref))
    np.testing.assert_array_equal(np.asarray(i2), oracle(q2, ref))


def test_index_topk_beyond_64_multi_round():
    """NNIndex.query(neighbors>64) rides the multi-round seeded engine
    off the prepared operand (and the native tree path at kdtree) —
    exact vs the oracle with a planted duplicate pair."""
    rng = np.random.default_rng(41)
    ref = rng.random((20_000, 6), np.float32)
    q = rng.random((12, 6), np.float32)
    ref[17] = ref[9_001] = q[3]
    D = ((q[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    gold = np.argsort(D, 1, kind="stable")[:, :100]
    for strategy in ("fused", "kdtree"):
        ix = NNIndex(ref, strategy=strategy)
        gi, gd = ix.query(q, neighbors=100)
        np.testing.assert_array_equal(np.asarray(gi), gold)
        assert list(np.asarray(gi)[3, :2]) == [17, 9_001]


def test_kdtree_index_high_k_uses_cpu_query():
    rng = np.random.default_rng(2)
    ref = rng.random((3_000, 12), np.float32)  # k=12 > 8 -> CPU query
    index = NNIndex(ref, strategy="kdtree")
    assert index.dev_tree is None
    q = rng.random((20, 12), np.float32)
    idx, _ = index.query(q)
    np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))


def test_ragged_n_fused_index():
    rng = np.random.default_rng(3)
    ref = rng.random((4_099, 5), np.float32)
    index = NNIndex(ref, strategy="fused")
    q = rng.random((9, 5), np.float32)
    idx, _ = index.query(q)
    np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))


def test_auto_strategy_probes_and_serves_correctly():
    """strategy="auto" (v11 wired into production serving, VERDICT round 1
    item 5): the build-time probe measures the certification rate on
    uniform data (should be high at k=3) and batch routing picks the
    projection pipeline exactly where its cost model wins."""
    from tpu_knn.kernels import projection as proj_mod

    rng = np.random.default_rng(3)
    ref = rng.random((20_000, 3), np.float32)
    index = NNIndex(ref, strategy="auto")
    assert index.cert_rate >= 0.9, index.cert_rate
    assert index.proj_index is not None

    # Below the niche's n floor the cost model keeps batches on fused.
    q = rng.random((8, 3), np.float32)
    idx, _ = index.query(q)
    assert index.last_strategy == "fused"
    np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))

    # In-niche shapes route to the projection pipeline (checked against
    # the cost model directly; n=2^20 on the interpreted CPU backend is
    # too slow to run here — bench.py carries the on-TPU evidence).
    assert proj_mod.projection_wins(3, 16, 1 << 24)
    assert proj_mod.projection_wins(3, 1, 1 << 20)
    assert not proj_mod.projection_wins(16, 16, 1 << 24)   # bound useless
    assert not proj_mod.projection_wins(3, 1024, 1 << 24)  # batch too big


def test_auto_strategy_high_k_disables_projection():
    rng = np.random.default_rng(4)
    ref = rng.random((5_000, 16), np.float32)
    index = NNIndex(ref, strategy="auto")
    assert index.proj_index is None
    q = rng.random((4, 16), np.float32)
    idx, _ = index.query(q)
    assert index.last_strategy == "fused"
    np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))


def test_auto_strategy_projection_route_small_n():
    """Drive the projection route itself (cost model overridden so the
    interpreted backend can afford it): answers must match the oracle and
    the cond-fallback pipeline must be the path taken."""
    from tpu_knn.kernels import projection as proj_mod

    rng = np.random.default_rng(5)
    ref = rng.random((50_000, 3), np.float32)
    index = NNIndex(ref, strategy="auto")
    assert index.proj_index is not None
    orig = proj_mod.projection_wins
    proj_mod.projection_wins = lambda k, m, n: m <= 64
    try:
        q = rng.random((16, 3), np.float32)
        idx, d2 = index.query(q)
        assert index.last_strategy == "projection"
        np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))
        np.testing.assert_allclose(
            np.asarray(d2), np.sum((q - ref[np.asarray(idx)]) ** 2, axis=1),
            rtol=1e-6)
    finally:
        proj_mod.projection_wins = orig


def test_query_m_bucketing_single_compile():
    """Serving pads batches to power-of-two buckets: a varying-m request
    stream must reuse one compiled pipeline per bucket, and padded rows
    must never leak into results."""
    from tpu_knn.engine.index import _build_prepared_query

    rng = np.random.default_rng(12)
    ref = rng.random((10_000, 5), np.float32)
    index = NNIndex(ref, strategy="fused")
    misses0 = _build_prepared_query.cache_info().misses
    for m in (9, 11, 13, 16):   # all bucket to 16
        q = rng.random((m, 5), np.float32)
        idx, d2 = index.query(q)
        assert idx.shape == (m,) and d2.shape == (m,)
        np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))
    assert _build_prepared_query.cache_info().misses == misses0 + 1

    # Opt-out gives exact-m compiles.
    index.bucket_m = False
    q = rng.random((9, 5), np.float32)
    idx, _ = index.query(q)
    np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))


# ---- mutable (dynamic-update) index ----

def _brute(q, r):
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    return np.argmin(d2, axis=1)


def test_mutable_add_query():
    rng = np.random.default_rng(30)
    r = rng.random((500, 4), np.float32)
    ix = NNIndex(r, mutable=True)
    assert ix.n_live == 500
    q = rng.random((6, 4), np.float32)
    idx, _ = ix.query(q)
    np.testing.assert_array_equal(np.asarray(idx), _brute(q, r))
    # add points ON the queries: they must become the new winners with
    # the ids add() returned
    ids = ix.add(q[:3])
    np.testing.assert_array_equal(ids, [500, 501, 502])
    assert ix.n_live == 503
    idx, d2 = ix.query(q)
    np.testing.assert_array_equal(np.asarray(idx)[:3], ids)
    np.testing.assert_array_equal(np.asarray(d2)[:3], np.zeros(3, np.float32))
    np.testing.assert_array_equal(np.asarray(idx)[3:], _brute(q[3:], r))


def test_mutable_remove_and_reinstate_order():
    rng = np.random.default_rng(31)
    r = rng.random((300, 3), np.float32)
    q = rng.random((4, 3), np.float32)
    ix = NNIndex(r, mutable=True)
    win = _brute(q, r)
    ix.remove(np.unique(win))
    idx, d2 = ix.query(q)
    # removed winners never come back; result = brute force on the rest
    live = np.setdiff1d(np.arange(300), np.unique(win))
    want = live[_brute(q, r[live])]
    np.testing.assert_array_equal(np.asarray(idx), want)
    # removing twice is an error; out-of-range is an error
    with pytest.raises(ValueError, match="already removed"):
        ix.remove(win[0])
    with pytest.raises(ValueError, match="out of range"):
        ix.remove(10_000)


def test_mutable_growth_and_ids_stable():
    rng = np.random.default_rng(32)
    r = rng.random((100, 5), np.float32)
    ix = NNIndex(r, mutable=True)
    cap0 = ix.capacity
    pts = rng.random((cap0, 5), np.float32) + 3.0   # force growth
    ids = ix.add(pts)
    assert ix.capacity > cap0
    assert ids[0] == 100 and ids[-1] == 100 + cap0 - 1
    # a query equal to an early added point still reports its stable id
    q = pts[:2]
    idx, d2 = ix.query(q)
    np.testing.assert_array_equal(np.asarray(idx), ids[:2])
    np.testing.assert_array_equal(np.asarray(d2), np.zeros(2, np.float32))


def test_mutable_topk_skips_removed():
    rng = np.random.default_rng(33)
    r = rng.random((2000, 4), np.float32)
    q = rng.random((2, 4), np.float32)
    ix = NNIndex(r, mutable=True)
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    top = np.argsort(d2[0], kind="stable")[:3]
    ix.remove(top)                       # kill query 0's whole top-3
    gi, gd = ix.query(q, neighbors=4)
    live = np.setdiff1d(np.arange(2000), top)
    want0 = live[np.lexsort((live, d2[0, live]))[:4]]
    np.testing.assert_array_equal(np.asarray(gi)[0], want0)


def test_mutable_compact_remaps_ids():
    rng = np.random.default_rng(34)
    r = rng.random((64, 3), np.float32)
    ix = NNIndex(r, mutable=True)
    ix.remove(np.arange(0, 64, 2))       # drop evens
    mapping = ix.compact()
    assert mapping.shape == (64,)
    assert (mapping[0::2] == -1).all()
    np.testing.assert_array_equal(mapping[1::2], np.arange(32))
    assert ix.n_live == 32
    q = r[1:2]                           # old id 1 -> new id 0
    idx, d2 = ix.query(q)
    assert np.asarray(idx)[0] == 0 and np.asarray(d2)[0] == 0.0


def test_mutable_guards():
    rng = np.random.default_rng(35)
    r = rng.random((50, 3), np.float32)
    with pytest.raises(ValueError, match="mutable"):
        NNIndex(r, strategy="kdtree", mutable=True)
    ix = NNIndex(r, strategy="fused")
    with pytest.raises(ValueError, match="mutable"):
        ix.add(r[:2])
    ix = NNIndex(r, mutable=True)
    ix.remove(np.arange(50))
    with pytest.raises(ValueError, match="no live points"):
        ix.query(r[:1])


# ---- checkpoint/resume (NNIndex.save/load) ----

def test_save_load_fused(tmp_path):
    rng = np.random.default_rng(40)
    r = rng.random((4000, 6), np.float32)
    q = rng.random((5, 6), np.float32)
    ix = NNIndex(r, strategy="fused")
    want, _ = ix.query(q)
    p = str(tmp_path / "ix.npz")
    ix.save(p)
    back = NNIndex.load(p)
    got, _ = back.query(q)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_save_load_mutable_preserves_ids(tmp_path):
    rng = np.random.default_rng(41)
    r = rng.random((300, 4), np.float32)
    ix = NNIndex(r, mutable=True)
    ids = ix.add(rng.random((10, 4), np.float32) - 2.0)
    ix.remove(ids[:5])
    p = str(tmp_path / "mut.npz")
    ix.save(p)
    back = NNIndex.load(p)
    assert back.mutable and back.n_live == ix.n_live
    q = np.asarray(ix.ref_dev[ids[5]])[None]   # a live added point
    idx, d2 = back.query(q)
    assert np.asarray(idx)[0] == ids[5] and np.asarray(d2)[0] == 0.0
    # removed slots stay dead after restore
    import jax
    gi, _ = back.query(rng.random((3, 4), np.float32), neighbors=8)
    assert not np.isin(np.asarray(jax.device_get(gi)), ids[:5]).any()
    # ids keep flowing from the restored watermark
    new = back.add(rng.random((2, 4), np.float32))
    np.testing.assert_array_equal(new, [310, 311])


def test_save_load_kdtree_no_rebuild(tmp_path):
    rng = np.random.default_rng(42)
    r = rng.random((5000, 3), np.float32)
    q = rng.random((16, 3), np.float32)
    ix = NNIndex(r, strategy="kdtree")
    want, _ = ix.query(q)
    p = str(tmp_path / "kd.npz")
    ix.save(p)
    back = NNIndex.load(p)
    np.testing.assert_array_equal(back.tree.p, ix.tree.p)  # same build
    got, _ = back.query(q)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_save_sharded_roundtrip(tmp_path):
    """r5: sharded save/load persists payload + mesh spec (historically
    rejected — VERDICT r4 item 2); queries agree after the rebind."""
    rng = np.random.default_rng(43)
    r = rng.random((4096, 3), np.float32)
    q = rng.random((4, 3), np.float32)
    ix = NNIndex(r, strategy="sharded")
    p = str(tmp_path / "sh.npz")
    ix.save(p)
    lx = NNIndex.load(p)
    assert lx.strategy == "sharded"
    np.testing.assert_array_equal(np.asarray(lx.query(q)[0]),
                                  np.asarray(ix.query(q)[0]))


def test_mutable_single_query_smallm_path():
    """m=1 routes through the diff-form small-batch kernel; PAD sentinel
    slots must self-exclude there too (capacity semantics)."""
    rng = np.random.default_rng(36)
    r = rng.random((600, 6), np.float32)
    q = rng.random((1, 6), np.float32)
    ix = NNIndex(r, mutable=True)
    win = int(_brute(q, r)[0])
    ix.remove(win)
    idx, d2 = ix.query(q)
    live = np.setdiff1d(np.arange(600), [win])
    assert np.asarray(idx)[0] == live[_brute(q, r[live])[0]]
    ids = ix.add(q)          # exact match added -> wins at d2=0
    idx, d2 = ix.query(q)
    assert np.asarray(idx)[0] == ids[0] and np.asarray(d2)[0] == 0.0


def test_index_accepts_array_likes():
    """Review regression: non-ndarray array-likes (lists) must be coerced
    for every strategy, not just kdtree/sharded."""
    pts = [[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]]
    ix = NNIndex(pts)
    idx, d2 = ix.query(np.array([[1.9, 3.1]], np.float32))
    assert int(np.asarray(idx)[0]) == 1


def test_query_radius():
    rng = np.random.default_rng(91)
    r = rng.random((2000, 5), np.float32)
    q = rng.random((4, 5), np.float32)
    ix = NNIndex(r)
    idx, d2, cnt = ix.query_radius(q, 0.35, 8)
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for i in range(4):
        true = np.nonzero(D[i] <= 0.35 ** 2)[0]
        want = true[np.lexsort((true, D[i, true]))][:8]
        got = idx[i][idx[i] >= 0]
        assert cnt[i] == len(got)
        np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="radius"):
        ix.query_radius(q, -0.1, 4)


def test_auto_projection_feedback_demotes_on_adversarial_serving():
    """VERDICT r2 item 5: the build probe is open-loop; a serving
    distribution that certifies poorly (queries displaced ORTHOGONALLY
    to the projection axis: they project into the mass but live far from
    it, so the window boundary certificate fails) must (a) still answer
    exactly via the per-batch fallback, and (b) demote the projection
    route once the realized rate collapses."""
    from tpu_knn.kernels import projection as proj_mod

    rng = np.random.default_rng(6)
    ref = rng.random((30_000, 3), np.float32)
    index = NNIndex(ref, strategy="auto")
    assert index.proj_index is not None
    axis = int(np.asarray(index.proj_index[2]))
    orig = proj_mod.projection_wins
    proj_mod.projection_wins = lambda k, m, n: m <= 64
    try:
        q = rng.random((8, 3), np.float32)
        for a in range(3):
            if a != axis:
                q[:, a] += 40.0   # far from the mass, in-range projection
        for _ in range(index.PROJ_FEEDBACK_PERIOD):
            assert index.proj_index is not None   # not yet evaluated
            idx, d2 = index.query(q)
            assert index.last_strategy == "projection"
            np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))
        # Period reached: realized rate ~0 -> demoted.
        assert index.realized_cert_rate < index.PROJ_REALIZED_MIN
        assert index.proj_demoted and index.proj_index is None
        idx, _ = index.query(q)
        assert index.last_strategy == "fused"
        np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))
    finally:
        proj_mod.projection_wins = orig


def test_auto_projection_feedback_keeps_good_distribution():
    """In-distribution serving must NOT demote: the realized rate stays
    at 1 and the projection route survives the feedback checkpoint."""
    from tpu_knn.kernels import projection as proj_mod

    rng = np.random.default_rng(7)
    ref = rng.random((30_000, 3), np.float32)
    index = NNIndex(ref, strategy="auto")
    assert index.proj_index is not None
    orig = proj_mod.projection_wins
    proj_mod.projection_wins = lambda k, m, n: m <= 64
    try:
        for _ in range(index.PROJ_FEEDBACK_PERIOD):
            q = rng.random((8, 3), np.float32)
            idx, _ = index.query(q)
            assert index.last_strategy == "projection"
            np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))
        assert index.realized_cert_rate >= index.PROJ_REALIZED_MIN
        assert not index.proj_demoted and index.proj_index is not None
    finally:
        proj_mod.projection_wins = orig


def test_auto_projection_feedback_rate_is_per_window():
    """Review r3: the demotion rate must be per-feedback-window, not
    lifetime-cumulative — after ANY number of well-certifying windows, a
    distribution shift to uncertifiable queries must demote within ONE
    window, not after the bad batches outnumber the good history."""
    from tpu_knn.kernels import projection as proj_mod

    rng = np.random.default_rng(8)
    ref = rng.random((30_000, 3), np.float32)
    index = NNIndex(ref, strategy="auto")
    assert index.proj_index is not None
    axis = int(np.asarray(index.proj_index[2]))
    orig = proj_mod.projection_wins
    proj_mod.projection_wins = lambda k, m, n: m <= 64
    try:
        # Three full windows of in-distribution serving: rate 1.0 history.
        for _ in range(3 * index.PROJ_FEEDBACK_PERIOD):
            index.query(rng.random((8, 3), np.float32))
        assert not index.proj_demoted
        # Shift: orthogonally displaced queries certify ~never. Under the
        # old cumulative rule the 3-window good history (rate 3/4 after
        # one bad window) would keep the route alive for 2+ more windows.
        q = rng.random((8, 3), np.float32)
        for a in range(3):
            if a != axis:
                q[:, a] += 40.0
        for _ in range(index.PROJ_FEEDBACK_PERIOD):
            idx, _ = index.query(q)
            np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))
        assert index.proj_demoted and index.proj_index is None
        assert index.realized_cert_rate < index.PROJ_REALIZED_MIN
    finally:
        proj_mod.projection_wins = orig


def test_auto_adversarial_scales_and_identical_projections():
    """Adversarial fuzz for the auto route (VERDICT r2 item 5): queries
    at out-of-range coordinate scale and reference sets with identical
    projections must stay exact regardless of routing decisions."""
    rng = np.random.default_rng(8)
    # identical projection values: zero variance on every axis slice
    ref = np.ones((4_000, 3), np.float32)
    ref[:, 0] = 0.5   # constant everywhere: degenerate projection
    index = NNIndex(ref, strategy="auto")
    q = rng.random((4, 3), np.float32) * 3.0
    idx, d2 = index.query(q)
    np.testing.assert_array_equal(np.asarray(idx), oracle(q, ref))
    # out-of-range scale: queries at 1000x the reference scale
    ref2 = rng.random((6_000, 3), np.float32)
    index2 = NNIndex(ref2, strategy="auto")
    q2 = (rng.random((8, 3), np.float32) * 1000.0).astype(np.float32)
    idx2, _ = index2.query(q2)
    np.testing.assert_array_equal(np.asarray(idx2), oracle(q2, ref2))


def test_filtered_view_exact_and_original_ids():
    """filtered_view: exact filtered search over the kept subset with
    ORIGINAL index positions, through 1-NN, top-K, and radius."""
    rng = np.random.default_rng(9)
    ref = rng.random((5000, 4)).astype(np.float32)
    q = rng.random((12, 4)).astype(np.float32)
    keep = rng.random(5000) < 0.3
    keep[:10] = False            # ensure some low ids excluded
    ix = NNIndex(ref)
    view = ix.filtered_view(keep)
    assert view.n_live == int(keep.sum())
    D = ((q[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    Dm = np.where(keep[None, :], D, np.inf)
    # 1-NN
    gi, gd = view.query(q)
    np.testing.assert_array_equal(np.asarray(gi), np.argmin(Dm, axis=1))
    assert np.all(keep[np.asarray(gi)])
    # top-K (both sweep and batch routes exercised by bucketing)
    gk, _ = view.query(q, neighbors=5)
    np.testing.assert_array_equal(
        np.asarray(gk), np.argsort(Dm, axis=1, kind="stable")[:, :5])
    # radius (escalating)
    ri, rd, rc = view.query_radius(q, 0.3)
    np.testing.assert_array_equal(np.asarray(rc), (Dm <= 0.09).sum(1))
    # the parent is untouched
    pi, _ = ix.query(q)
    np.testing.assert_array_equal(np.asarray(pi), np.argmin(D, axis=1))


def test_filtered_view_never_scans_unmasked_aos():
    """Regression (r4): filtered views share the parent's UNMASKED AoS
    array — every route that scans ref_dev directly (dense exact at
    small n, the zero-prep AoS 1-NN at m=1 k<8, the AoS top-K at m=1)
    must be gated off for views or excluded points leak back. Each case
    plants the globally-nearest point OUTSIDE the kept set."""
    rng = np.random.default_rng(13)
    # dense regime: n <= 4096 and m > 4
    ref = rng.random((500, 3)).astype(np.float32)
    q = rng.random((8, 3)).astype(np.float32)
    ref[123] = q[0]                      # exact hit, excluded below
    keep = np.ones(500, bool)
    keep[123] = False
    view = NNIndex(ref).filtered_view(keep)
    gi, gd = view.query(q)
    assert int(gi[0]) != 123 and float(gd[0]) > 0.0
    D = np.where(keep[None, :],
                 ((q[:, None, :] - ref[None, :, :]) ** 2).sum(-1), np.inf)
    np.testing.assert_array_equal(np.asarray(gi), np.argmin(D, axis=1))
    # m=1, k<8 (AoS 1-NN regime) and m=1 top-K (AoS cell regime)
    gi1, gd1 = view.query(q[:1])
    assert int(gi1[0]) == int(np.argmin(D[0]))
    gk, gkd = view.query(q[:1], neighbors=3)
    np.testing.assert_array_equal(
        np.asarray(gk)[0], np.argsort(D[0], kind="stable")[:3])
    assert float(gkd[0, 0]) > 0.0
    # radius through the same gate
    ri, rd, rc = view.query_radius(q[:1], 0.05)
    assert 123 not in set(np.asarray(ri)[0].tolist())


def test_filtered_view_validation():
    rng = np.random.default_rng(10)
    ref = rng.random((400, 3)).astype(np.float32)
    ix = NNIndex(ref)
    with pytest.raises(ValueError, match="keep"):
        ix.filtered_view(np.ones(399, bool))
    with pytest.raises(ValueError, match="no points"):
        ix.filtered_view(np.zeros(400, bool))
    view = ix.filtered_view(np.arange(400) % 2 == 0)
    with pytest.raises(ValueError, match="ephemeral"):
        view.save("/tmp/view.npz")
    mu = NNIndex(ref, mutable=True)
    with pytest.raises(ValueError, match="mutable"):
        mu.filtered_view(np.ones(400, bool))
    sh = NNIndex(ref, strategy="kdtree")
    with pytest.raises(ValueError, match="fused/auto/sharded"):
        sh.filtered_view(np.ones(400, bool))
    # neighbors beyond the kept count must raise on the VIEW's count
    small = ix.filtered_view(np.arange(400) < 3)
    with pytest.raises(ValueError, match="neighbors"):
        small.query(rng.random((2, 3)).astype(np.float32), neighbors=4)
