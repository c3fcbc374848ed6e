"""NNIndex metric="cosine"/"ip": similarity search as a monotone
reduction to the exact L2 engine.

Contract under test: selection is EXACT over the STORED (transformed)
points — cosine: argmax q.r/|q||r| == argmin L2 over unit vectors
(d2 = 2 - 2 cos); ip: argmax q.r == argmin L2 over the augmented points
(d2 = |q|2 + M2 - 2 q.r) — with v0's lowest-index tie rule riding
through unchanged. The expected values below are therefore computed
from the index's own stored points (np.asarray(ix.ref_dev)): the
transform's correctness is asserted separately (unit norms /
norm-equalizing augmentation), and the selection gate is exact index
equality, not a tolerance.
"""

import numpy as np
import pytest

from tpu_knn.engine.index import NNIndex
from tpu_knn.oracle import oracle_callback


def _stored(ix):
    return np.asarray(ix.ref_dev)


def _l2_expect(q_t, stored):
    m, k = q_t.shape
    return oracle_callback(k, m, stored.shape[0], q_t, stored)


def _gold_topk(q_t, stored, kk):
    d = ((q_t[:, None, :] - stored[None, :, :]) ** 2).sum(
        -1, dtype=np.float32)
    return np.argsort(d, 1, kind="stable")[:, :kk]


def _q_cos(ix, q):
    import jax.numpy as jnp

    return np.asarray(ix._transform_q(jnp.asarray(q)))


def test_cosine_transform_and_1nn():
    rng = np.random.default_rng(1)
    ref = (rng.random((20_000, 6), np.float32) - 0.3) * 5.0
    ix = NNIndex(ref, metric="cosine")
    stored = _stored(ix)
    # Transform correctness: unit norms, direction preserved.
    np.testing.assert_allclose((stored ** 2).sum(1), 1.0, rtol=1e-6)
    cross = np.linalg.norm(
        np.cross(stored[:100, :3], ref[:100, :3].astype(np.float32)), axis=1)
    assert (cross < 1e-4 * np.linalg.norm(ref[:100, :3], axis=1)).all()
    for m in (1, 64):
        q = (rng.random((m, 6), np.float32) - 0.3) * 2.0
        q_t = _q_cos(ix, q)
        idx, sim = ix.query(q)
        np.testing.assert_array_equal(np.asarray(idx),
                                      _l2_expect(q_t, stored))
        # Similarity = 1 - d2/2 over unit vectors: agrees with the dot.
        dots = (q_t * stored[np.asarray(idx)]).sum(1)
        np.testing.assert_allclose(np.asarray(sim), dots, atol=2e-6)
        assert float(np.asarray(sim).max()) <= 1.0 + 1e-6


def test_cosine_scale_invariance_and_tie():
    """v and 2v have identical direction; 2v normalizes BIT-identically
    (the norm doubles exactly), so they are an exact tie -> lowest
    index."""
    rng = np.random.default_rng(2)
    ref = rng.random((5_000, 4), np.float32) + 0.1
    ref[777] = ref[123] * 2.0
    q = rng.random((4, 4), np.float32) + 0.1
    q[1] = ref[123] * 3.0               # exactly aligned with the pair
    ix = NNIndex(ref, metric="cosine")
    stored = _stored(ix)
    assert (stored[123] == stored[777]).all()
    idx, sim = ix.query(q)
    np.testing.assert_array_equal(np.asarray(idx),
                                  _l2_expect(_q_cos(ix, q), stored))
    assert int(np.asarray(idx)[1]) == 123


@pytest.mark.parametrize("m,kk", [(1, 8), (64, 8)])
def test_cosine_topk(m, kk):
    rng = np.random.default_rng(3 + m)
    ref = rng.random((20_000, 6), np.float32) + 0.05
    ix = NNIndex(ref, metric="cosine")
    q = rng.random((m, 6), np.float32) + 0.05
    gi, gs = ix.query(q, neighbors=kk)
    q_t = _q_cos(ix, q)
    np.testing.assert_array_equal(np.asarray(gi),
                                  _gold_topk(q_t, _stored(ix), kk))
    s = np.asarray(gs)
    assert (np.diff(s, axis=1) <= 1e-7).all()   # similarity descending


def test_cosine_radius_is_min_similarity():
    rng = np.random.default_rng(4)
    ref = rng.random((8_000, 3), np.float32) + 0.1
    ix = NNIndex(ref, metric="cosine")
    q = rng.random((4, 3), np.float32) + 0.1
    s_min = 0.999
    idx, sim, cnt = ix.query_radius(q, s_min)
    stored = _stored(ix)
    q_t = _q_cos(ix, q)
    d2 = ((q_t[:, None, :] - stored[None, :, :]) ** 2).sum(
        -1, dtype=np.float32)
    thr = np.float32(np.sqrt(2.0 - 2.0 * s_min)) ** 2
    for r in range(4):
        want = np.nonzero(d2[r] <= thr)[0]
        got = np.asarray(idx)[r, : int(cnt[r])]
        np.testing.assert_array_equal(np.sort(got), want)
        assert (np.asarray(sim)[r, : int(cnt[r])] >= s_min - 1e-5).all()


def test_ip_transform_and_queries():
    rng = np.random.default_rng(5)
    ref = (rng.random((20_000, 6), np.float32) - 0.5) * 3.0
    ix = NNIndex(ref, metric="ip")
    stored = _stored(ix)
    assert stored.shape[1] == 7 and ix.k_user == 6
    # Augmentation equalizes norms at the build max (to f32 rounding).
    norms = (stored ** 2).sum(1)
    np.testing.assert_allclose(norms, ix._ip_m2, rtol=1e-5)
    for m, kk in ((1, None), (64, None), (64, 8)):
        q = (rng.random((m, 6), np.float32) - 0.5) * 2.0
        q_t = np.pad(q, ((0, 0), (0, 1)))
        if kk is None:
            idx, score = ix.query(q)
            np.testing.assert_array_equal(np.asarray(idx),
                                          _l2_expect(q_t, stored))
            want = (q * ref[np.asarray(idx)].astype(np.float32)).sum(1)
        else:
            idx, score = ix.query(q, neighbors=kk)
            np.testing.assert_array_equal(np.asarray(idx),
                                          _gold_topk(q_t, stored, kk))
            want = np.einsum("mk,mjk->mj", q,
                             ref[np.asarray(idx)].astype(np.float32))
            assert (np.diff(np.asarray(score), axis=1) <= 1e-5).all()
        # Returned scores are the exact f32 dot over the winners.
        np.testing.assert_allclose(np.asarray(score), want, rtol=1e-5,
                                   atol=1e-5)


def test_ip_planted_winner_beats_nearer_point():
    """MIPS is NOT 1-NN: a far point with a big norm can win. Plant one
    and check the index prefers it over the L2-nearest."""
    rng = np.random.default_rng(6)
    ref = rng.random((4_096, 4), np.float32)
    q = np.ones((1, 4), np.float32)
    ref[100] = q[0] * 1.001             # L2-nearest, ip = 4.004
    ref[200] = q[0] * 5.0               # far in L2, ip = 20
    ix = NNIndex(ref, metric="ip")
    idx, score = ix.query(q)
    assert int(np.asarray(idx)[0]) == 200
    l2 = NNIndex(ref)
    assert int(np.asarray(l2.query(q)[0])[0]) == 100


def test_metric_mutable_add_remove():
    rng = np.random.default_rng(7)
    ref = rng.random((3_000, 5), np.float32) + 0.1
    ix = NNIndex(ref, metric="cosine", mutable=True)
    v = rng.random((1, 5), np.float32) + 0.1
    ids = ix.add(v * 7.0)               # scale must not matter
    idx, sim = ix.query(v)
    assert int(np.asarray(idx)[0]) == ids[0]
    np.testing.assert_allclose(float(np.asarray(sim)[0]), 1.0, atol=1e-6)
    ix.remove(ids)
    assert int(np.asarray(ix.query(v)[0])[0]) != ids[0]
    with pytest.raises(ValueError, match="zero vector"):
        ix.add(np.zeros((1, 5), np.float32))
    ip = NNIndex(ref, metric="ip", mutable=True)
    with pytest.raises(ValueError, match="exceeds the build-time"):
        ip.add(np.full((1, 5), 10.0, np.float32))
    small = ip.add(ref[:1] * 0.5)       # under the max norm: fine
    assert small.size == 1


def test_metric_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(8)
    ref = rng.random((4_000, 5), np.float32) + 0.1
    q = rng.random((8, 5), np.float32) + 0.1
    for metric in ("cosine", "ip"):
        ix = NNIndex(ref, metric=metric)
        p = str(tmp_path / f"ix_{metric}.npz")
        ix.save(p)
        back = NNIndex.load(p)
        assert back.metric == metric and back.k_user == 5
        np.testing.assert_array_equal(_stored(back), _stored(ix))
        i0, s0 = ix.query(q, neighbors=4)
        i1, s1 = back.query(q, neighbors=4)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_metric_sharded():
    rng = np.random.default_rng(9)
    ref = (rng.random((16_384, 6), np.float32) - 0.4) * 2.0
    q = rng.random((16, 6), np.float32)
    for metric in ("cosine", "ip"):
        ix = NNIndex(ref, strategy="sharded", metric=metric)
        stored = np.asarray(ix.r_sharded)[: ix.n]
        q_t = (_q_cos(ix, q) if metric == "cosine"
               else np.pad(q, ((0, 0), (0, 1))))
        idx, _score = ix.query(q)
        np.testing.assert_array_equal(np.asarray(idx),
                                      _l2_expect(q_t, stored))
        gi, _gs = ix.query(q, neighbors=8)
        np.testing.assert_array_equal(np.asarray(gi),
                                      _gold_topk(q_t, stored, 8))


def test_metric_filtered_view():
    rng = np.random.default_rng(10)
    ref = rng.random((4_000, 5), np.float32) + 0.1
    ix = NNIndex(ref, metric="cosine")
    keep = rng.random(4_000) < 0.5
    view = ix.filtered_view(keep)
    q = rng.random((4, 5), np.float32) + 0.1
    idx, sim = view.query(q)
    stored = _stored(ix)
    q_t = _q_cos(ix, q)
    d2 = ((q_t[:, None, :] - stored[None, :, :]) ** 2).sum(
        -1, dtype=np.float32)
    d2[:, ~keep] = np.inf
    np.testing.assert_array_equal(np.asarray(idx), d2.argmin(1))


def test_metric_validation():
    ref = np.ones((256, 3), np.float32)
    with pytest.raises(ValueError, match="metric must be"):
        NNIndex(ref, metric="l1")
    with pytest.raises(ValueError, match="strategy='fused' or"):
        NNIndex(ref, strategy="kdtree", metric="cosine")
    with pytest.raises(ValueError, match="store='float32'"):
        NNIndex(ref, metric="cosine", store="bf16")
    z = ref.copy()
    z[7] = 0.0
    with pytest.raises(ValueError, match="zero vector"):
        NNIndex(z, metric="cosine")
    ip = NNIndex(ref, metric="ip")
    with pytest.raises(ValueError, match="radius"):
        ip.query_radius(np.ones((1, 3), np.float32), 1.0)
    cos = NNIndex(ref, metric="cosine")
    with pytest.raises(ValueError, match="minimum similarity"):
        cos.query_radius(np.ones((1, 3), np.float32), 2.0)
    with pytest.raises(ValueError, match="k=3"):
        cos.query(np.ones((1, 5), np.float32))
