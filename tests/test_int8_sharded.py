"""Sharded int8 grid storage: the capacity tier times the slice.

Contract (same as store="int8" single-chip, tests/test_int8_store.py):
exact 1-NN/top-K over the STORED (quantized) points — selection, order,
and ties are grid-exact, d2 rescales by s^2. Gates are index equality
against the v0 oracle run in grid space over the upcast grid, and lex
(d2, index) golden top-K. The mesh is the virtual 8-device CPU mesh
(conftest), the honest analog of the reference v8's adapt-to-device-
count testing (SURVEY.md §4).
"""

import numpy as np
import pytest

from tpu_knn.distributed.sharded import default_mesh
from tpu_knn.engine.index import NNIndex
from tpu_knn.oracle import oracle_callback


def _grid(ix):
    g = np.asarray(ix.r_sharded)[: ix.n]
    assert g.dtype == np.int8
    return g.astype(np.float32)


def _q_grid(ix, q):
    return ((q.astype(np.float32) - ix._i8_zero.astype(np.float32))
            * np.float32(ix._i8_inv_s)).astype(np.float32)


def _oracle(ix, q):
    g = _grid(ix)
    qg = _q_grid(ix, q)
    m, k = qg.shape
    return oracle_callback(k, m, g.shape[0], qg, g)


def _gold_topk(ix, q, kk):
    g = _grid(ix)
    qg = _q_grid(ix, q)
    d = ((qg[:, None, :] - g[None, :, :]) ** 2).sum(-1, dtype=np.float32)
    return np.array([np.lexsort((np.arange(g.shape[0]), row))[:kk]
                     for row in d])


@pytest.mark.parametrize("k", [3, 16])
@pytest.mark.parametrize("m", [1, 3, 32])
def test_sharded_int8_matches_grid_oracle(k, m):
    """Both regimes (m <= 4: masked AoS scan off the int8 shard; batch:
    per-shard upcast + fused pipeline) match the grid-space oracle."""
    rng = np.random.default_rng(0)
    ref = rng.random((20_000, k), np.float32)
    ix = NNIndex(ref, store="int8", strategy="sharded",
                 mesh=default_mesh(dp=1, sp=8))
    q = rng.random((m, k), np.float32)
    idx, d2 = ix.query(q)
    np.testing.assert_array_equal(np.asarray(idx), _oracle(ix, q))
    # d2 is grid d2 * s^2 (exact integers in grid space).
    g, qg = _grid(ix), _q_grid(ix, q)
    want = ((qg - g[np.asarray(idx)]) ** 2).sum(-1, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(d2),
                               want * np.float32(ix._i8_s2), rtol=1e-6)


def test_sharded_int8_matches_single_chip():
    """The sharded routes must agree with the single-chip int8 index on
    the same data (identical embed: both derive zero/scale from the same
    exact f32 min/max)."""
    rng = np.random.default_rng(1)
    ref = rng.random((10_000, 8), np.float32)
    ix_s = NNIndex(ref, store="int8", strategy="sharded",
                   mesh=default_mesh(dp=1, sp=8))
    ix_f = NNIndex(ref, store="int8")
    assert ix_s._i8_s2 == ix_f._i8_s2
    np.testing.assert_array_equal(ix_s._i8_zero, ix_f._i8_zero)
    for m in (1, 4, 16):
        q = rng.random((m, 8), np.float32)
        i_s, d_s = ix_s.query(q)
        i_f, d_f = ix_f.query(q)
        np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_f))
        np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_f),
                                   rtol=1e-6)


def test_sharded_int8_tie_across_shards_lowest_index():
    """Duplicate grid points planted in different shards must resolve to
    the LOWEST global index (v0's tie rule through the topk_allreduce/
    min_index_allreduce merges)."""
    rng = np.random.default_rng(2)
    n = 2048
    ref = rng.random((n, 4), np.float32)
    dup = ref[100].copy()
    for pos in (700, 1300, 1900):   # shards 2, 5, 7 of 8 x 256
        ref[pos] = dup
    ix = NNIndex(ref, store="int8", strategy="sharded",
                 mesh=default_mesh(dp=1, sp=8))
    q = dup[None, :] + 1e-5
    idx, _ = ix.query(q)
    assert int(np.asarray(idx)[0]) == 100
    ti, _ = ix.query(q, neighbors=4)
    assert list(np.asarray(ti)[0]) == sorted(np.asarray(ti)[0].tolist())
    assert set(np.asarray(ti)[0][:4]) >= {100, 700, 1300}


@pytest.mark.parametrize("n", [1000, 5, 130])
def test_sharded_int8_ragged_and_tiny_n(n):
    """Ragged n across shards and n smaller than one shard's width: pad
    rows are positionally masked (an int8 pad value is a legal point —
    the mask, not a sentinel, excludes them)."""
    rng = np.random.default_rng(3)
    ref = rng.random((n, 3), np.float32)
    ix = NNIndex(ref, store="int8", strategy="sharded",
                 mesh=default_mesh(dp=1, sp=8))
    q = rng.random((3, 3), np.float32)
    idx, _ = ix.query(q)
    got = np.asarray(idx)
    assert (got >= 0).all() and (got < n).all()
    np.testing.assert_array_equal(got, _oracle(ix, q))


@pytest.mark.parametrize("m,kk", [(1, 8), (3, 16), (32, 8)])
def test_sharded_int8_topk(m, kk):
    """Top-K through both per-shard engines (masked AoS cell engine at
    m <= 4; upcast + batch engine beyond), merged by topk_allreduce."""
    rng = np.random.default_rng(4)
    ref = rng.random((6_000, 6), np.float32)
    ix = NNIndex(ref, store="int8", strategy="sharded",
                 mesh=default_mesh(dp=1, sp=8))
    q = rng.random((m, 6), np.float32)
    idx, d2 = ix.query(q, neighbors=kk)
    np.testing.assert_array_equal(np.asarray(idx), _gold_topk(ix, q, kk))
    assert (np.diff(np.asarray(d2), axis=1) >= 0).all()


def test_sharded_int8_dp2_mesh():
    rng = np.random.default_rng(5)
    ref = rng.random((4_000, 5), np.float32)
    ix = NNIndex(ref, store="int8", strategy="sharded",
                 mesh=default_mesh(dp=2, sp=4))
    q = rng.random((6, 5), np.float32)   # m <= 4*dp: scan regime
    np.testing.assert_array_equal(np.asarray(ix.query(q)[0]),
                                  _oracle(ix, q))
    np.testing.assert_array_equal(np.asarray(ix.query(q, neighbors=3)[0]),
                                  _gold_topk(ix, q, 3))
    qb = rng.random((32, 5), np.float32)  # batch regime under dp=2
    np.testing.assert_array_equal(np.asarray(ix.query(qb)[0]),
                                  _oracle(ix, qb))
    np.testing.assert_array_equal(
        np.asarray(ix.query(qb, neighbors=6)[0]), _gold_topk(ix, qb, 6))


def test_sharded_int8_from_grid():
    """from_int8_grid(strategy='sharded'): restore/capacity path — same
    answers as the fused grid index built from the same state."""
    rng = np.random.default_rng(6)
    grid = rng.integers(-127, 128, size=(3_000, 4), dtype=np.int8)
    zero = rng.random(4).astype(np.float32)
    ix_s = NNIndex.from_int8_grid(grid, zero, 0.01, strategy="sharded",
                                  mesh=default_mesh(dp=1, sp=8))
    ix_f = NNIndex.from_int8_grid(grid, zero, 0.01)
    q = rng.random((4, 4), np.float32)
    np.testing.assert_array_equal(np.asarray(ix_s.query(q)[0]),
                                  np.asarray(ix_f.query(q)[0]))
    np.testing.assert_array_equal(
        np.asarray(ix_s.query(q, neighbors=5)[0]),
        np.asarray(ix_f.query(q, neighbors=5)[0]))


def test_sharded_int8_query_radius():
    """Radius queries ride the shared escalating loop over the sharded
    grid-space top-K; thresholds are USER units (d2 rescaled on exit)."""
    rng = np.random.default_rng(8)
    ref = rng.random((3_000, 3), np.float32)
    ix = NNIndex(ref, store="int8", strategy="sharded",
                 mesh=default_mesh(dp=1, sp=8))
    q = rng.random((4, 3), np.float32)
    radius = 0.18
    idx, d2, cnt = ix.query_radius(q, radius)
    idx, d2, cnt = np.asarray(idx), np.asarray(d2), np.asarray(cnt)
    g = _grid(ix)
    qg = _q_grid(ix, q)
    D = ((qg[:, None, :] - g[None, :, :]) ** 2).sum(-1,
                                                    dtype=np.float32)
    D = D * np.float32(ix._i8_s2)     # user units, the engine's compute
    for i in range(4):
        want = set(np.nonzero(np.sqrt(D[i]) <= radius)[0].tolist())
        got = set(idx[i, : cnt[i]].tolist())
        assert got == want, (i, got ^ want)
        assert (idx[i, cnt[i]:] == -1).all()


def test_sharded_int8_k_beyond_shard_width():
    """review r11: neighbors within the documented min(n, 512) cap must
    be served even when it exceeds the 128-row per-shard width (each
    shard contributes its clamped local list; a truncated-at-n_local
    list already holds every local point, so the merge stays exact)."""
    rng = np.random.default_rng(9)
    ref = rng.random((1_000, 4), np.float32)
    ix = NNIndex(ref, store="int8", strategy="sharded",
                 mesh=default_mesh(dp=1, sp=8))
    assert ix._n_local == 128
    q = rng.random((3, 4), np.float32)
    for kk in (129, 200, 512):
        idx, d2 = ix.query(q, neighbors=kk)
        np.testing.assert_array_equal(np.asarray(idx),
                                      _gold_topk(ix, q, kk))
        assert (np.diff(np.asarray(d2), axis=1) >= 0).all()
    # query_radius escalation crossing the shard width (reproduced the
    # r11 crash: cap doubling 128 -> 256 raised mid-escalation).
    idx, d2, cnt = ix.query_radius(q, 0.55)
    g, qg = _grid(ix), _q_grid(ix, q)
    D = ((qg[:, None, :] - g[None, :, :]) ** 2).sum(-1, dtype=np.float32)
    D = D * np.float32(ix._i8_s2)
    idx, cnt = np.asarray(idx), np.asarray(cnt)
    for i in range(3):
        want = set(np.nonzero(np.sqrt(D[i]) <= 0.55)[0].tolist())
        assert len(want) > 128   # the regression's trigger regime
        assert set(idx[i, : cnt[i]].tolist()) == want


def test_sharded_int8_device_input_matches_host_input():
    """A device-array ref quantizes ON DEVICE and reshards (no host
    round trip — review r11: the numpy coercion cost ~200 s at n=2^24
    over the dev tunnel); the grid and embed must be bit-identical to
    the host-input build."""
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    ref = rng.random((3_000, 5), np.float32)
    mesh = default_mesh(dp=1, sp=8)
    ix_h = NNIndex(ref, store="int8", strategy="sharded", mesh=mesh)
    ix_d = NNIndex(jnp.asarray(ref), store="int8", strategy="sharded",
                   mesh=mesh)
    assert ix_d._i8_s2 == ix_h._i8_s2
    np.testing.assert_array_equal(ix_d._i8_zero, ix_h._i8_zero)
    np.testing.assert_array_equal(np.asarray(ix_d.r_sharded),
                                  np.asarray(ix_h.r_sharded))
    q = rng.random((3, 5), np.float32)
    np.testing.assert_array_equal(np.asarray(ix_d.query(q)[0]),
                                  np.asarray(ix_h.query(q)[0]))


def test_from_int8_grid_mesh_requires_sharded():
    rng = np.random.default_rng(10)
    grid = rng.integers(-127, 128, size=(256, 3), dtype=np.int8)
    with pytest.raises(ValueError, match="strategy='sharded'"):
        NNIndex.from_int8_grid(grid, np.zeros(3, np.float32), 0.5,
                               mesh=default_mesh(dp=1, sp=8))


def test_sharded_pipeline_exposed():
    """pipeline() for the sharded strategies: run(search, *ops) must
    reproduce query() for both the f32 and int8 stores (user-space
    queries; the int8 grid transform + d2 rescale ride inside run)."""
    rng = np.random.default_rng(13)
    ref = rng.random((4_000, 6), np.float32)
    q = rng.random((8, 6), np.float32)
    mesh = default_mesh(dp=1, sp=8)
    for store in ("float32", "int8"):
        ix = NNIndex(ref, store=store, strategy="sharded", mesh=mesh)
        run, ops = ix.pipeline(8)
        pi, pd = run(q, *ops)
        qi, qd = ix.query(q)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(qi))
        np.testing.assert_allclose(np.asarray(pd), np.asarray(qd),
                                   rtol=1e-6)


def test_sharded_int8_save_load_roundtrip(tmp_path):
    """r5: sharded int8 indexes persist the grid + embed constants +
    mesh spec and rebind the mesh on load (historically save() rejected
    the sharded strategy outright — VERDICT r4 item 2)."""
    rng = np.random.default_rng(7)
    r = rng.random((1_000, 3), np.float32)
    q = rng.random((5, 3), np.float32)
    ix = NNIndex(r, store="int8", strategy="sharded",
                 mesh=default_mesh(dp=1, sp=8))
    p = str(tmp_path / "i8s.npz")
    ix.save(p)
    lx = NNIndex.load(p)
    assert lx.strategy == "sharded" and lx.store == "int8"
    assert dict(lx.mesh.shape) == {"dp": 1, "sp": 8}
    np.testing.assert_array_equal(np.asarray(lx.query(q)[0]),
                                  np.asarray(ix.query(q)[0]))
    np.testing.assert_allclose(np.asarray(lx.query(q)[1]),
                               np.asarray(ix.query(q)[1]))
