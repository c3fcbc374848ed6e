"""NNIndex store="int8": affine-grid quantized storage with exact
grid-space queries.

The contract (engine/index.py:_init_int8): points quantize ONCE onto
p = z + s*g (per-dim zero z, one global scale s, g int8 in [-127, 127]);
a query q maps to grid space q' = (q - z) * inv_s (one f32 rounding per
coordinate — the embed's definition) and every engine then computes
EXACT f32 diff-form geometry over (q', g): selection, top-K order, and
the v0 lowest-index tie rule are the f32 pipeline's over the stored
grid points. Reported d2 = grid_d2 * s^2 (monotone rescale).

The gate is therefore INDEX EQUALITY against the v0 oracle run in grid
space — with q' and the grid both derived from the INDEX'S OWN stored
constants, so the tests pin the embed's self-consistency, not a
re-derivation of it.
"""

import numpy as np
import pytest

from tpu_knn.engine.index import NNIndex
from tpu_knn.oracle import oracle_callback


def _grid(ix):
    g = np.asarray(ix.ref_dev)
    assert g.dtype == np.int8
    return g.astype(np.float32)


def _q_grid(ix, q):
    # Same f32 ops, same order as _i8_q.
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


def _grid_d2(ix, q, idx):
    g = _grid(ix)
    qg = _q_grid(ix, q)
    take = np.where(idx >= 0, idx, 0)
    d = ((qg[..., None, :] if idx.ndim == 2 else qg) - g[take]) ** 2
    return d.sum(-1, dtype=np.float32) * np.float32(ix._i8_s2)


@pytest.mark.parametrize("k", [3, 16])
def test_int8_matches_grid_oracle_all_batch_routes(k):
    """m=1/4 (zero-prep AoS grid scan), m=64 (per-call bf16 grid operand
    through the prepared MXU pipeline): every route reports the
    grid-space oracle's winner exactly."""
    rng = np.random.default_rng(20 + k)
    ref = rng.random((20_000, k), np.float32)
    ix = NNIndex(ref, store="int8")
    assert np.asarray(ix.ref_dev).dtype == np.int8
    assert ix.r_ops is None
    for m in (1, 4, 64):
        q = rng.random((m, k), np.float32)
        idx, d2 = ix.query(q)
        np.testing.assert_array_equal(np.asarray(idx), _oracle(ix, q))
        np.testing.assert_allclose(np.asarray(d2),
                                   _grid_d2(ix, q, np.asarray(idx)),
                                   rtol=1e-6)


def test_int8_dense_small_n_route():
    rng = np.random.default_rng(3)
    ref = rng.random((1_000, 5), np.float32)
    ix = NNIndex(ref, store="int8")
    q = rng.random((32, 5), np.float32)
    idx, _ = ix.query(q)
    np.testing.assert_array_equal(np.asarray(idx), _oracle(ix, q))


def test_int8_scale_and_offset_invariance():
    """Non-unit data (per-dim offsets in the thousands, mixed ranges):
    the affine embed must still produce in-range grids and exact
    grid-space selection — including the batch route, whose certified
    top-T cutoff is rescaled to grid units (cutoff_scale)."""
    rng = np.random.default_rng(5)
    k = 8
    scale = np.array([3000.0, 0.01, 250.0, 1.0, 40.0, 7000.0, 0.5, 90.0],
                     np.float32)
    off = np.array([-1500.0, 200.0, 0.0, -7.0, 1e4, -3e3, 0.25, 88.0],
                   np.float32)
    ref = (rng.random((30_000, k), np.float32) * scale + off)
    ix = NNIndex(ref, store="int8")
    g = np.asarray(ix.ref_dev)
    assert g.min() >= -127 and g.max() <= 127
    for m in (1, 64):
        q = (rng.random((m, k), np.float32) * scale + off)
        idx, d2 = ix.query(q)
        np.testing.assert_array_equal(np.asarray(idx), _oracle(ix, q))
        np.testing.assert_allclose(np.asarray(d2),
                                   _grid_d2(ix, q, np.asarray(idx)),
                                   rtol=1e-6)


def test_int8_tie_rule_on_grid_collisions():
    """The int8 grid is coarse (~1/254 of the data range per step), so
    distinct points collide onto one cell routinely; the lowest index
    must win — every route."""
    rng = np.random.default_rng(6)
    ref = rng.random((5_000, 4), np.float32)
    q = rng.random((8, 4), np.float32)
    base = np.clip(q[2] + 1e-4, 0, 1).astype(np.float32)
    ref[1234] = base
    ref[77] = np.clip(base + 3e-4 * rng.random(4).astype(np.float32), 0, 1)
    ix = NNIndex(ref, store="int8")
    g = np.asarray(ix.ref_dev)
    if not (g[77] == g[1234]).all():  # pragma: no cover
        pytest.skip("offsets did not collide under this seed")
    for m_slice in (slice(0, 8), slice(2, 3)):  # batch + m=1 routes
        idx, _ = ix.query(q[m_slice])
        np.testing.assert_array_equal(np.asarray(idx),
                                      _oracle(ix, q[m_slice]))
    idx, _ = ix.query(q)
    assert int(np.asarray(idx)[2]) == 77


@pytest.mark.parametrize("m,kk", [(1, 16), (4, 8), (64, 8), (12, 100)])
def test_int8_topk_engines(m, kk):
    """Top-K through every engine regime (m=1 AoS cell engine off the
    int8 grid; m>=2 batch engines over the per-call bf16 grid operand —
    grid-scale scores exercise the engines' relative-bound machinery)."""
    rng = np.random.default_rng(200 + m + kk)
    ref = rng.random((20_000, 6), np.float32)
    ix = NNIndex(ref, store="int8")
    q = rng.random((m, 6), np.float32)
    gi, gd = ix.query(q, neighbors=kk)
    np.testing.assert_array_equal(np.asarray(gi), _gold_topk(ix, q, kk))
    np.testing.assert_allclose(np.asarray(gd),
                               _grid_d2(ix, q, np.asarray(gi)), rtol=1e-6)


def test_int8_query_radius():
    """Radius semantics in USER units over the grid points: a row holds
    exactly the grid points whose rescaled d2 <= radius^2 (the engines
    select in grid space; _query_topk rescales before the compare)."""
    rng = np.random.default_rng(7)
    ref = rng.random((8_000, 3), np.float32)
    ix = NNIndex(ref, store="int8")
    q = rng.random((4, 3), np.float32)
    idx, d2, cnt = ix.query_radius(q, radius=0.05)
    g = _grid(ix)
    qg = _q_grid(ix, q)
    d = (((qg[:, None, :] - g[None, :, :]) ** 2).sum(-1, dtype=np.float32)
         * np.float32(ix._i8_s2))
    for r in range(4):
        want = np.nonzero(d[r] <= np.float32(0.05) ** 2)[0]
        got = np.asarray(idx)[r, : int(cnt[r])]
        np.testing.assert_array_equal(np.sort(got), want)
    assert (np.asarray(d2)[np.asarray(idx) >= 0] <= 0.05**2 + 1e-12).all()


def test_int8_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(8)
    ref = rng.random((4_000, 6), np.float32) * 37.0 - 11.0
    ix = NNIndex(ref, store="int8")
    path = str(tmp_path / "ix.npz")
    ix.save(path)
    back = NNIndex.load(path)
    assert back.store == "int8"
    np.testing.assert_array_equal(np.asarray(back.ref_dev),
                                  np.asarray(ix.ref_dev))
    np.testing.assert_array_equal(back._i8_zero, ix._i8_zero)
    assert back._i8_inv_s == ix._i8_inv_s
    assert back._i8_s2 == ix._i8_s2
    q = rng.random((16, 6), np.float32) * 37.0 - 11.0
    for kk in (None, 5):
        a = ix.query(q, neighbors=kk)
        b = back.query(q, neighbors=kk)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_int8_pipeline_matches_query():
    """pipeline(m) (the embedded/bench form: transform + route + rescale
    in ONE jit) must agree with query() on both the m<=4 and batch
    routes."""
    rng = np.random.default_rng(9)
    ref = rng.random((20_000, 7), np.float32)
    ix = NNIndex(ref, store="int8")
    for m in (1, 64):
        q = rng.random((m, 7), np.float32)
        run, ops = ix.pipeline(m)
        pi, pd = run(q, *ops)
        qi, qd = ix.query(q)
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(qi))
        np.testing.assert_allclose(np.asarray(pd), np.asarray(qd),
                                   rtol=1e-6)


def test_int8_degenerate_constant_data():
    """All-identical points: the scale falls back to 1.0 (no zero
    division), every query returns index 0 (lowest of the all-tied
    set)."""
    ref = np.full((256, 4), 3.25, np.float32)
    ix = NNIndex(ref, store="int8")
    assert float(ix._i8_inv_s) == 1.0
    q = np.random.default_rng(0).random((4, 4)).astype(np.float32)
    idx, _ = ix.query(q)
    np.testing.assert_array_equal(np.asarray(idx), np.zeros(4, np.int32))


def test_int8_rejections():
    rng = np.random.default_rng(10)
    ref = rng.random((512, 4), np.float32)
    with pytest.raises(ValueError, match="immutable"):
        NNIndex(ref, store="int8", mutable=True)
    with pytest.raises(ValueError, match="strategy='fused'"):
        NNIndex(ref, store="int8", strategy="auto")
    with pytest.raises(ValueError, match="strategy='fused'"):
        NNIndex(ref, store="int8", strategy="kdtree")
    with pytest.raises(ValueError, match="store='float32'"):
        NNIndex(ref, store="int8", metric="cosine")
    ix = NNIndex(ref, store="int8")
    with pytest.raises(ValueError, match="bf16"):
        ix.filtered_view(np.ones(512, bool))
    with pytest.raises(ValueError, match="immutable"):
        ix.add(ref[:2])


def test_int8_d2_within_quantization_error():
    """Sanity on units: the rescaled d2 approximates the TRUE user-space
    squared distance within the quantization bound (each coordinate
    moved <= s/2 + query-transform rounding)."""
    rng = np.random.default_rng(11)
    k = 6
    ref = rng.random((10_000, k), np.float32)
    ix = NNIndex(ref, store="int8")
    q = rng.random((32, k), np.float32)
    idx, d2 = ix.query(q)
    s = 1.0 / float(ix._i8_inv_s)
    true = ((q - ref[np.asarray(idx)]) ** 2).sum(1)
    bound = (np.sqrt(k) * s) * (2 * np.sqrt(np.maximum(true, 1e-12))
                                + np.sqrt(k) * s)
    assert (np.abs(np.asarray(d2) - true) <= bound + 1e-6).all()


def test_int8_from_grid_constructor():
    """from_int8_grid (the chunk-quantized capacity path) must behave
    identically to an index built by the standard constructor when fed
    the same grid state."""
    rng = np.random.default_rng(12)
    ref = rng.random((6_000, 5), np.float32) * 12.0 - 3.0
    ix = NNIndex(ref, store="int8")
    s = float(np.float32(1.0 / np.float64(ix._i8_inv_s)))
    ix2 = NNIndex.from_int8_grid(np.asarray(ix.ref_dev), ix._i8_zero, s)
    assert ix2.store == "int8" and ix2.r_ops is None
    q = rng.random((16, 5), np.float32) * 12.0 - 3.0
    for kk in (None, 6):
        a = ix.query(q, neighbors=kk)
        b = ix2.query(q, neighbors=kk)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    with pytest.raises(ValueError, match="int8"):
        NNIndex.from_int8_grid(ref, ix._i8_zero, s)   # f32 input
    with pytest.raises(ValueError, match="positive"):
        NNIndex.from_int8_grid(np.asarray(ix.ref_dev), ix._i8_zero, 0.0)
    with pytest.raises(ValueError, match="zero must be"):
        NNIndex.from_int8_grid(np.asarray(ix.ref_dev),
                               np.zeros(3, np.float32), s)
