"""NNIndex store="bf16": quantized storage with exact-over-stored-points
queries.

The contract: the reference points are quantized ONCE to bfloat16 at
build; every query then computes exact f32 diff-form distances over the
QUANTIZED point set (kernels upcast at the read site — fused._score_tile,
the smallm/_smallm_topk kernels — so candidate selection and refinement
see bit-identical values). The gate here is therefore INDEX EQUALITY
against the v0 oracle run on the upcast quantized points, not a
tolerance: quantization moved the points, not the arithmetic.
"""

import ml_dtypes
import numpy as np
import pytest

from tpu_knn.engine.index import NNIndex
from tpu_knn.oracle import oracle_callback


def _quantized(ref):
    return ref.astype(ml_dtypes.bfloat16).astype(np.float32)


def _oracle(search, ref_q):
    m, k = search.shape
    return oracle_callback(k, m, ref_q.shape[0], search, ref_q)


def _gold_topk(q, ref_q, kk):
    d = ((q[:, None, :] - ref_q[None, :, :]) ** 2).sum(-1, dtype=np.float32)
    return np.argsort(d, 1, kind="stable")[:, :kk]


@pytest.mark.parametrize("k", [3, 16])
def test_bf16_matches_quantized_oracle_all_batch_routes(k):
    """m=1 (AoS scan / smallm), m=4 (smallm Pallas), m=64 (fused MXU):
    every route reports the quantized-point oracle's winner exactly."""
    rng = np.random.default_rng(10 + k)
    ref = rng.random((20_000, k), np.float32)
    ix = NNIndex(ref, store="bf16")
    assert ix.ref_dev.dtype == ml_dtypes.bfloat16
    assert ix.r_ops[0].dtype == ml_dtypes.bfloat16
    ref_q = _quantized(ref)
    for m in (1, 4, 64):
        q = rng.random((m, k), np.float32)
        idx, d2 = ix.query(q)
        np.testing.assert_array_equal(np.asarray(idx), _oracle(q, ref_q))
        np.testing.assert_allclose(
            np.asarray(d2),
            np.sum((q - ref_q[np.asarray(idx)]) ** 2, axis=1), rtol=1e-6)


def test_bf16_dense_small_n_route():
    rng = np.random.default_rng(3)
    ref = rng.random((1_000, 5), np.float32)
    ix = NNIndex(ref, store="bf16")
    q = rng.random((32, 5), np.float32)
    idx, _ = ix.query(q)
    np.testing.assert_array_equal(np.asarray(idx), _oracle(q, _quantized(ref)))


def test_bf16_tie_rule_on_quantization_collisions():
    """bf16 quantization CREATES exact duplicates (nearby f32 points snap
    to the same grid cell); the lowest-index rule must pick the first."""
    rng = np.random.default_rng(4)
    ref = rng.random((5_000, 4), np.float32)
    q = rng.random((8, 4), np.float32)
    # Plant: two distinct f32 points that quantize identically, nearest
    # to query 2 (offsets ~2^-12 vanish under bf16's ~2^-9 grid).
    base = q[2] + 1e-4
    ref[1234] = base
    ref[77] = base + 2e-4 * rng.random(4).astype(np.float32)
    ref_q = _quantized(ref)
    if not (ref_q[77] == ref_q[1234]).all():  # pragma: no cover
        pytest.skip("offsets did not collide under this seed")
    ix = NNIndex(ref, store="bf16")
    idx, _ = ix.query(q)
    np.testing.assert_array_equal(np.asarray(idx), _oracle(q, ref_q))
    assert int(np.asarray(idx)[2]) == 77  # lowest index among the pair


@pytest.mark.parametrize("m,kk", [(1, 16), (4, 8), (64, 8), (12, 100)])
def test_bf16_topk_engines(m, kk):
    """Top-K through every engine regime (m=1 AoS cell, m=4 bounded
    sweep, m*K>256 seeded, K>64 multi-round) over quantized points."""
    rng = np.random.default_rng(100 + m + kk)
    ref = rng.random((20_000, 6), np.float32)
    ix = NNIndex(ref, store="bf16")
    q = rng.random((m, 6), np.float32)
    gi, gd = ix.query(q, neighbors=kk)
    ref_q = _quantized(ref)
    np.testing.assert_array_equal(np.asarray(gi), _gold_topk(q, ref_q, kk))


def test_bf16_query_radius():
    rng = np.random.default_rng(7)
    ref = rng.random((8_000, 3), np.float32)
    ix = NNIndex(ref, store="bf16")
    q = rng.random((4, 3), np.float32)
    idx, d2, cnt = ix.query_radius(q, radius=0.05)
    ref_q = _quantized(ref)
    d = ((q[:, None, :] - ref_q[None, :, :]) ** 2).sum(-1, dtype=np.float32)
    for r in range(4):
        want = np.nonzero(d[r] <= 0.05**2)[0]
        got = np.asarray(idx)[r, : int(cnt[r])]
        np.testing.assert_array_equal(np.sort(got), want)


def test_bf16_mutable_add_remove():
    rng = np.random.default_rng(8)
    ref = rng.random((4_000, 6), np.float32)
    ix = NNIndex(ref, store="bf16", mutable=True)
    q = rng.random((5, 6), np.float32)
    # Adds are quantized on entry: an added exact-match point wins.
    ids = ix.add(q[:2])
    idx, d2 = ix.query(q)
    assert list(np.asarray(idx)[:2]) == list(ids)
    ix.remove(ids)
    idx2, _ = ix.query(q)
    live_q = _quantized(ref)
    np.testing.assert_array_equal(np.asarray(idx2), _oracle(q, live_q))


def test_bf16_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    ref = rng.random((6_000, 5), np.float32)
    ix = NNIndex(ref, store="bf16")
    p = str(tmp_path / "ix_bf16.npz")
    ix.save(p)
    # The file stores raw bf16 bits (uint16) — half the f32 footprint.
    with np.load(p) as z:
        assert z["ref"].dtype == np.uint16
        assert str(z["store"]) == "bf16"
    back = NNIndex.load(p)
    assert back.store == "bf16"
    q = rng.random((16, 5), np.float32)
    np.testing.assert_array_equal(np.asarray(back.query(q)[0]),
                                  np.asarray(ix.query(q)[0]))


def test_bf16_filtered_view():
    rng = np.random.default_rng(11)
    ref = rng.random((6_000, 6), np.float32)
    ix = NNIndex(ref, store="bf16")
    keep = rng.random(6_000) < 0.5
    view = ix.filtered_view(keep)
    q = rng.random((8, 6), np.float32)
    idx, _ = view.query(q)
    ref_q = _quantized(ref)
    d = ((q[:, None, :] - ref_q[None, :, :]) ** 2).sum(-1, dtype=np.float32)
    d[:, ~keep] = np.inf
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))


def test_bf16_sharded_1nn_and_topk():
    """store="bf16" on the sharded strategy: both shard-resident operands
    quantized (half per-shard HBM), results exact over the quantized
    points through the mesh pipeline (8 virtual devices, conftest)."""
    rng = np.random.default_rng(21)
    ref = rng.random((16_384, 6), np.float32)
    ix = NNIndex(ref, strategy="sharded", store="bf16")
    assert str(ix.r_sharded.dtype) == "bfloat16"
    assert str(ix.r_ops_sharded.dtype) == "bfloat16"
    ref_q = _quantized(ref)
    q = rng.random((24, 6), np.float32)
    idx, d2 = ix.query(q)
    np.testing.assert_array_equal(np.asarray(idx), _oracle(q, ref_q))
    np.testing.assert_allclose(
        np.asarray(d2), np.sum((q - ref_q[np.asarray(idx)]) ** 2, axis=1),
        rtol=1e-6)
    gi, _gd = ix.query(q, neighbors=8)
    np.testing.assert_array_equal(np.asarray(gi), _gold_topk(q, ref_q, 8))


def test_bf16_sharded_cross_shard_quantization_tie():
    """Two distinct f32 points on DIFFERENT shards that quantize to the
    same bf16 cell: the global merge must report the lower index."""
    rng = np.random.default_rng(22)
    ref = rng.random((4_096, 4), np.float32)
    q = rng.random((3, 4), np.float32)
    base = q[1] + 1e-4
    ref[300] = base                    # shard 0 (4096/8 = 512 per shard)
    ref[3_900] = base + 1e-4           # last shard; collides under bf16
    ref_q = _quantized(ref)
    if not (ref_q[300] == ref_q[3_900]).all():  # pragma: no cover
        pytest.skip("offsets did not collide under this seed")
    ix = NNIndex(ref, strategy="sharded", store="bf16")
    idx, _ = ix.query(q)
    np.testing.assert_array_equal(np.asarray(idx), _oracle(q, ref_q))
    assert int(np.asarray(idx)[1]) == 300


def test_bf16_store_validation():
    ref = np.zeros((128, 3), np.float32)
    with pytest.raises(ValueError, match="store"):
        NNIndex(ref, store="fp8")
    with pytest.raises(ValueError, match="strategy='fused'"):
        NNIndex(ref, strategy="kdtree", store="bf16")
