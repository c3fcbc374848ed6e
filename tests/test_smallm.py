"""Small-batch diff-form kernel (kernels/smallm.py) — conformance, tie
semantics, and dispatch wiring (fused_knn route + NNIndex prepared path)."""

import numpy as np
import pytest

from tpu_knn.engine.index import NNIndex, _build_smallm_prepared
from tpu_knn.kernels.fused import fused_knn
from tpu_knn.kernels.smallm import (
    SMALLM_MAX_K, SMALLM_MAX_M, _build_smallm, smallm_applicable, smallm_knn,
)
from tpu_knn.oracle import oracle_knn


@pytest.mark.parametrize("k", [1, 3, 8, 16, 31, 32])
@pytest.mark.parametrize("m", [1, 2, 4])
def test_conformance_vs_oracle(k, m):
    rng = np.random.default_rng(hash((k, m)) % 2**31)
    for n in (1, 2, 127, 128, 129, 4096, 10_000):
        q = rng.random((m, k), np.float32)
        r = rng.random((n, k), np.float32)
        idx, d2 = smallm_knn(q, r)
        want = oracle_knn(q, r)
        np.testing.assert_array_equal(np.asarray(idx), want, err_msg=f"n={n}")
        np.testing.assert_allclose(
            np.asarray(d2), np.sum((q - r[want]) ** 2, axis=1),
            rtol=1e-6, atol=1e-7)


def test_exact_duplicate_ties_lowest_index():
    rng = np.random.default_rng(7)
    q = rng.random((2, 3), np.float32)
    r = rng.random((600, 3), np.float32)
    # Query 0's exact point planted at three positions; 211 must win.
    r[211] = r[237] = r[598] = q[0]
    idx, d2 = smallm_knn(q, r)
    assert int(idx[0]) == 211 and float(d2[0]) == 0.0


def test_winner_at_ragged_tail():
    """Plant the winner in the ragged final tile (n not a multiple of the
    lane width) — masks must not clip it."""
    rng = np.random.default_rng(8)
    q = rng.random((1, 5), np.float32)
    n = 130 * 128 + 37  # ragged
    r = rng.random((n, 5), np.float32) + 2.0  # all far
    r[n - 1] = q[0] + 1e-3
    idx, _ = smallm_knn(q, r)
    assert int(idx[0]) == n - 1


def test_fused_knn_routes_small_batches():
    from tpu_knn.kernels.smallm import _build_aos_scan

    rng = np.random.default_rng(9)
    q = rng.random((2, 7), np.float32)
    r = rng.random((3000, 7), np.float32)
    misses0 = _build_aos_scan.cache_info().misses
    idx, _ = fused_knn(q, r)
    assert _build_aos_scan.cache_info().misses == misses0 + 1
    np.testing.assert_array_equal(np.asarray(idx), oracle_knn(q, r))

    # Explicit precision signals measurement intent: MXU path, no route.
    misses1 = _build_aos_scan.cache_info().misses
    idx2, _ = fused_knn(q, r, precision="bf16x3")
    assert _build_aos_scan.cache_info().misses == misses1
    np.testing.assert_array_equal(np.asarray(idx2), oracle_knn(q, r))

    # Explicit tile_n keeps the Pallas SoA pipeline (measurement intent).
    misses2 = _build_smallm.cache_info().misses
    idx3, _ = smallm_knn(q, r, tile_n=512)
    assert _build_smallm.cache_info().misses == misses2 + 1
    np.testing.assert_array_equal(np.asarray(idx3), oracle_knn(q, r))


def test_applicability_predicate():
    assert smallm_applicable(1, 3, 1 << 24)
    assert smallm_applicable(SMALLM_MAX_M, SMALLM_MAX_K, 10)
    assert not smallm_applicable(SMALLM_MAX_M + 1, 3, 10)
    assert not smallm_applicable(1, SMALLM_MAX_K + 1, 10)


def test_nnindex_k_below_8_routes_prepared_aos_scan():
    """At k < 8, m == 1 the prepared small-m pipeline must route to the
    AoS scan over the index's resident ref array (the SoA operand's
    sublane pad reads 8/k times the bytes; measured 0.452 vs 0.773 ms
    at (2^24,3); the scan is linear in m so m >= 2 keeps the Pallas
    kernel). Mutable-index +inf PAD/tombstone rows must self-exclude,
    and the first-minimum argmin must keep the lowest-index tie rule."""
    from tpu_knn.kernels.smallm import _build_aos_scan

    rng = np.random.default_rng(11)
    ref = rng.random((600, 3), np.float32)
    ref[77] = ref[401]  # planted duplicate: lowest index must win
    index = NNIndex(ref, strategy="fused", mutable=True)
    misses0 = _build_aos_scan.cache_info().misses
    q = ref[401:402].copy()
    idx, d2 = index.query(q)
    assert _build_aos_scan.cache_info().misses > misses0
    assert int(idx[0]) == 77 and float(d2[0]) == 0.0
    np.testing.assert_array_equal(np.asarray(idx), oracle_knn(q, ref))
    # m=2 keeps the Pallas prepared kernel (one scan serves all rows).
    misses1 = _build_aos_scan.cache_info().misses
    q2 = np.concatenate([q, rng.random((1, 3), np.float32)])
    idx2m, _ = index.query(q2)
    np.testing.assert_array_equal(np.asarray(idx2m), oracle_knn(q2, ref))
    assert _build_aos_scan.cache_info().misses == misses1
    # Remove the duplicate pair; the tombstoned rows must self-exclude.
    index.remove([77, 401])
    idx2, d2_2 = index.query(ref[401:402])
    live = np.asarray(
        [i for i in range(600) if i not in (77, 401)], np.int64)
    D = ((ref[401] - ref[live]) ** 2).sum(-1)
    assert int(idx2[0]) == live[np.argmin(D)]
    assert float(d2_2[0]) > 0.0


def test_nnindex_small_batch_uses_smallm_operandwidth_adapted():
    """NNIndex prepared queries at m<=4 must run the diff-form kernel off
    the SAME SoA operand the MXU path uses (padded for NNIndex's OWN
    tiling — the kernel adapts its tile to the operand width)."""
    rng = np.random.default_rng(10)
    ref = rng.random((10_000, 16), np.float32)
    index = NNIndex(ref, strategy="fused")
    misses0 = _build_smallm_prepared.cache_info().misses
    for m in (1, 2, 3, 4):
        q = rng.random((m, 16), np.float32)
        idx, d2 = index.query(q)
        assert idx.shape == (m,)
        np.testing.assert_array_equal(np.asarray(idx), oracle_knn(q, ref))
    # m=3 buckets to 4: exactly 3 compiled small pipelines {1, 2, 4}.
    assert _build_smallm_prepared.cache_info().misses == misses0 + 3

    # pipeline() exposes the same routed pipeline.
    run, ops = index.pipeline(1)
    q = rng.random((1, 16), np.float32)
    idx2, _ = run(q, *ops)
    np.testing.assert_array_equal(np.asarray(idx2), oracle_knn(q, ref))


def test_nnindex_auto_small_batch_projection_still_wins_its_niche():
    """auto strategy: the projection route keeps priority over smallm in
    its certified niche (it reads windows, not the whole set)."""
    from tpu_knn.kernels import projection as proj_mod

    rng = np.random.default_rng(11)
    ref = rng.random((50_000, 3), np.float32)
    index = NNIndex(ref, strategy="auto")
    assert index.proj_index is not None
    orig = proj_mod.projection_wins
    proj_mod.projection_wins = lambda k, m, n: True
    try:
        q = rng.random((2, 3), np.float32)
        idx, _ = index.query(q)
        assert index.last_strategy == "projection"
        np.testing.assert_array_equal(np.asarray(idx), oracle_knn(q, ref))
    finally:
        proj_mod.projection_wins = orig
