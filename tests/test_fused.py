"""Unit tests for the fused Pallas kernel building blocks (run in
interpreter mode on the CPU backend; the compiled path is exercised by
bench.py and __graft_entry__ on real TPU hardware)."""

import numpy as np
import pytest

from tpu_knn.kernels.fused import fused_knn
from tpu_knn.oracle import oracle_knn


@pytest.mark.parametrize("soa", [True, False])
def test_fused_matches_oracle(soa):
    rng = np.random.default_rng(0)
    q = rng.random((10, 5), np.float32)
    r = rng.random((1000, 5), np.float32)
    idx, score = fused_knn(q, r, soa=soa)
    np.testing.assert_array_equal(np.asarray(idx), oracle_knn(q, r))
    # Scores are the true squared distances from the exact refinement pass.
    d2 = np.sum((q - r[np.asarray(idx)]) ** 2, axis=1)
    np.testing.assert_allclose(np.asarray(score), d2, rtol=1e-6)


def test_fused_norm_augmented_path():
    """The optional fused-norm variant (‖r‖² folded into the matmul via an
    augmented row, running-max fold) must match the oracle, including with
    the v7/v8 1e30 padding convention (whose inf norm produces NaN scores
    through the bf16 split — the fold must not propagate them)."""
    from tpu_knn.kernels.fused import _build_fused_candidates, _refine
    import jax

    rng = np.random.default_rng(9)
    q = rng.random((10, 5), np.float32)
    r = np.concatenate(
        [rng.random((900, 5), np.float32),
         np.full((124, 5), 1e30, np.float32)], axis=0)
    n_real = 900
    cand_fn = _build_fused_candidates(10, 1024, 5, 16, 256, True,
                                      fuse_norm=True)
    cand = jax.jit(cand_fn)(q, r)
    idx, d2 = _refine(q, r, cand, n_real)
    np.testing.assert_array_equal(np.asarray(idx), oracle_knn(q, r[:n_real]))


def test_fused_multi_tile_m_and_n():
    rng = np.random.default_rng(1)
    q = rng.random((20, 3), np.float32)
    r = rng.random((700, 3), np.float32)
    idx, _ = fused_knn(q, r, tile_m=8, tile_n=256)  # ragged both axes
    np.testing.assert_array_equal(np.asarray(idx), oracle_knn(q, r))


def test_fused_tie_break_lowest_index_across_tiles():
    q = np.zeros((1, 4), np.float32)
    r = np.ones((600, 4), np.float32)
    r[200] = 0.5  # first minimum
    r[500] = 0.5  # duplicate in a later tile
    idx, _ = fused_knn(q, r, tile_m=8, tile_n=256)
    assert int(idx[0]) == 200


def test_fused_tie_break_within_tile():
    q = np.zeros((1, 4), np.float32)
    r = np.ones((256, 4), np.float32)
    r[17] = 0.5
    r[18] = 0.5
    idx, _ = fused_knn(q, r, tile_m=8, tile_n=256)
    assert int(idx[0]) == 17


def test_fused_padding_never_wins():
    # All reference points far away; n not a tile multiple — the padded
    # (zero) rows would be the nearest if unmasked.
    q = np.zeros((3, 4), np.float32)
    r = np.full((130, 4), 10.0, np.float32)
    r[129] = 9.0
    idx, _ = fused_knn(q, r, tile_m=8, tile_n=128)
    np.testing.assert_array_equal(np.asarray(idx), [129, 129, 129])


def test_fused_planted_winner_positions():
    rng = np.random.default_rng(2)
    n = 1000
    q = np.full((2, 6), 0.5, np.float32)
    for pos in [0, 255, 256, 511, 999]:
        r = rng.random((n, 6), np.float32)
        r[pos] = 0.5
        idx, _ = fused_knn(q, r, tile_m=8, tile_n=256)
        assert int(idx[0]) == pos and int(idx[1]) == pos


def test_top_t_selection_many_exact_ties():
    """The refine stage keeps only REFINE_TOP_T lanes; plant MORE exact
    duplicates than T across different lanes and tiles — the lowest index
    must still win (lexicographic extraction), in v4 and v7 alike."""
    from tpu_knn.kernels.fused import REFINE_TOP_T
    from tpu_knn.kernels.twolevel import twolevel_knn

    rng = np.random.default_rng(13)
    q = rng.random((3, 4), np.float32).astype(np.float32)
    r = (rng.random((4096, 4), np.float32) + 2.0).astype(np.float32)
    spots = [3301, 3302, 3303, 257, 513, 901, 1151, 1403, 1667, 2003,
             2311, 2689, 3072, 3967, 640, 1920]
    assert len(spots) > REFINE_TOP_T
    for s in spots:
        r[s] = q[1]  # exact duplicates of query 1, min index 257
    idx, d2 = fused_knn(q, r, tile_m=8, tile_n=512)  # explicit: MXU path
    assert int(idx[1]) == min(spots) and float(d2[1]) == 0.0
    np.testing.assert_array_equal(np.asarray(idx), oracle_knn(q, r))

    idx7, _ = twolevel_knn(q, r, parts=4)
    assert int(idx7[1]) == min(spots)
    np.testing.assert_array_equal(np.asarray(idx7), oracle_knn(q, r))


def test_dense_small_n_path():
    """Small reference sets route fused_knn to the dense exact path
    (kernels/dense.py) — exact diff-form distances and the strict
    lowest-index tie rule by construction."""
    import jax

    from tpu_knn.kernels.dense import dense_applicable, dense_knn
    from tpu_knn.oracle import oracle_knn

    assert dense_applicable(1024, 3, 1024)          # the ds5 regime
    assert not dense_applicable(1024, 3, 65536)     # ds6 stays streaming
    assert not dense_applicable(1 << 14, 16, 4096)  # elems cap
    rng = np.random.default_rng(21)
    q = rng.random((64, 6), np.float32)
    r = rng.random((2000, 6), np.float32)
    r[1500] = r[3]                                  # duplicate: lowest wins
    q[5] = r[3]
    idx, d2 = dense_knn(q, r)
    np.testing.assert_array_equal(np.asarray(jax.device_get(idx)),
                                  oracle_knn(q, r))
    assert np.asarray(idx)[5] == 3 and np.asarray(d2)[5] == 0.0


def test_refine_guard_large_magnitude_coordinates():
    """Review regression: at coordinate scale ~4000 the packed-dot score
    error (~2^-26 * |r|^2 ~ 1) exceeds unit distance gaps, and a plain
    top-8 pre-selection by approximate score could drop the true nearest
    lane entirely. The certified guard must detect the narrow margin and
    fall back to the full-width exact rerank."""
    import jax

    from tpu_knn.kernels.fused import fused_knn

    rng = np.random.default_rng(99)
    k, n = 8, 4096
    r = rng.uniform(2000.0, 4000.0, (n, k)).astype(np.float32)
    q = r[4000].copy()[None]
    q[0, 0] += 1.0                      # true NN at exact d2 = 1 (idx 4000)
    decoys = rng.choice(np.setdiff1d(np.arange(n), [4000]), 40, replace=False)
    for j, d in enumerate(decoys):      # 40 decoys at exact d2 = 4,
        r[d] = q[0]                     # spread across distinct lanes
        r[d, (j % k)] += 2.0
    idx, d2 = fused_knn(q, r, tile_m=8, tile_n=512)  # MXU path (skip smallm)
    assert int(np.asarray(jax.device_get(idx))[0]) == 4000
    assert abs(float(np.asarray(jax.device_get(d2))[0]) - 1.0) < 1e-3
