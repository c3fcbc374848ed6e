"""Adversarial numerics: near-duplicate clusters, tiny distances, and
near-ties stress the norm-trick's cancellation — the exact-refinement
design must hold the reference's ±1e-3 true-distance gate everywhere."""

import numpy as np
import pytest

import tpu_knn
from tpu_knn.harness.checker import check_results
from tpu_knn.oracle import oracle_callback


def oracle(search, ref):
    m, k = search.shape
    return oracle_callback(k, m, ref.shape[0], search, ref)


def run_gate(version, search, ref):
    m, k = search.shape
    got = tpu_knn.knn_callback(k, m, ref.shape[0], search, ref, version=version)
    errors, total = check_results(oracle(search, ref), got, search, ref)
    assert errors == 0, f"{version}: {errors}/{total}"


VERSIONS = ["v1", "v2", "v4", "v5", "v7", "v8"]


@pytest.mark.parametrize("version", VERSIONS)
def test_clustered_near_duplicates(version):
    """Dense Gaussian clusters: many points within ~1e-3 of each query."""
    rng = np.random.default_rng(0)
    centers = rng.random((32, 8), np.float32)
    ref = (centers[rng.integers(0, 32, 20_000)]
           + rng.normal(0, 1e-4, (20_000, 8))).astype(np.float32)
    search = (centers[rng.integers(0, 32, 64)]
              + rng.normal(0, 1e-4, (64, 8))).astype(np.float32)
    run_gate(version, search, ref)


@pytest.mark.parametrize("version", VERSIONS)
def test_query_equals_reference_points(version):
    """d* = 0 exactly: the worst case for squared-space cancellation."""
    rng = np.random.default_rng(1)
    ref = rng.random((10_000, 5), np.float32)
    pick = rng.integers(0, 10_000, 32)
    search = ref[pick].copy()
    m, k = search.shape
    got = tpu_knn.knn_callback(k, m, ref.shape[0], search, ref, version=version)
    # The winner must be at distance exactly 0 (any exact duplicate is
    # acceptable under the tolerance rule; with unique rows it's `pick`).
    d = np.sum((search - ref[got]) ** 2, axis=1)
    assert np.all(d == 0.0), f"{version}: nonzero distances {d[d > 0]}"


@pytest.mark.parametrize("version", VERSIONS)
def test_large_coordinates(version):
    """Values far from [0,1]: bf16 splits must not overflow or drop bits
    catastrophically."""
    rng = np.random.default_rng(2)
    ref = (rng.random((5_000, 4), np.float32) * 1e3 - 500).astype(np.float32)
    search = (rng.random((16, 4), np.float32) * 1e3 - 500).astype(np.float32)
    run_gate(version, search, ref)


@pytest.mark.parametrize("version", VERSIONS)
def test_one_dimension(version):
    rng = np.random.default_rng(3)
    ref = rng.random((3_000, 1), np.float32)
    search = rng.random((8, 1), np.float32)
    run_gate(version, search, ref)


def test_auto_precision_tiers():
    from tpu_knn.kernels.fused import auto_precision, _packed_terms

    # k <= 32: packed single-pass (free precision in contraction slots).
    for k in (1, 2, 3, 16, 32):
        assert auto_precision(k, 1 << 24) == "packed"
    # Packed term selection by k_pad.
    assert _packed_terms(8) == (3, [(i, j) for i in range(3) for j in range(3)])
    assert len(_packed_terms(16)[1]) == 8    # 3-split minus lo·lo
    assert _packed_terms(32)[0] == 2         # 2x2
    assert _packed_terms(40)[0] == 0         # too wide — multi-pass ladder
    # k > 32: the multi-pass ladder with the large-n upgrade rule.
    assert auto_precision(40, 1 << 20) == "bf16x3"
    assert auto_precision(33, 1 << 24) == "bf16x3"


@pytest.mark.parametrize("precision", ["packed", "bf16x4", "highest"])
def test_precision_modes_match_oracle(precision):
    rng = np.random.default_rng(9)
    ref = rng.random((100_000, 3), np.float32)
    search = rng.random((16, 3), np.float32)
    from tpu_knn.kernels.fused import fused_knn

    idx, d2 = fused_knn(search, ref, precision=precision)
    errors, total = check_results(oracle(search, ref), np.asarray(idx),
                                  search, ref)
    assert errors == 0, f"{precision}: {errors}/{total}"


def test_k_above_packed_limit_multi_pass_ladder():
    """k=40 exceeds the packed-contraction capacity (4*k_pad > 128): the
    multi-pass bf16 ladder takes over and must still hold the gate."""
    from tpu_knn.kernels.fused import auto_precision

    assert auto_precision(40, 1 << 16) == "bf16x3"
    rng = np.random.default_rng(11)
    ref = rng.random((20_000, 40), np.float32)
    search = rng.random((8, 40), np.float32)
    run_gate("v4", search, ref)
    run_gate("v2", search, ref)


def test_select_cutoff_tier_scaling():
    """ADVICE r2 (medium): the top-T certification cutoff must scale with
    the active tier's relative score error so the admitted ABSOLUTE error
    is tier-independent (~6e-5 at the cutoff)."""
    from tpu_knn.kernels.fused import (
        SELECT_SCORE_CUTOFF, _TIER_EPS, select_cutoff,
    )

    # packed 3-split (k_pad <= 16): the calibrated baseline.
    assert select_cutoff("packed", 3) == SELECT_SCORE_CUTOFF
    assert select_cutoff("packed", 16) == SELECT_SCORE_CUTOFF
    # packed 2x2 (16 < k <= 32): bf16x4-quality error -> 2^9 smaller.
    assert select_cutoff("packed", 32) == SELECT_SCORE_CUTOFF * 2.0 ** -9
    # multi-pass ladder tiers admit the same absolute budget.
    for tier in ("bf16x3", "bf16x4", "highest", "default"):
        cut = select_cutoff(tier, 64)
        assert cut * _TIER_EPS[tier] <= SELECT_SCORE_CUTOFF * 2.0 ** -26 + 1e-12
    # exact diff-form scores: the magnitude certificate does not apply.
    assert np.isinf(select_cutoff("exact", 3))


def test_clustered_near_duplicates_k_above_packed(version_gate=None):
    """ADVICE r2 fuzz ask: k > 32 (bf16x3 multi-pass tier) with a dense
    shell of near-duplicate decoys around each query at moderate
    coordinate scale — the regime where a flat 4096 cutoff admitted ~2^9
    more score error than certified. Gate vs the oracle."""
    from tpu_knn.harness.checker import check_results
    from tpu_knn.kernels.fused import fused_knn
    from tpu_knn.oracle import oracle_knn

    rng = np.random.default_rng(1234)
    k, m, n = 40, 16, 6000
    scale = 9.0   # scores ~ k * scale^2 / 3 ~ 1000: below the OLD cutoff
    ref = (rng.random((n, k)) * scale).astype(np.float32)
    search = (rng.random((m, k)) * scale).astype(np.float32)
    # >REFINE_TOP_T near-duplicates per query: distinct points at d2 in
    # [1e-4, 1e-2] of each query, planted at scattered indices.
    for i in range(m):
        for j in range(12):
            ofs = rng.normal(0, 2e-2, k).astype(np.float32)
            ref[(37 * i + 211 * j) % n] = search[i] + ofs
    idx, d2 = fused_knn(search, ref)
    want = oracle_knn(search, ref)
    errors, total = check_results(want, np.asarray(idx), search, ref)
    assert errors == 0, f"near-duplicate cluster gate: {errors}/{total}"
