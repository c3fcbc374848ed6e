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
    from tpu_knn.kernels.fused import auto_precision

    assert auto_precision(16, 1 << 24) == "bf16x3"   # log2 n = 24 < 80
    assert auto_precision(4, 1 << 24) == "bf16x4"    # 20 < 24 <= 28
    assert auto_precision(3, 1 << 24) == "highest"   # 24 > 21
    assert auto_precision(3, 1 << 20) == "bf16x4"    # 15 < 20 <= 21
    assert auto_precision(3, 1 << 14) == "bf16x3"    # 14 < 15
    assert auto_precision(2, 1 << 20) == "highest"   # 20 > 14
    assert auto_precision(1, 1 << 10) == "highest"


def test_bf16x4_path_matches_oracle():
    rng = np.random.default_rng(9)
    ref = rng.random((100_000, 3), np.float32)  # log2 n ~ 16.6 > 15 -> x4
    search = rng.random((16, 3), np.float32)
    from tpu_knn.kernels.fused import auto_precision

    assert auto_precision(3, 100_000) == "bf16x4"
    run_gate("v4", search, ref)
