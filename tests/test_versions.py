"""Cross-version conformance: every registered version must agree with the
v0 oracle under the reference's tolerance rule (index equality, or true
distances within ±1e-3 — main.cu:79-99) on the TA shape matrix plus
adversarial cases the reference never tested."""

import numpy as np
import pytest

import tpu_knn
from tpu_knn.harness.checker import check_results
from tpu_knn.oracle import oracle_callback


def oracle_knn(search, ref):
    """Baseline via the native-preferring v0 path (bit-identical to the
    NumPy oracle; parity enforced in test_native.py)."""
    m, k = search.shape
    return oracle_callback(k, m, ref.shape[0], search, ref)

# Versions exercised by this module as they come online.
ALL_VERSIONS = ["v1", "v2", "v3", "v4", "v5", "v6", "v7", "v8", "v9", "v10",
                "v11"]


def available(version):
    return version in tpu_knn.list_versions()


def run_and_check(version, search, ref):
    m, k = search.shape
    n = ref.shape[0]
    baseline = oracle_knn(search, ref)
    got = tpu_knn.knn_callback(k, m, n, search, ref, version=version)
    assert got.shape == (m,)
    assert got.dtype == np.int32
    assert np.all((got >= 0) & (got < n)), f"{version}: out-of-range indices"
    errors, total = check_results(baseline, got, search, ref)
    assert errors == 0, f"{version}: {errors}/{total} errors vs oracle"


@pytest.fixture(scope="session")
def oracle_ta(ta_datasets):
    return [oracle_knn(s, r) for (_, s, r) in ta_datasets]


@pytest.mark.parametrize("version", ALL_VERSIONS)
def test_ta_datasets(version, ta_datasets, oracle_ta):
    if not available(version):
        pytest.skip(f"{version} not implemented yet")
    for ((k, m, n), search, ref), baseline in zip(ta_datasets, oracle_ta):
        got = tpu_knn.knn_callback(k, m, n, search, ref, version=version)
        errors, total = check_results(baseline, got, search, ref)
        assert errors == 0, f"{version} on {(k, m, n)}: {errors}/{total} errors"


@pytest.mark.parametrize("version", ALL_VERSIONS)
def test_exact_duplicate_ties(version):
    if not available(version):
        pytest.skip(f"{version} not implemented yet")
    # Every reference point duplicated: candidate must tie within tolerance.
    rng = np.random.default_rng(7)
    base = rng.random((100, 4), np.float32)
    ref = np.repeat(base, 2, axis=0)  # pairs of identical points
    search = rng.random((16, 4), np.float32)
    run_and_check(version, search, ref)


@pytest.mark.parametrize("version", ALL_VERSIONS)
def test_single_query_large_n(version):
    """m=1 (the reference v7's raison d'être) across chunk boundaries."""
    if not available(version):
        pytest.skip(f"{version} not implemented yet")
    rng = np.random.default_rng(3)
    search = rng.random((1, 8), np.float32)
    ref = rng.random((200_000, 8), np.float32)
    run_and_check(version, search, ref)


@pytest.mark.parametrize("version", ALL_VERSIONS)
def test_winner_in_every_chunk_position(version):
    """Plant the unique nearest point at awkward positions (start, chunk
    edges, end) to catch off-by-one index rebasing."""
    if not available(version):
        pytest.skip(f"{version} not implemented yet")
    rng = np.random.default_rng(11)
    n = 70_000  # spans the 65536 chunk boundary
    k = 5
    search = np.full((1, k), 0.5, np.float32)
    for pos in [0, 1, 65535, 65536, 65537, n - 1]:
        ref = rng.random((n, k), np.float32)
        ref[pos] = 0.5  # exact hit
        got = tpu_knn.knn_callback(k, 1, n, search, ref, version=version)
        d = np.sum((ref[got[0]] - 0.5) ** 2)
        assert d == 0.0, f"{version}: planted winner at {pos}, got {got[0]}"


@pytest.mark.parametrize("version", ALL_VERSIONS)
def test_awkward_shapes(version):
    """Non-tile-aligned m/n/k (reference shapes are all powers of two; the
    TPU build must mask correctly on ragged edges)."""
    if not available(version):
        pytest.skip(f"{version} not implemented yet")
    rng = np.random.default_rng(5)
    for (k, m, n) in [(1, 1, 1), (2, 3, 5), (7, 13, 129), (17, 100, 1000), (3, 257, 4099)]:
        search = rng.random((m, k), np.float32)
        ref = rng.random((n, k), np.float32)
        run_and_check(version, search, ref)


def test_v1_fallback_to_v2_on_huge_matrix():
    """v1's guard (materialized-matrix size) must delegate to v2, like
    v5→v4 in the reference (core.cu:481-485)."""
    from tpu_knn.engine.registry import get_version

    v1 = get_version("v1")
    assert v1.guard is not None
    # Threshold raised r4: 2^30 elems (4 GiB matrix) MEASURED working on
    # one 16 GB chip — ds10/ds11 run 12.2/10.4 ms with 0 errors
    # (scripts/r16_measure_misc.py A); past that v1 delegates to v2.
    assert not v1.guard(3, 1 << 16, 1 << 15)  # 2^31 > 2^30 elems
    assert v1.guard(3, 1024, 1 << 20)         # ds10/ds11 now served
    assert v1.guard(3, 1024, 65536)


def test_v5_guard_delegates_wide_k_to_v4():
    """v5's explicit double-buffer scratch must fit scoped VMEM; wide k at
    the autotuned tile_n exceeds the budget and the dispatcher delegates to
    v4 (reference v5->v4 texture-limit fallback, core.cu:481-485)."""
    from tpu_knn.engine.registry import get_version
    from tpu_knn.kernels.dma_pipeline import _v5_guard

    assert _v5_guard(3, 1024, 65536)       # normal shapes stay on v5
    assert _v5_guard(16, 1024, 1 << 20)
    assert not _v5_guard(2048, 8, 4096)    # 2x(2048x4096)x4B = 64 MB scratch

    # The delegation itself: v5 on a wide-k problem returns v4's (correct)
    # answer rather than attempting the oversized scratch allocation.
    rng = np.random.default_rng(55)
    k, m, n = 2048, 4, 32768
    assert not _v5_guard(k, m, n)
    search = rng.random((m, k), np.float32)
    ref = rng.random((n, k), np.float32)
    got = get_version("v5")(k, m, n, search, ref)
    want = oracle_callback(k, m, n, search, ref)
    errors, total = check_results(want, got, search, ref)
    assert errors == 0


def test_v3_guard_delegates_big_n_to_v4(monkeypatch):
    """v3's AoS (n, k) operand lives in (8,128)-tiled HBM pages — 8 GB at
    n=2^24 regardless of k — which crashes the TPU AOT compile helper
    (docs/VERSION_BENCH.md footnote [1]). The guard must delegate the
    reference's big-n shapes (ds8/ds9, which reference v3 runs at
    core.cu:231-312) to v4 instead of crashing the worker."""
    from tpu_knn.engine.registry import get_version
    from tpu_knn.kernels import fused

    assert fused._v3_guard(3, 1024, 1 << 20)    # ds10/ds11 stay on v3
    assert fused._v3_guard(16, 1024, 1 << 20)
    assert not fused._v3_guard(3, 1, 1 << 24)   # ds8: 8 GB padded operand
    assert not fused._v3_guard(16, 1, 1 << 24)  # ds9

    # The delegation end-to-end, with the threshold lowered so the "big-n"
    # problem stays cheap on the CPU test backend.
    monkeypatch.setattr(fused, "V3_MAX_PADDED_AOS_BYTES", 1 << 20)
    k, m, n = 3, 4, 50_000  # padded AoS ~25.6 MB > 1 MB -> v4
    assert not fused._v3_guard(k, m, n)
    rng = np.random.default_rng(33)
    search = rng.random((m, k), np.float32)
    ref = rng.random((n, k), np.float32)
    got = get_version("v3")(k, m, n, search, ref)
    want = oracle_callback(k, m, n, search, ref)
    errors, total = check_results(want, got, search, ref)
    assert errors == 0
