"""v7 two-level reduction tests — including the m>1 multi-partial
regression test the reference lacks (its second-level CPU reduction reads
query 0's candidates for every query, core.cu:771-773 / SURVEY.md §2.4,
masked in the shipped harness by the single-block-row early return)."""

import numpy as np
import pytest

from tpu_knn.kernels.twolevel import twolevel_knn
from tpu_knn.oracle import oracle_callback


def oracle(search, ref):
    m, k = search.shape
    return oracle_callback(k, m, ref.shape[0], search, ref)


def test_m_greater_1_with_forced_multi_partial():
    """The regression test for the reference's latent bug: many queries AND
    multiple partitions, with each query's winner planted in a DIFFERENT
    partition — any cross-query candidate mixup mispicks."""
    rng = np.random.default_rng(0)
    m, k, parts = 16, 4, 8
    n = 8 * 1024  # 8 partitions x 1024
    ref = rng.random((n, k), np.float32) + 2.0  # all far away
    search = rng.random((m, k), np.float32)
    winners = []
    for i in range(m):
        part = i % parts
        pos = part * 1024 + 100 + i
        ref[pos] = search[i]  # exact hit, unique per query, own partition
        winners.append(pos)
    idx, d2 = twolevel_knn(search, ref, parts=parts)
    np.testing.assert_array_equal(np.asarray(idx), winners)
    np.testing.assert_array_equal(np.asarray(d2), np.zeros(m, np.float32))


@pytest.mark.parametrize("parts", [1, 2, 8])
def test_matches_oracle(parts):
    rng = np.random.default_rng(1)
    q = rng.random((9, 6), np.float32)
    r = rng.random((5000, 6), np.float32)
    idx, _ = twolevel_knn(q, r, parts=parts)
    np.testing.assert_array_equal(np.asarray(idx), oracle(q, r))


def test_tie_across_partitions_lowest_index():
    q = np.zeros((1, 3), np.float32)
    r = np.ones((2048, 3), np.float32)
    r[300] = 0.5   # partition 0 (shard size >= 256)
    r[1900] = 0.5  # later partition
    idx, _ = twolevel_knn(q, r, parts=8)
    assert int(idx[0]) == 300


def test_ragged_n_padding_never_wins():
    rng = np.random.default_rng(2)
    q = rng.random((3, 5), np.float32)
    r = rng.random((1000, 5), np.float32)  # not divisible by parts*tile
    idx, _ = twolevel_knn(q, r, parts=8)
    np.testing.assert_array_equal(np.asarray(idx), oracle(q, r))


def test_registered_version(ta_datasets):
    import tpu_knn

    assert "v7" in tpu_knn.list_versions()
