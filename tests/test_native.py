"""Native library (C++ host runtime): build, rand parity, oracle parity."""

import numpy as np
import pytest

from tpu_knn import native
from tpu_knn.harness.generator import GlibcRand
from tpu_knn.oracle import oracle_knn

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native lib unavailable: {native.load_error()}"
)


def test_rand_matches_python_model():
    py = GlibcRand(1000)
    nat = native.NativeRand(1000)
    np.testing.assert_array_equal(nat.raw(5000), np.array(py._raw(5000), np.int32))


def test_rand_floats_match():
    py = GlibcRand(77)
    nat = native.NativeRand(77)
    np.testing.assert_array_equal(nat.floats(5000), py.floats(5000))


def test_rand_streaming_statefulness():
    nat = native.NativeRand(1000)
    a = nat.raw(100)
    b = nat.raw(100)
    both = native.NativeRand(1000).raw(200)
    np.testing.assert_array_equal(np.concatenate([a, b]), both)


@pytest.mark.parametrize("parallel", [False, True])
def test_oracle_parity(parallel):
    rng = np.random.default_rng(0)
    q = rng.random((37, 7), np.float32)
    r = rng.random((5000, 7), np.float32)
    idx_py, d_py = oracle_knn(q, r, return_distances=True)
    idx_c, d_c = native.oracle(q, r, parallel=parallel)
    np.testing.assert_array_equal(idx_c, idx_py)
    np.testing.assert_array_equal(d_c, d_py)


def test_oracle_tie_semantics():
    q = np.zeros((1, 3), np.float32)
    r = np.ones((10, 3), np.float32)
    r[4] = 0.5
    r[8] = 0.5
    idx, _ = native.oracle(q, r)
    assert idx[0] == 4


def test_sample_stream_uses_native(monkeypatch):
    from tpu_knn.harness.generator import SampleStream

    s_nat, r_nat = SampleStream(1000, prefer_native=True).get_sample(3, 4, 100)
    s_py, r_py = SampleStream(1000, prefer_native=False).get_sample(3, 4, 100)
    np.testing.assert_array_equal(s_nat, s_py)
    np.testing.assert_array_equal(r_nat, r_py)


def test_rand_property_many_seeds():
    """Native tk_rand vs the Python model over many random seeds (the
    Python model itself is bit-gated against system libc in
    test_generator.py's property test — together these pin all three)."""
    rng = np.random.default_rng(7)
    for seed in [int(s) for s in rng.integers(0, 2**32, size=32)] + [0, 2**31]:
        py = GlibcRand(seed)
        nat = native.NativeRand(seed)
        np.testing.assert_array_equal(
            nat.raw(500), np.array(py._raw(500), np.int32), err_msg=str(seed))
