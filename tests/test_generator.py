"""glibc rand() parity tests for the sample generator."""

import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from tpu_knn.harness.generator import RAND_MAX, GlibcRand, SampleStream

# First 12 outputs of glibc rand() after srand(1000), captured from the
# system glibc (x86-64, glibc 2.x).
SEED_1000_HEAD = [
    766020790, 1182770779, 1333893513, 173226398, 1071903604, 1702255141,
    2121871803, 2124051570, 983886268, 1364009855, 1991873138, 779257283,
]


def test_seed_1000_head():
    rng = GlibcRand(1000)
    assert [rng.rand() for _ in range(12)] == SEED_1000_HEAD


def test_reseed_resets_stream():
    rng = GlibcRand(1000)
    rng._raw(1000)
    rng.seed(1000)
    assert rng.rand() == SEED_1000_HEAD[0]


@pytest.mark.skipif(shutil.which("gcc") is None, reason="no C compiler")
@pytest.mark.parametrize("seed", [1, 1000, 123456789, 0, -5, 2**31 + 7, 2**32 - 1])
def test_differential_vs_system_glibc(seed):
    """Differentially validate against the actual libc on this machine."""
    src = (
        "#include <stdio.h>\n#include <stdlib.h>\n"
        "int main(){srand(%d);for(int i=0;i<1000;i++)printf(\"%%d\\n\",rand());return 0;}\n"
        % seed
    )
    with tempfile.TemporaryDirectory() as td:
        c = f"{td}/p.c"
        exe = f"{td}/p"
        with open(c, "w") as f:
            f.write(src)
        subprocess.run(["gcc", "-O2", c, "-o", exe], check=True)
        expect = [int(x) for x in subprocess.run([exe], capture_output=True, text=True, check=True).stdout.split()]
    rng = GlibcRand(seed)
    assert rng._raw(1000) == expect


def test_floats_mapping():
    """getRandNum = float(rand() / double(RAND_MAX)) — generator.h:14-19."""
    vals = GlibcRand(1000).floats(12)
    expect = np.array(
        [np.float32(v / float(RAND_MAX)) for v in SEED_1000_HEAD], dtype=np.float32
    )
    assert vals.dtype == np.float32
    np.testing.assert_array_equal(vals, expect)


def test_sample_stream_layout():
    s1, r1 = SampleStream(1000).get_sample(3, 2, 4)
    assert s1.shape == (2, 3) and r1.shape == (4, 3)
    # AoS row-major: the first k*m draws are the search points in order.
    flat = GlibcRand(1000).floats(3 * 2 + 3 * 4)
    np.testing.assert_array_equal(s1.ravel(), flat[:6])
    np.testing.assert_array_equal(r1.ravel(), flat[6:])
