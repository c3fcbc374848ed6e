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


@pytest.mark.skipif(shutil.which("gcc") is None, reason="no C compiler")
def test_property_many_seeds_vs_system_glibc():
    """Property test (VERDICT round 1, item 9): ~100 random seeds x 1000
    draws plus long streams that cycle the additive-feedback table many
    times, all bit-compared against the machine's actual libc. One probe
    binary, parameterized by argv, keeps this fast."""
    src = (
        "#include <stdio.h>\n#include <stdlib.h>\n"
        "int main(int argc,char**argv){\n"
        "  unsigned long seed=strtoul(argv[1],0,10);\n"
        "  long count=strtol(argv[2],0,10);\n"
        "  srand((unsigned)seed);\n"
        "  for(long i=0;i<count;i++)printf(\"%d\\n\",rand());\n"
        "  return 0;}\n"
    )
    with tempfile.TemporaryDirectory() as td:
        c, exe = f"{td}/p.c", f"{td}/p"
        with open(c, "w") as f:
            f.write(src)
        subprocess.run(["gcc", "-O2", c, "-o", exe], check=True)

        def probe(seed, count):
            out = subprocess.run([exe, str(seed % (2**64)), str(count)],
                                 capture_output=True, text=True, check=True)
            return [int(x) for x in out.stdout.split()]

        rng = np.random.default_rng(2024)
        seeds = [int(s) for s in rng.integers(0, 2**32, size=96)]
        seeds += [0, 1, 2**31 - 1, 2**31, 2**32 - 1]
        for seed in seeds:
            assert GlibcRand(seed)._raw(1000) == probe(seed, 1000), seed
        # Long streams: 200k draws cross the 344-entry ring ~580 times.
        for seed in (1000, int(rng.integers(1, 2**32))):
            assert GlibcRand(seed)._raw(200_000) == probe(seed, 200_000), seed
