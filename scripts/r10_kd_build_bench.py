"""Measure the native reference-format KD-tree build (tk_kdtree_build)
at the reference's spatial-index shape (k=3, n=65536) and the bench
shapes, to size the sampled-variance optimization (VERSION_BENCH's v9
build row: 33.2 ms vs the reference's 18.7 ms on its Xeon 6242).

Run AFTER the test suite finishes (single shared CPU)."""

import time

import numpy as np

from tpu_knn import native


def bench(fn, *args, reps=7):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best


def main():
    assert native.available()
    rng = np.random.default_rng(0)
    for k, n in [(3, 65536), (16, 65536), (3, 1 << 20)]:
        ref = rng.random((n, k), np.float32)
        ms = bench(native.kdtree_build, ref)
        ms2 = bench(lambda r: native.Kdt2Index(r), ref)
        print(f"k={k} n={n}: tk_kdtree_build {ms:.2f} ms   kdt2 {ms2:.2f} ms")


if __name__ == "__main__":
    main()
