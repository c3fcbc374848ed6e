"""ctypes bindings for the native host library (tpuknn_native.cc).

Everything here degrades gracefully: if the toolchain is missing the Python
implementations take over (generator: tpu_knn/harness/generator.py; oracle:
tpu_knn/oracle.py; KD-tree: tpu_knn/kdtree/build.py) — the same
capability-fallback pattern the reference uses for missing GPUs
(core.cu:869-870).
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

_lib = None
_load_error: Optional[Exception] = None


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        from tpu_knn.native.build import build

        path = build()
        lib = ctypes.CDLL(path)

        lib.tk_rand_new.restype = ctypes.c_void_p
        lib.tk_rand_new.argtypes = [ctypes.c_int32]
        lib.tk_rand_free.argtypes = [ctypes.c_void_p]
        lib.tk_rand_raw.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.tk_rand_floats.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        for fn in (lib.tk_oracle, lib.tk_oracle_omp):
            fn.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
        lib.tk_kdtree_build.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.tk_kdtree_query.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.tk_kdtree_query_topk.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.tk_kdt2_build.restype = ctypes.c_void_p
        lib.tk_kdt2_build.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.tk_kdt2_free.argtypes = [ctypes.c_void_p]
        lib.tk_kdt2_depth.restype = ctypes.c_int
        lib.tk_kdt2_depth.argtypes = [ctypes.c_void_p]
        lib.tk_kdt2_query.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.tk_kdt2_query_topk.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.tk_version.restype = ctypes.c_int
        _lib = lib
    except Exception as e:  # missing compiler, etc.
        _load_error = e
    return _lib


def available() -> bool:
    return _load() is not None


def load_error() -> Optional[Exception]:
    _load()
    return _load_error


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class NativeRand:
    """Native glibc-compatible rand() stream (same contract as GlibcRand)."""

    def __init__(self, seed: int):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {_load_error}")
        self._lib = lib
        self._h = lib.tk_rand_new(seed)

    def raw(self, count: int) -> np.ndarray:
        out = np.empty(count, dtype=np.int32)
        self._lib.tk_rand_raw(self._h, count, _ptr(out))
        return out

    def floats(self, count: int) -> np.ndarray:
        out = np.empty(count, dtype=np.float32)
        self._lib.tk_rand_floats(self._h, count, _ptr(out))
        return out

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.tk_rand_free(self._h)
                self._h = None
        except Exception:
            pass


def oracle(search: np.ndarray, ref: np.ndarray, parallel: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Native v0 oracle: returns (indices (m,) i32, squared distances (m,) f32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    search = np.ascontiguousarray(search, np.float32)
    ref = np.ascontiguousarray(ref, np.float32)
    m, k = search.shape
    n = ref.shape[0]
    idx = np.empty(m, dtype=np.int32)
    dist = np.empty(m, dtype=np.float32)
    fn = lib.tk_oracle_omp if parallel else lib.tk_oracle
    fn(k, m, n, _ptr(search), _ptr(ref), _ptr(idx), _ptr(dist))
    return idx, dist


def kdtree_build(ref: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Native KD-tree build: returns (p (4n,) i32, dim (4n,) i32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    ref = np.ascontiguousarray(ref, np.float32)
    n, k = ref.shape
    p = np.empty(4 * n, dtype=np.int32)
    dim = np.empty(4 * n, dtype=np.int32)
    lib.tk_kdtree_build(k, n, _ptr(ref), _ptr(p), _ptr(dim))
    return p, dim


def kdtree_query(
    search: np.ndarray, ref: np.ndarray, p: np.ndarray, dim: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Native KD-tree CPU query (v9): (indices, squared distances)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    search = np.ascontiguousarray(search, np.float32)
    ref = np.ascontiguousarray(ref, np.float32)
    m, k = search.shape
    n = ref.shape[0]
    idx = np.empty(m, dtype=np.int32)
    dist = np.empty(m, dtype=np.float32)
    lib.tk_kdtree_query(
        k, m, n, _ptr(search), _ptr(ref), _ptr(p), _ptr(dim), _ptr(idx), _ptr(dist)
    )
    return idx, dist


def kdtree_query_topk(
    search: np.ndarray, ref: np.ndarray, p: np.ndarray, dim: np.ndarray,
    neighbors: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native KD-tree CPU top-K query: (idx (m, K) i32, d2 (m, K) f32),
    rows ascending by (d2, index); tail filled -1/+inf when n < K."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    search = np.ascontiguousarray(search, np.float32)
    ref = np.ascontiguousarray(ref, np.float32)
    m, k = search.shape
    n = ref.shape[0]
    idx = np.empty((m, neighbors), dtype=np.int32)
    d2 = np.empty((m, neighbors), dtype=np.float32)
    lib.tk_kdtree_query_topk(
        k, m, n, neighbors, _ptr(search), _ptr(ref), _ptr(p), _ptr(dim),
        _ptr(idx), _ptr(d2)
    )
    return idx, d2


# kdt2 — the serving-grade leaf-bucketed tree (tpuknn_native.cc "kdt2").
# Exact-median inner splits down to ~16-point leaf buckets of contiguous
# records: build runs ~4 fewer nth_element levels than the reference-format
# per-point tree and queries SIMD-scan 1-2 cache runs per visited leaf
# instead of chasing p[node] -> ref[p[node]] chains. Same exactness and
# lowest-index tie rule; tests gate both trees against the oracle.

KDT2_MAX_K = 16        # larger k -> reference-format tree (and it should:
                       # high-dim trees degenerate to full scans anyway)
KDT2_TOPK_MAX = 128    # in-traversal heap capacity


class Kdt2Index:
    """Owning handle for a native kdt2 tree (freed on GC)."""

    def __init__(self, ref: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {_load_error}")
        ref = np.ascontiguousarray(ref, np.float32)
        n, k = ref.shape
        if not (1 <= k <= KDT2_MAX_K):
            raise ValueError(f"kdt2 supports 1 <= k <= {KDT2_MAX_K}, got {k}")
        if n < 1:
            raise ValueError("kdt2 needs at least one reference point")
        self._lib = lib
        self.n = n
        self.k = k
        self._h = lib.tk_kdt2_build(k, n, _ptr(ref))
        if not self._h:
            raise RuntimeError("tk_kdt2_build failed")

    @property
    def depth(self) -> int:
        return self._lib.tk_kdt2_depth(self._h)

    def query(self, search: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Exact 1-NN: (indices (m,) i32, squared distances (m,) f32)."""
        search = np.ascontiguousarray(search, np.float32)
        m, k = search.shape
        if k != self.k:
            # A ValueError, not an assert (review r3): the native call
            # walks `search + i*self.k` — a silent dim mismatch under
            # python -O would read out of bounds.
            raise ValueError(f"query dims {k} != index dims {self.k}")
        idx = np.empty(m, dtype=np.int32)
        d2 = np.empty(m, dtype=np.float32)
        self._lib.tk_kdt2_query(self._h, m, _ptr(search), _ptr(idx), _ptr(d2))
        return idx, d2

    def query_topk(self, search: np.ndarray,
                   neighbors: int) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-K, same contract as kdtree_query_topk (rows ascending
        by (d2, index); -1/+inf tail when n < K). K <= KDT2_TOPK_MAX."""
        if not (1 <= neighbors <= KDT2_TOPK_MAX):
            raise ValueError(
                f"kdt2 top-K supports 1 <= K <= {KDT2_TOPK_MAX}, "
                f"got {neighbors}")
        search = np.ascontiguousarray(search, np.float32)
        m, k = search.shape
        if k != self.k:
            raise ValueError(f"query dims {k} != index dims {self.k}")
        idx = np.empty((m, neighbors), dtype=np.int32)
        d2 = np.empty((m, neighbors), dtype=np.float32)
        self._lib.tk_kdt2_query_topk(self._h, m, neighbors, _ptr(search),
                                     _ptr(idx), _ptr(d2))
        return idx, d2

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.tk_kdt2_free(self._h)
                self._h = None
        except Exception:
            pass
