"""v9/v10 registry entries.

v9 (reference core.cu:960-1050): host KD-tree build + CPU query (native C++
with OpenMP over queries; pure-Python fallback).
v10 (reference core.cu:1051-1191): same host build, batched device-side
traversal on TPU.

Both guard k > 16 -> v0, mirroring the reference's curse-of-dimensionality
cutoff (core.cu:1035-1036, 1177-1178).
"""

from __future__ import annotations

import jax
import numpy as np

from tpu_knn.engine.registry import register_version
from tpu_knn.kdtree.build import build_kdtree, query_numpy
from tpu_knn.kdtree.traversal import DeviceKDTree


def _k_guard(k: int, m: int, n: int) -> bool:
    return k <= 16 and n >= 1


def _v10_guard(k: int, m: int, n: int) -> bool:
    # Device traversal visit counts grow ~n^(1-1/k): beyond k=8 the prune
    # stops paying and the batched while_loop can run near-exhaustive scans
    # (observed: a k=16, n=65536, m=1024 run exceeded the TPU watchdog and
    # crashed the worker). Delegate to the CPU tree (v9) instead — the
    # same shape of cutoff as the reference's k>16 -> v0 (core.cu:1177).
    return k <= 8 and n >= 1


def v9_callback(k, m, n, search, ref):
    tree = build_kdtree(ref)
    try:
        from tpu_knn import native

        if native.available():
            idx, _ = native.kdtree_query(search, ref, tree.p, tree.dim)
            return idx
    except Exception:
        pass
    idx, _ = query_numpy(tree, np.ascontiguousarray(search, np.float32))
    return idx


def v10_callback(k, m, n, search, ref):
    tree = build_kdtree(ref)
    dev = DeviceKDTree(tree)
    idx, _ = dev.query(search)
    return np.asarray(jax.device_get(idx), dtype=np.int32)


register_version(
    "v9",
    v9_callback,
    "KD-tree: host build (max-variance split, median) + CPU query "
    "(reference v9, core.cu:960-1050)",
    guard=_k_guard,
    fallback="v0",
)

register_version(
    "v10",
    v10_callback,
    "KD-tree: host build + batched TPU traversal (vmapped while_loop with "
    "explicit stack; reference v10, core.cu:1051-1191)",
    guard=_v10_guard,
    fallback="v9",
)
