"""tpu_knn — a TPU-native exact 1-NN engine.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the CUDA
reference (wu-kan/multicore-hw2, mounted at /root/reference): exact
nearest-neighbor search in k-dimensional space over m query points and n
reference points, returning for each query the index of the nearest
reference point under squared-L2 distance with lowest-index tie-breaking
(reference contract: sources/src/core.h:71, sources/src/core.cu:25-63).

The engine exposes a registry of "versions" mirroring the reference's
v0..v10 ladder, re-designed TPU-first:

- v0       serial-semantics oracle (NumPy, bit-compatible with the CUDA v0)
- v1, v2   two-phase XLA: MXU distance matrix + row argmin
- v3..v6   fused Pallas streaming kernel (distance matrix never hits HBM)
- v7       multi-tile two-level argmin (single-query efficiency)
- v8       multi-chip reference-set sharding over a mesh (shard_map + ICI
           min-index allreduce)
- v9, v10  KD-tree: host build + CPU query / batched TPU traversal

Public API:
    >>> import tpu_knn
    >>> idx = tpu_knn.nearest_neighbors(queries, refs)          # best version
    >>> idx = tpu_knn.nearest_neighbors(queries, refs, version="v3")
"""

from tpu_knn.api import nearest_neighbors, knn_callback
from tpu_knn.engine.registry import get_version, list_versions, register_version

#: Lazily-imported public symbols (PEP 562): the serving index (a real
#: CLASS — classmethods like NNIndex.load work), exact top-K, and the
#: mesh-sharded entry points. Lazy so `import tpu_knn` stays light and
#: does not touch jax device state.
_LAZY = {
    "NNIndex": ("tpu_knn.engine.index", "NNIndex"),
    "knn_graph": ("tpu_knn.api", "knn_graph"),
    "topk_knn": ("tpu_knn.kernels.topk", "topk_knn"),
    "within_radius": ("tpu_knn.kernels.topk", "within_radius"),
    "sharded_knn": ("tpu_knn.distributed.sharded", "sharded_knn"),
    "sharded_topk_knn": ("tpu_knn.distributed.sharded", "sharded_topk_knn"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'tpu_knn' has no attribute {name!r}")


__version__ = "0.1.0"

__all__ = [
    "nearest_neighbors",
    "knn_callback",
    "NNIndex",
    "knn_graph",
    "topk_knn",
    "within_radius",
    "sharded_knn",
    "sharded_topk_knn",
    "get_version",
    "list_versions",
    "register_version",
    "__version__",
]
