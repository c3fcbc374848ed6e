"""Version registry and dispatcher.

The reference selects implementations two ways: compile-time `CALLBACKi`
macros enumerate versions for the harness (core.h:12-21) and the top-level
`cudaCallback` hardwires the production version (core.cu:1282-1297, "v8 is
the best!"). Here both become a runtime registry: every version
self-registers with a uniform callback signature

    fn(k, m, n, search: (m,k) f32, ref: (n,k) f32) -> (m,) int32

and declares its preconditions via a `guard` plus a `fallback` version —
the reference's delegation chains (v5→v4 when n exceeds the texture limit,
core.cu:481-485; v6→v4 when k*m exceeds constant memory, core.cu:603-607;
v8→v7 on one device / small n, core.cu:869-872; v9/v10→v0 when k>16,
core.cu:1035-1036) made explicit and testable.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import numpy as np

CallbackFn = Callable[[int, int, int, np.ndarray, np.ndarray], np.ndarray]
GuardFn = Callable[[int, int, int], bool]


@dataclasses.dataclass(frozen=True)
class Version:
    name: str
    fn: CallbackFn
    description: str = ""
    # guard(k, m, n) -> True when this version can handle the problem; when
    # False the dispatcher delegates to `fallback`.
    guard: Optional[GuardFn] = None
    fallback: Optional[str] = None

    def __call__(self, k: int, m: int, n: int, search, ref) -> np.ndarray:
        if self.guard is not None and not self.guard(k, m, n):
            if self.fallback is None:
                raise ValueError(
                    f"version {self.name} cannot handle (k={k}, m={m}, n={n}) "
                    "and has no fallback"
                )
            return get_version(self.fallback)(k, m, n, search, ref)
        return self.fn(k, m, n, search, ref)


_REGISTRY: Dict[str, Version] = {}
_BUILTINS_LOADED = False


def register_version(
    name: str,
    fn: CallbackFn,
    description: str = "",
    guard: Optional[GuardFn] = None,
    fallback: Optional[str] = None,
) -> Version:
    v = Version(name=name, fn=fn, description=description, guard=guard, fallback=fallback)
    _REGISTRY[name] = v
    return v


def _ensure_builtins() -> None:
    """Import built-in version modules (each registers itself on import)."""
    global _BUILTINS_LOADED
    if _BUILTINS_LOADED:
        return
    _BUILTINS_LOADED = True

    from tpu_knn import oracle

    register_version(
        "v0",
        oracle.oracle_callback,
        "serial-semantics NumPy oracle (reference core.cu:25-63)",
    )

    import importlib

    for mod in (
        "tpu_knn.kernels.twophase",
        "tpu_knn.kernels.fused",
        "tpu_knn.kernels.twolevel",
        "tpu_knn.kernels.dma_pipeline",
        "tpu_knn.kernels.projection",
        "tpu_knn.distributed.sharded",
        "tpu_knn.kdtree.versions",
    ):
        try:
            importlib.import_module(mod)
        except ImportError as e:
            # Only "module not built yet" (incremental construction) may be
            # suppressed; a genuine import bug INSIDE a version module (typo,
            # missing dep) must fail loudly, not silently unregister it.
            if e.name is None or not mod.startswith(e.name):
                raise


def get_version(name: str) -> Version:
    _ensure_builtins()
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown version {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def list_versions() -> List[str]:
    _ensure_builtins()
    return sorted(_REGISTRY)


#: Production preference order, best first — the reference's graceful
#: degradation chain (v8 → v7 → ... → v0, core.cu:865-872) applied to
#: whatever versions are registered.
PREFERENCE_ORDER = ("v8", "v7", "v6", "v5", "v4", "v3", "v2", "v1", "v0")


def best_available_version() -> Version:
    _ensure_builtins()
    for name in PREFERENCE_ORDER:
        if name in _REGISTRY:
            return _REGISTRY[name]
    raise RuntimeError("no versions registered")
