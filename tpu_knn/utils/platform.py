"""Backend detection.

Pallas TPU kernels run compiled on TPU and in interpreter mode everywhere
else (CPU tests, the driver's virtual-device mesh). Version implementations
consult `interpret_mode()` at trace time so the same code path is exercised
on both backends.
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=None)
def default_backend() -> str:
    import jax

    return jax.default_backend()


def on_tpu() -> bool:
    return default_backend() == "tpu"


def interpret_mode() -> bool:
    """True when Pallas kernels must run under the interpreter (non-TPU)."""
    return not on_tpu()
