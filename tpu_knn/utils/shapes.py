"""Shape/tiling helpers (the reference's `divup`, sources/src/utils.h:11-13)."""

from __future__ import annotations


def cdiv(a: int, b: int) -> int:
    """Ceiling division (the reference's `divup`, utils.h:11-13)."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round `x` up to the next multiple of `m`."""
    return cdiv(x, m) * m


def pad_axis_to(x, axis: int, target: int, value=0.0):
    """Pad array `x` along `axis` up to length `target` with `value`.

    Used to bring the tiny k axis (3..16 in the reference's datasets) up to a
    TPU sublane/lane-friendly size, and the n axis up to a tile multiple.
    Zero-padding the k axis is distance-neutral; padding the n axis must be
    paired with masking in the consumer.
    """
    import numpy as np

    cur = x.shape[axis]
    if cur >= target:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - cur)
    return np.pad(x, widths, mode="constant", constant_values=value)
