"""Tests for the amplified in-dispatch timing protocol.

The protocol exists because block_until_ready does not reliably block
over the axon dev tunnel (docs/PERF_NOTES.md "Round-2 protocol
correction"); these tests pin its host-observable contract on the CPU
backend: positive readings, honest scaling with per-iteration work, and
calibration growth for fast steps.
"""

import jax.numpy as jnp

from tpu_knn.harness.timing import amplified_ms, calibrated_amplified_ms


def _step_for(size):
    def step(i, c, x):
        y = x + i.astype(jnp.float32)
        return c + jnp.sum(y * y) * 1e-12

    return step, jnp.ones((size, 128), jnp.float32)


def test_amplified_ms_positive_and_scales():
    step_s, x_s = _step_for(8)
    step_l, x_l = _step_for(4096)
    small = amplified_ms(step_s, x_s, iters=64)
    large = amplified_ms(step_l, x_l, iters=64)
    assert small > 0
    # 512x the work: allow generous slack but require real scaling, which
    # fails if the loop body were hoisted or dead-code-eliminated.
    assert large > 2 * small


def test_amplified_requires_carry_consumption():
    # A step that ignores its compute entirely is DCE'd: the reading must
    # collapse to ~loop overhead, far below the honest large reading.
    def dead_step(i, c, x):
        _ = jnp.sum(x * x)  # not folded into the carry
        return c + i.astype(jnp.float32) * 0.0

    step_l, x_l = _step_for(4096)
    dead = amplified_ms(dead_step, x_l, iters=64)
    live = amplified_ms(step_l, x_l, iters=64)
    assert live > dead  # documents WHY steps must consume their outputs


def test_calibrated_grows_iters_for_fast_steps():
    step, x = _step_for(8)
    ms, iters = calibrated_amplified_ms(step, x, target_ms=50.0,
                                        max_iters=4096)
    assert ms > 0
    assert iters > 8  # a microsecond step must be amplified well past the probe


