"""v1/v2 — two-phase XLA implementations.

The reference's v1 computes an explicit m*n distance matrix with a 32x32
thread-tile kernel and then per-row argmins (core.cu:64-121); v2 replaces
the argmin with a hand-written block tree reduction (core.cu:122-230). On
TPU both phases are XLA's job:

- the distance matrix is the MXU matmul form  d²(i,j) = ‖r_j‖² − 2·q_i·r_j
  (the ‖q_i‖² term is row-constant and argmin-invariant, so it is dropped;
  README.md:60,76 licenses comparing un-rooted squared forms),
- the argmin is `jnp.argmin`, which XLA lowers to a tree reduction over
  (value, index) pairs — exactly what v2 hand-wrote, with the same
  lowest-index tie rule.

v1 materializes the matrix in HBM (fine up to ~1 GB); v2 streams n-chunks
through a `lax.scan` with a running (min, index) carry, so n = 2^24 never
allocates an m*n matrix — the XLA analog of the reference's grid-stride
streaming (core.cu:161-171).

Matmuls run at `Precision.HIGHEST` (true fp32 accumulation) so near-tie
neighbors are not flipped beyond the harness' ±1e-3 tolerance; the fused
Pallas versions own their numerics separately.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.engine.registry import register_version
from tpu_knn.utils.shapes import cdiv, round_up

#: Max f32 bytes of the materialized (m, n) matrix PLUS both operands
#: for v1. Calibrated to the measured working maximum on one 16 GB v5e
#: chip: ds10/ds11 (m=1024, n=2^20, k=16) — a 4 GiB matrix + 64 MiB
#: operand — run at 12.2 / 10.4 ms with 0 errors against the
#: chunked-exact differential (scripts/r16_measure_misc.py section A);
#: the reference's v1 records the same shapes at 384 / 489 ms on a
#: 32 GB V100 (README.md:284). The budget counts operand bytes too
#: (ADVICE r4: an element-count-only guard admitted k=768 shapes whose
#: ~3 GiB operand stacks on top of the 4 GiB matrix and its argmin
#: reduction intermediates). Beyond this, v1 delegates to v2 (streaming
#: carry), which serves every shape.
V1_MAX_TOTAL_BYTES = (1 << 32) + (1 << 27)


def _v1_guard(k: int, m: int, n: int) -> bool:
    return 4 * (m * n + n * k + m * k) <= V1_MAX_TOTAL_BYTES

#: n-axis chunk length for the v2 stream.
V2_CHUNK = 1 << 16


def _partial_scores(q: jax.Array, r_chunk: jax.Array) -> jax.Array:
    """(m,k) x (c,k) -> (m,c) scores ‖r‖² − 2 q·r (squared distance minus
    the argmin-invariant ‖q‖² term), fp32 on the MXU."""
    r_norm = jnp.sum(r_chunk * r_chunk, axis=1)
    qr = jax.lax.dot_general(
        q,
        r_chunk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return r_norm[None, :] - 2.0 * qr


@functools.partial(jax.jit, static_argnames=())
def _v1_argmin(q: jax.Array, r: jax.Array) -> jax.Array:
    s = _partial_scores(q, r)
    return jnp.argmin(s, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n", "chunk"))
def _v2_argmin(q: jax.Array, r_padded: jax.Array, n: int, chunk: int) -> jax.Array:
    """Streaming two-phase argmin: scan over n-chunks with a running
    (best_score, best_index) carry. `r_padded` is (num_chunks*chunk, k);
    rows at index >= n are masked to +inf so padding never wins."""
    m = q.shape[0]
    num_chunks = r_padded.shape[0] // chunk
    r_chunks = r_padded.reshape(num_chunks, chunk, r_padded.shape[1])
    starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk

    def step(carry, xs):
        best_d, best_i = carry
        r_chunk, start = xs
        s = _partial_scores(q, r_chunk)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + start
        s = jnp.where(col < n, s, jnp.inf)
        local_i = jnp.argmin(s, axis=1).astype(jnp.int32)
        local_d = jnp.take_along_axis(s, local_i[:, None], axis=1)[:, 0]
        # Chunks arrive in index order: strict < keeps the earlier (lower)
        # global index on exact ties, matching v0's strict-> update.
        take = local_d < best_d
        best_i = jnp.where(take, local_i + start, best_i)
        best_d = jnp.where(take, local_d, best_d)
        return (best_d, best_i), None

    init = (
        jnp.full((m,), jnp.inf, dtype=jnp.float32),
        jnp.zeros((m,), dtype=jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(step, init, (r_chunks, starts))
    return best_i


def v1_callback(k: int, m: int, n: int, search: np.ndarray, ref: np.ndarray) -> np.ndarray:
    q = jnp.asarray(search, jnp.float32)
    r = jnp.asarray(ref, jnp.float32)
    return np.asarray(jax.device_get(_v1_argmin(q, r)))


def v2_callback(k: int, m: int, n: int, search: np.ndarray, ref: np.ndarray) -> np.ndarray:
    chunk = min(V2_CHUNK, round_up(n, 128))
    n_pad = round_up(n, chunk)
    q = jnp.asarray(search, jnp.float32)
    r = jnp.asarray(ref, jnp.float32)
    if n_pad != n:
        # Padding value is irrelevant (masked in-kernel); zeros keep XLA happy.
        r = jnp.pad(r, ((0, n_pad - n), (0, 0)))
    return np.asarray(jax.device_get(_v2_argmin(q, r, n, chunk)))


register_version(
    "v1",
    v1_callback,
    "two-phase XLA: materialized MXU distance matrix + row argmin "
    "(reference v1, core.cu:64-121)",
    guard=_v1_guard,
    fallback="v2",
)

register_version(
    "v2",
    v2_callback,
    "two-phase XLA, streamed: scanned n-chunks with running (min, index) "
    "carry, no materialized matrix (reference v2, core.cu:122-230)",
)
