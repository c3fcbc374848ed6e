"""v7 — two-level partial argmin over n-partitions.

The reference v7 (core.cu:644-789) launches multiple blocks per query
(occupancy-driven) producing partial winners, then a second-level reduction
picks the final answer. Its CPU second level contains a latent indexing bug
(reads query 0's candidates for every query, core.cu:771-773 — see
SURVEY.md §2.4) that never fires in the shipped harness. This module is the
TPU-native equivalent built *correctly*: the reference set is split into P
equal partitions, the fused kernel runs vmapped over partitions (one extra
leading grid axis), local candidate indices are rebased by their partition
offset per query row, and one joint exact refinement selects the winner.
tests/test_twolevel.py contains the m>1 multi-partial regression test the
reference lacks.

On a single-core v5e chip the partition axis is still executed sequentially
(so v7 is a capability rung, not a speedup — the same is true of reference
v7 for m=1024, README.md:290); its reduction is the exact machinery v8
reuses across chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.engine.registry import register_version
from tpu_knn.kernels.fused import _build_fused_candidates, _refine
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.shapes import cdiv, round_up

#: Fill value for n-padding: score becomes +inf (1e30² overflows f32), so
#: padded rows can never win a lane slot.
PAD_VALUE = 1e30

DEFAULT_PARTITIONS = 8


@functools.lru_cache(maxsize=None)
def _build_twolevel(m: int, n: int, k: int, parts: int,
                    tile_m: int, tile_n: int):
    n_shard = round_up(cdiv(n, parts), tile_n)
    n_pad = n_shard * parts
    from tpu_knn.kernels.fused import auto_precision, select_cutoff

    # Precision from the GLOBAL n: the gate's tightness is set by the
    # global nearest-neighbor distance scale, not the shard's.
    precision = auto_precision(k, n)
    kernel = _build_fused_candidates(m, n_shard, k, tile_m, tile_n, soa=True,
                                     precision=precision)
    cutoff = select_cutoff(precision, k)

    @jax.jit
    def run(search, ref):
        r = jnp.pad(ref, ((0, n_pad - n), (0, 0)), constant_values=PAD_VALUE)
        r = r.reshape(parts, n_shard, ref.shape[1])
        ci, cs = jax.vmap(kernel, in_axes=(None, 0))(search, r)  # (P, m, 128)
        # Index rebase: local -> global, PER PARTITION (the reference's
        # second level got this wrong; core.cu:771-773).
        offs = (jnp.arange(parts, dtype=jnp.int32) * n_shard)[:, None, None]
        ci = jnp.where(ci < n_shard, ci + offs, np.int32(2**31 - 1))
        ci = jnp.moveaxis(ci, 0, 1).reshape(m, parts * 128)
        # Scores are globally comparable (same norm-trick form, same q);
        # padded partitions carry +inf and their I32_MAX indices above.
        cs = jnp.moveaxis(cs, 0, 1).reshape(m, parts * 128)
        return _refine(search, ref, (ci, cs), n, cutoff=cutoff)

    return run


def twolevel_knn(search, ref, parts: int = DEFAULT_PARTITIONS):
    search = jnp.asarray(search, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    m, k = search.shape
    n = ref.shape[0]
    parts = max(1, min(parts, cdiv(n, 128)))
    tile_m, tile_n = pick_tiles(k, m, cdiv(n, parts))
    run = _build_twolevel(m, n, k, parts, tile_m, tile_n)
    return run(search, ref)


def v7_callback(k, m, n, search, ref):
    idx, _ = twolevel_knn(search, ref)
    return np.asarray(jax.device_get(idx), dtype=np.int32)


register_version(
    "v7",
    v7_callback,
    "two-level partial argmin over n-partitions with correct per-query "
    "index rebase (reference v7, core.cu:644-789; bug fixed per SURVEY §2.4)",
)
