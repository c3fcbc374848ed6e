"""v8 — multi-chip reference-set sharding over a device mesh.

The reference v8 (core.cu:790-959) shards the reference set contiguously
across GPUs (one OpenMP host thread per device), runs the full v7 pipeline
per shard, gathers partial winners through a critical section, rebases
local indices by shard offset, and reduces on the CPU. The TPU-native
design replaces every piece with mesh-native machinery:

- sharding: a 2-D `jax.sharding.Mesh` ("dp", "sp"): queries are data-
  parallel over "dp", the reference set is sharded over "sp" (the
  context/sequence-parallel axis — SURVEY.md §2.3 item 8).
- per-shard compute: the same fused Pallas candidate kernel + exact
  refinement as v4/v7, under `shard_map`.
- index rebase: local + axis_index("sp") * shard_len, per query row
  (the reference's offset fix-up, core.cu:931-933, done correctly).
- reduction: min-index allreduce over ICI (collectives.py) instead of the
  reference's host-staged critical-section gather.

Adaptive dispatch mirrors the reference's guards (core.cu:865-872):
one device -> v7; small n (not worth the collective) -> v7.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpu_knn.distributed.collectives import min_index_allreduce
from tpu_knn.engine.registry import register_version
from tpu_knn.kernels.fused import (
    _build_fused_candidates, _refine, select_cutoff,
)
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.shapes import cdiv, round_up

#: n-padding fill whose score overflows to +inf (cannot win a lane slot).
PAD_VALUE = 1e30

#: Below this reference-set size, delegate to the single-chip path —
#: the reference's `n <= min(2^18, m << 10)` guard (core.cu:871-872).
def _small_n(k: int, m: int, n: int) -> bool:
    return n <= min(1 << 18, m << 10)


def default_mesh(dp: int = 1, sp: int | None = None) -> Mesh:
    """Mesh over all local devices: ("dp", "sp") = (queries, reference)."""
    devices = np.array(jax.devices())
    if sp is None:
        sp = len(devices) // dp
    return Mesh(devices[: dp * sp].reshape(dp, sp), ("dp", "sp"))


def multislice_mesh(dcn: int, dp: int = 1, sp: int | None = None) -> Mesh:
    """3-axis mesh ("dcn", "dp", "sp") for multi-slice deployments: the
    reference set shards hierarchically over (dcn, sp) and the reduction
    runs in two stages — min-index allreduce over "sp" rides ICI within a
    slice, then over "dcn" across slices (SURVEY.md §5: "over ICI within a
    slice, DCN across slices"). On single-slice hardware the axes are
    logical; the driver's virtual-device mesh exercises the same program.
    """
    devices = np.array(jax.devices())
    if sp is None:
        sp = len(devices) // (dcn * dp)
    return Mesh(devices[: dcn * dp * sp].reshape(dcn, dp, sp),
                ("dcn", "dp", "sp"))


@functools.lru_cache(maxsize=None)
def _build_sharded(m: int, n: int, k: int, mesh: Mesh,
                   method: str = "pmin", tile_n: int | None = None,
                   prepadded: bool = False,
                   precision: str | None = None):
    """prepadded: the reference array arrives already padded to
    (num_shards * n_local, k) with PAD_VALUE and sharded over the
    reference axes (NNIndex's prepared path) — no per-call host pad.

    Meshes with a "dcn" axis shard the reference set hierarchically over
    (dcn, sp) and reduce in two stages: "sp" first (ICI within a slice),
    then "dcn" (across slices)."""
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    dcn = mesh.shape.get("dcn", 1)
    has_dcn = "dcn" in mesh.shape
    ref_axes = ("dcn", "sp") if has_dcn else ("sp",)
    num_shards = dcn * sp
    m_pad = round_up(m, dp * 8)
    m_local = m_pad // dp
    from tpu_knn.kernels.fused import auto_precision

    # Precision from the GLOBAL n (the gate's tightness is global); wide
    # tiles whenever the packed dot applies, matching fused_knn. The
    # caller overrides for quantized stores (qsplit2 over bf16-exact
    # shard operands — NNIndex passes its upgraded tier).
    if precision is None:
        precision = auto_precision(k, n)
    tile_m, auto_tile_n = pick_tiles(k, m_local, cdiv(n, num_shards),
                                     wide=precision == "packed")
    tile_n = tile_n or auto_tile_n
    n_local = round_up(cdiv(n, num_shards), tile_n)
    n_pad = n_local * num_shards
    candidates = _build_fused_candidates(m_local, n_local, k,
                                         tile_m, tile_n, soa=True,
                                         precision=precision)

    cutoff = select_cutoff(precision, k)

    def shard_fn(q_local, r_local):
        # q_local: (m_local, k); r_local: (n_local, k)
        cand = candidates(q_local, r_local)            # (m_local, 128) local idx
        idx, d2 = _refine(q_local, r_local, cand, n_local, cutoff=cutoff)
        # Global index rebase, per query row (core.cu:931-933 done right):
        # shards are laid out [dcn-major, sp-minor] along n.
        shard_id = jax.lax.axis_index("sp").astype(jnp.int32)
        if has_dcn:
            shard_id = shard_id + jax.lax.axis_index("dcn").astype(jnp.int32) * sp
        gidx = idx + shard_id * n_local
        # Stage 1: ICI within the slice; stage 2: DCN across slices.
        d2, gidx = min_index_allreduce(d2, gidx, "sp", method=method)
        if has_dcn:
            d2, gidx = min_index_allreduce(d2, gidx, "dcn", method=method)
        return gidx, d2

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("dp", None), P(ref_axes, None)),
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )

    @jax.jit
    def run(search, ref):
        q = jnp.pad(search, ((0, m_pad - m), (0, 0)))
        if not prepadded:
            ref = jnp.pad(ref, ((0, n_pad - n), (0, 0)),
                          constant_values=PAD_VALUE)
        idx, d2 = mapped(q, ref)
        return idx[:m], d2[:m]

    return run


def sharded_layout(n: int, k: int, mesh: Mesh, m_hint: int = 1024):
    """The (tile_n, n_local, n_pad) a prepared reference array must use to
    enter _build_sharded(prepadded=True) — MUST mirror _build_sharded's
    tile selection exactly."""
    from tpu_knn.kernels.fused import auto_precision

    num_shards = mesh.shape["sp"] * mesh.shape.get("dcn", 1)
    _, tile_n = pick_tiles(k, round_up(m_hint, mesh.shape["dp"] * 8) // mesh.shape["dp"],
                           cdiv(n, num_shards),
                           wide=auto_precision(k, n) == "packed")
    n_local = round_up(cdiv(n, num_shards), tile_n)
    return tile_n, n_local, n_local * num_shards


@functools.lru_cache(maxsize=None)
def _build_sharded_topk(m: int, n: int, k: int, kk: int, mesh: Mesh,
                        topk_method: str = "auto",
                        n_local: int | None = None,
                        prepadded: bool = False,
                        precision: str | None = None):
    """Mesh-sharded exact top-K: per-shard single-chip top-K engine
    (kernels/topk.py — the sweep/seeded/banded engine by its own m*K
    rule), global index rebase, then a top-K merge allreduce
    (collectives.py) staged sp-then-dcn like the 1-NN reduction.

    prepadded (NNIndex's build-once path, VERDICT r2 item 4): the
    reference arrives as TWO device-resident prepared operands — the
    PAD_VALUE-padded (num_shards * n_local, k) AoS array sharded over
    the reference axes (exact-rerank row gathers) and its zero-k-padded
    (k_pad, num_shards * n_local) SoA transpose sharded on the lane axis
    (the scan operand) — so a query re-pads, re-transposes, and
    re-transfers NOTHING (the v8 shard-once structure, core.cu:873-933,
    carried through to top-K serving). ``n_local`` then fixes the
    per-shard width (the prepared layout's, not this builder's choice).
    """
    from tpu_knn.distributed.collectives import topk_allreduce
    from tpu_knn.kernels.fused import auto_precision
    from tpu_knn.kernels.topk import _build_topk, _sweep_tiles, _auto_method
    from tpu_knn.kernels.tuning import pick_tiles

    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    dcn = mesh.shape.get("dcn", 1)
    has_dcn = "dcn" in mesh.shape
    ref_axes = ("dcn", "sp") if has_dcn else ("sp",)
    num_shards = dcn * sp
    m_pad = round_up(m, dp * 8)
    m_local = m_pad // dp
    if precision is None:
        precision = auto_precision(k, n)
    method = (_auto_method(m_local, kk)
              if topk_method == "auto" else topk_method)
    if n_local is None:
        if method == "sweep":
            _, tile_n = _sweep_tiles(k, m_local, cdiv(n, num_shards), kk,
                                     precision)
        else:
            _, tile_n = pick_tiles(k, m_local, cdiv(n, num_shards))
        n_local = round_up(cdiv(n, num_shards), tile_n)
    elif n_local * num_shards < n or n_local % 128 != 0:
        raise ValueError(f"prepared n_local={n_local} incompatible with "
                         f"n={n} over {num_shards} shards")
    # A shard narrower than K contributes its clamped local list
    # inf-padded to the merge width — exact, because a truncated-at-
    # n_local list already holds every local point (review r11: raising
    # here crashed documented-valid K <= min(n, 512) calls and
    # query_radius escalation whenever small n made n_local < K).
    kk_local = min(kk, n_local)
    n_pad = n_local * num_shards
    k_pad = round_up(k, 8)
    # The LOCAL valid count is n_local everywhere: trailing-shard padding
    # rows carry PAD_VALUE, whose exact diff-form distance is +inf — they
    # can enter a shard's local list only when the shard has fewer than K
    # real rows, and then lose the global merge to finite candidates
    # (sum over shards of finite candidates >= min(n, K) >= K).
    local_run = _build_topk(m_local, n_local, k, kk_local, n_local,
                            precision, method)

    def shard_fn(q_local, r_local, r_op_local=None):
        if r_op_local is None:   # per-call path: in-shard SoA transpose
            r_op_local = (r_local.T if k_pad == k
                          else jnp.pad(r_local, ((0, 0), (0, k_pad - k))).T)
        idx, d2 = local_run(q_local, (r_op_local,), r_local)
        shard_id = jax.lax.axis_index("sp").astype(jnp.int32)
        if has_dcn:
            shard_id = shard_id + jax.lax.axis_index("dcn").astype(jnp.int32) * sp
        gidx = jnp.where(idx >= 0, idx + shard_id * n_local,
                         np.int32(2**31 - 1))
        if kk_local < kk:   # clamped local list -> merge width
            pad = ((0, 0), (0, kk - kk_local))
            gidx = jnp.pad(gidx, pad, constant_values=np.int32(2**31 - 1))
            d2 = jnp.pad(d2, pad, constant_values=jnp.inf)
        d2, gidx = topk_allreduce(d2, gidx, "sp", kk)
        if has_dcn:
            d2, gidx = topk_allreduce(d2, gidx, "dcn", kk)
        return gidx, d2

    in_specs = [P("dp", None), P(ref_axes, None)]
    if prepadded:
        in_specs.append(P(None, ref_axes))
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )

    if prepadded:
        @jax.jit
        def run(search, ref, r_ops):
            q = jnp.pad(search, ((0, m_pad - m), (0, 0)))
            idx, d2 = mapped(q, ref, r_ops)
            return idx[:m], d2[:m]
    else:
        @jax.jit
        def run(search, ref):
            q = jnp.pad(search, ((0, m_pad - m), (0, 0)))
            ref = jnp.pad(ref, ((0, n_pad - n), (0, 0)),
                          constant_values=PAD_VALUE)
            idx, d2 = mapped(q, ref)
            return idx[:m], d2[:m]

    return run


def sharded_topk_knn(search, ref, neighbors: int, *,
                     mesh: Mesh | None = None, method: str = "auto"):
    """Mesh-sharded exact top-K (the serving extension, kernels/topk.py,
    over the v8-style reference sharding). Returns (idx (m, K) i32,
    d2 (m, K) f32) device arrays, rows ascending by exact (d2, index).
    `method` picks the per-shard engine ("sweep"/"passes"/"auto")."""
    from tpu_knn.kernels.topk import PASSES_MAX_NEIGHBORS

    search = jnp.asarray(search, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    m, k = search.shape
    n = ref.shape[0]
    if not (1 <= neighbors <= min(n, PASSES_MAX_NEIGHBORS)):
        raise ValueError(
            f"neighbors must be in [1, min(n, {PASSES_MAX_NEIGHBORS})] "
            f"= [1, {min(n, PASSES_MAX_NEIGHBORS)}], got {neighbors}")
    if mesh is None:
        mesh = default_mesh()
    run = _build_sharded_topk(m, n, k, neighbors, mesh, method)
    return run(search, ref)


def sharded_knn(search, ref, *, mesh: Mesh | None = None,
                method: str = "pmin"):
    """Mesh-sharded exact 1-NN. Returns (idx (m,), d2 (m,)) device arrays."""
    search = jnp.asarray(search, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    m, k = search.shape
    n = ref.shape[0]
    if mesh is None:
        mesh = default_mesh()
    run = _build_sharded(m, n, k, mesh, method)
    return run(search, ref)


def int8_sharded_layout(n: int, mesh: Mesh) -> tuple[int, int]:
    """(n_local, n_pad) for an int8 grid sharded over the mesh's
    reference axes. 128-row granularity (lane width of the score
    vectors); pad rows are EXCLUDED POSITIONALLY at query time — an
    int8 pad value cannot be made to lose (every grid value is a legal
    point), unlike the f32 path's PAD_VALUE rows."""
    num_shards = mesh.shape["sp"] * mesh.shape.get("dcn", 1)
    n_local = round_up(cdiv(n, num_shards), 128)
    return n_local, n_local * num_shards


def _shard_id_and_live(n: int, n_local: int, sp: int, has_dcn: bool):
    """(global shard id, live row count) for the executing shard —
    [dcn-major, sp-minor] layout along n, ragged tail masked by count."""
    shard_id = jax.lax.axis_index("sp").astype(jnp.int32)
    if has_dcn:
        shard_id = (shard_id
                    + jax.lax.axis_index("dcn").astype(jnp.int32) * sp)
    live = jnp.clip(n - shard_id * n_local, 0, n_local)
    return shard_id, live


@functools.lru_cache(maxsize=None)
def _build_sharded_int8(m: int, n: int, k: int, n_local: int, mesh: Mesh,
                        method: str = "pmin", cutoff_scale: float = 1.0):
    """Mesh-sharded exact 1-NN over an int8 GRID — the capacity tier
    multiplied by the slice: each shard holds only its (n_local, k)
    int8 rows (the single-chip ladder's 2^28-points-per-16GB-chip,
    docs/PERF_NOTES.md "int8 grid storage", times the shard count).

    Queries arrive ALREADY in grid space (NNIndex._i8_q transforms);
    outputs are grid-space d2 (the caller rescales by s^2). Two regimes,
    mirroring the single-chip int8 routes:

    - m <= 4: the zero-prep masked AoS diff-form scan straight off the
      int8 shard (no f32 materialization — the capacity contract), pad
      rows excluded positionally (masked=True).
    - m > 4: per-shard f32 upcast with pad rows set to PAD_VALUE,
      feeding the standard fused candidates + exact refine pipeline —
      the same per-call-operand memory contract as the single-chip
      batch route (_i8_ops), with the selection certificate rescaled to
      grid units via ``cutoff_scale`` (= 1/s^2).

    Reduction: global index rebase + the min-index allreduce, exactly
    the f32 _build_sharded staging (sp over ICI, then dcn)."""
    from tpu_knn.kernels.fused import auto_precision
    from tpu_knn.kernels.smallm import SMALLM_MAX_M, _build_aos_scan

    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    has_dcn = "dcn" in mesh.shape
    ref_axes = ("dcn", "sp") if has_dcn else ("sp",)
    small = m <= SMALLM_MAX_M * dp
    m_pad = round_up(m, dp) if small else round_up(m, dp * 8)
    m_local = m_pad // dp
    if small:
        scan = _build_aos_scan(m_local, n_local, k, masked=True)
    else:
        precision = auto_precision(k, n)
        if precision == "bf16x3":
            precision = "qsplit2"   # the upcast grid is bf16-exact
        tile_m, tile_n = pick_tiles(k, m_local, n_local,
                                    wide=precision == "packed")
        tile_n = min(tile_n, n_local)
        while n_local % tile_n != 0:
            tile_n -= 128
        candidates = _build_fused_candidates(m_local, n_local, k,
                                             tile_m, tile_n, soa=True,
                                             precision=precision)
        cutoff = select_cutoff(precision, k) * cutoff_scale

    def shard_fn(q_local, g_local):
        shard_id, live = _shard_id_and_live(n, n_local, sp, has_dcn)
        if small:
            idx, d2 = scan(q_local, g_local, live)
        else:
            row = jax.lax.broadcasted_iota(jnp.int32, g_local.shape, 0)
            r32 = jnp.where(row < live, g_local.astype(jnp.float32),
                            PAD_VALUE)
            cand = candidates(q_local, r32)
            idx, d2 = _refine(q_local, r32, cand, n_local, cutoff=cutoff)
        gidx = idx + shard_id * n_local
        d2, gidx = min_index_allreduce(d2, gidx, "sp", method=method)
        if has_dcn:
            d2, gidx = min_index_allreduce(d2, gidx, "dcn", method=method)
        return gidx, d2

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("dp", None), P(ref_axes, None)),
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )

    @jax.jit
    def run(search_grid, grid):
        q = jnp.pad(search_grid, ((0, m_pad - m), (0, 0)))
        idx, d2 = mapped(q, grid)
        return idx[:m], d2[:m]

    return run


@functools.lru_cache(maxsize=None)
def _build_sharded_int8_topk(m: int, n: int, k: int, kk: int,
                             n_local: int, mesh: Mesh):
    """Mesh-sharded exact top-K over an int8 grid: per-shard local top-K
    in grid space, global rebase, top-K merge allreduce (sp then dcn).
    Same regime split as _build_sharded_int8: m <= 4 runs the masked
    AoS cell engine straight off the int8 shard; larger batches upcast
    per call (pad rows -> PAD_VALUE, +inf scores) and run the standard
    batch top-K engine."""
    from tpu_knn.distributed.collectives import topk_allreduce
    from tpu_knn.kernels.fused import auto_precision
    from tpu_knn.kernels.smallm import SMALLM_MAX_M
    from tpu_knn.kernels.topk import (
        MAX_NEIGHBORS, _auto_method, _build_aos_topk, _build_topk,
    )
    from tpu_knn.utils.shapes import round_up as _ru

    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    has_dcn = "dcn" in mesh.shape
    ref_axes = ("dcn", "sp") if has_dcn else ("sp",)
    # A shard holding fewer than K rows simply contributes its WHOLE
    # local point set (clamped local list, inf-padded to the merge
    # width): a truncated-at-n_local list already contains every local
    # point, so the global merge stays exact. Raising here instead
    # would crash documented-valid K <= min(n, 512) calls — and
    # query_radius's cap escalation — whenever int8_sharded_layout's
    # 128-row granularity makes n_local small (review r11).
    kk_local = min(kk, n_local)
    small = m <= SMALLM_MAX_M * dp and kk_local <= MAX_NEIGHBORS
    m_pad = round_up(m, dp) if small else round_up(m, dp * 8)
    m_local = m_pad // dp
    if small:
        local_run = _build_aos_topk(m_local, n_local, k, kk_local,
                                    masked=True)
    else:
        precision = auto_precision(k, n)
        if precision == "bf16x3":
            precision = "qsplit2"   # the upcast grid is bf16-exact
        local_run = _build_topk(m_local, n_local, k, kk_local, n_local,
                                precision, _auto_method(m_local, kk_local))

    def shard_fn(q_local, g_local):
        shard_id, live = _shard_id_and_live(n, n_local, sp, has_dcn)
        if small:
            idx, d2 = local_run(q_local, g_local, live)
        else:
            row = jax.lax.broadcasted_iota(jnp.int32, g_local.shape, 0)
            r32 = jnp.where(row < live, g_local.astype(jnp.float32),
                            PAD_VALUE)
            k_pad = _ru(k, 8)
            r_op = (r32.T if k_pad == k
                    else jnp.pad(r32, ((0, 0), (0, k_pad - k))).T)
            idx, d2 = local_run(q_local, (r_op,), r32)
        # Dead rows (idx < 0, masked live < K, or +inf) lose the merge.
        dead = (idx < 0) | jnp.isinf(d2)
        gidx = jnp.where(dead, np.int32(2**31 - 1),
                         idx + shard_id * n_local)
        d2 = jnp.where(dead, jnp.inf, d2)
        if kk_local < kk:   # pad the clamped list to the merge width
            pad = ((0, 0), (0, kk - kk_local))
            gidx = jnp.pad(gidx, pad, constant_values=np.int32(2**31 - 1))
            d2 = jnp.pad(d2, pad, constant_values=jnp.inf)
        d2, gidx = topk_allreduce(d2, gidx, "sp", kk)
        if has_dcn:
            d2, gidx = topk_allreduce(d2, gidx, "dcn", kk)
        return gidx, d2

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("dp", None), P(ref_axes, None)),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )

    @jax.jit
    def run(search_grid, grid):
        q = jnp.pad(search_grid, ((0, m_pad - m), (0, 0)))
        idx, d2 = mapped(q, grid)
        idx = jnp.where(idx == np.int32(2**31 - 1), -1, idx)
        return idx[:m], d2[:m]

    return run


def v8_callback(k, m, n, search, ref):
    idx, _ = sharded_knn(search, ref)
    return np.asarray(jax.device_get(idx), dtype=np.int32)


def _v8_guard(k: int, m: int, n: int) -> bool:
    # Delegate like the reference: 1 device or small n -> v7
    # (core.cu:865-872). Also require at least one point per shard.
    num = len(jax.devices())
    return num > 1 and not _small_n(k, m, n) and n >= num


register_version(
    "v8",
    v8_callback,
    "multi-chip reference-set sharding: shard_map over a (dp, sp) mesh, "
    "per-shard fused kernel + exact refine, min-index allreduce over ICI "
    "(reference v8, core.cu:790-959)",
    guard=_v8_guard,
    fallback="v7",
)
