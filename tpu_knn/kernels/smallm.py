"""Small-batch (m <= 4) diff-form VPU streaming 1-NN kernel.

The reference's m=1 problem (v7's whole reason to exist, core.cu:644-789:
a single query must still saturate the machine) is bandwidth-bound on TPU:
at m=1 the scan must read the whole reference set once and does almost no
arithmetic. The fused MXU kernel (fused.py) is the wrong tool there — its
packed dot spends ~16x redundant per-element VPU work on bf16 splits and
term concatenation while the MXU runs at 8/128-row utilization. This
kernel is the m-small specialization:

- DIFF-FORM VPU scores: exact f32 (r - q)^2 sums per reference column —
  ~3*k_pad VPU ops per operand element per query, no MXU pass, no bf16
  splits, no norm trick — so there is no catastrophic-cancellation term
  and candidate scores are already at oracle conditioning.
- SAME SoA (k_pad, n_pad) operand as the fused kernel: k on sublanes, n
  on lanes. This is also the hardware-natural layout — XLA stores
  (n, k<=16) f32 arrays column-major ({0,1} minor-to-major) on TPU, and
  any AoS-side repacking is a full relayout copy (a lane-packed variant
  was measured into an 8 GB padded-layout blowup at (2^24, 3); see
  docs/PERF_NOTES.md). Reusing the fused operand also means NNIndex's
  prepared `r_ops` serves both kernels with zero extra HBM.
- The running (best, index) pair is a per-lane (1, 128) row per query in
  VMEM scratch, folded with the shared `_fold_scores` (strict <, earliest
  column wins = lowest reference index per lane slot — v0's tie rule,
  core.cu:50-54). The final cross-lane selection is the shared exact
  rerank (fused._exact_rerank).

Applicability: 1 <= m <= 4 and k <= 32 — exactly the regime where the
packed single-pass dot also applies, so the prepared operand is always
the plain f32 SoA array. fused_knn routes here automatically; explicit
tile/precision overrides keep the MXU path (measurement intent).

Round 3 split the regime in two (measurements in _build_aos_scan):

- PER-CALL (caller hands an (n, k) AoS array): the zero-prep XLA
  diff-form scan — XLA fuses the whole reduction into one roofline pass
  over the AoS array, so the former ~3.5 ms pad+transpose prep vanishes
  outright (ds9-shaped per-call: 8.5 -> ~1.6 ms).
- PREPARED (NNIndex, operand built once): this Pallas kernel for
  k >= 8; at k < 8 even the prepared path routes to the AoS scan over
  the index's resident ref array — the SoA operand's sublane padding
  reads round_up(k,8)/k times the necessary bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_knn.utils.platform import interpret_mode
from tpu_knn.utils.shapes import round_up

_I32_MAX = np.int32(2**31 - 1)

#: Largest batch the kernel serves; beyond this the per-query VPU sweep
#: (~3*k_pad ops per operand element per query) loses to the MXU path.
SMALLM_MAX_M = 4

#: Largest k (matches the packed dot's fit: 4 * round_up(k, 8) <= 128, so
#: NNIndex's prepared operand is always the plain f32 SoA array here).
SMALLM_MAX_K = 32

#: Reference-tile VMEM budget in f32 elements (k_pad * tile_n); 2 MB per
#: buffer leaves room for double buffering plus the per-query diff temp.
OPERAND_BUDGET = 1 << 19


def pick_tile_n(k: int, n: int) -> int:
    """Widest tile inside the VMEM budget (bandwidth-bound: wider is
    better; measured on v5e, 65536 > 32768 > 16384 > 8192 at k=3 n=2^24)."""
    k_pad = round_up(k, 8)
    tile_n = min(1 << 16, OPERAND_BUDGET // k_pad)
    tile_n = min(tile_n, round_up(n, 128))
    return max(128, (tile_n // 128) * 128)


def _smallm_kernel(q_ref, r_ref, out_i_ref, out_s_ref, best_s, best_i, *,
                   m: int, n: int, tile_n: int, n_tiles: int):
    from tpu_knn.kernels.fused import _fold_scores

    j = pl.program_id(0)
    ragged = n_tiles * tile_n != n

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, jnp.inf)
        best_i[:] = jnp.full_like(best_i, _I32_MAX)

    # (k_pad, tile_n); zero-padded rows are distance-neutral. bf16-stored
    # operands (NNIndex store="bf16") upcast at the read: the diff-form
    # arithmetic below is then f32-exact over the quantized points.
    r = r_ref[:].astype(jnp.float32)
    for i in range(m):
        diff = r - q_ref[:, i:i + 1]
        s = jnp.sum(diff * diff, axis=0, keepdims=True)  # (1, tile_n) exact
        if ragged:
            col = (jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
                   + j * tile_n)
            s = jnp.where(col < n, s, jnp.inf)
        cur_s, cur_i = _fold_scores(s, j * tile_n,
                                    best_s[i:i + 1, :], best_i[i:i + 1, :])
        best_s[i:i + 1, :] = cur_s
        best_i[i:i + 1, :] = cur_i

    @pl.when(j == n_tiles - 1)
    def _():
        out_i_ref[:] = best_i[:]
        out_s_ref[:] = best_s[:]


@functools.lru_cache(maxsize=None)
def _build_smallm_candidates(m: int, n: int, k: int,
                             tile_n: int | None = None):
    """(search (m,k), (SoA ref operand,)) -> (m, 128) candidate indices.

    The operand contract matches fused's prep_soa output: (k_pad, n_ops)
    f32 with k_pad = round_up(k, 8) and n_ops >= n any lane padding (the
    kernel masks columns >= n, so an operand padded for a DIFFERENT tiling
    — e.g. NNIndex's — is served as-is). ``prep`` builds one from an
    (n, k) array.
    """
    if not (1 <= m <= SMALLM_MAX_M):
        raise ValueError(
            f"smallm kernel serves 1 <= m <= {SMALLM_MAX_M}, got {m}")
    if not (1 <= k <= SMALLM_MAX_K):
        raise ValueError(
            f"smallm kernel serves 1 <= k <= {SMALLM_MAX_K}, got {k}")
    if tile_n is None:
        tile_n = pick_tile_n(k, n)
    if tile_n % 128 != 0 or tile_n <= 0:
        raise ValueError(f"tile_n must be a positive multiple of 128, "
                         f"got {tile_n}")
    k_pad = round_up(k, 8)
    n_pad = round_up(n, tile_n)
    n_tiles = n_pad // tile_n
    m_out = 8  # one sublane group of output rows; top m are real

    call = pl.pallas_call(
        functools.partial(_smallm_kernel, m=m, n=n, tile_n=tile_n,
                          n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k_pad, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((m_out, 128), lambda j: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((m_out, 128), jnp.int32),
                   jax.ShapeDtypeStruct((m_out, 128), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((m_out, 128), jnp.float32),
            pltpu.VMEM((m_out, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * m * n_pad * k_pad,
            bytes_accessed=n_pad * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )

    def prep(ref):
        """(n, k) f32 -> the (k_pad, n_pad) SoA operand (= fused prep_soa)."""
        return (jnp.pad(ref, ((0, n_pad - n), (0, k_pad - k))).T,)

    def candidates(search, ref_ops):
        (r_op,) = ref_ops
        if r_op.shape[0] != k_pad or r_op.shape[1] < n:
            raise ValueError(
                f"operand shape {r_op.shape} does not cover (k_pad={k_pad}, "
                f"n={n})")
        if r_op.shape[1] != n_pad:
            # Serve an operand padded for a different tiling (NNIndex's):
            # rebuild this geometry at the widest tile dividing its width.
            width = r_op.shape[1]
            t = min(tile_n, width)
            while width % t != 0:
                t -= 128
            if round_up(n, t) != width:
                raise ValueError(
                    f"operand width {width} incompatible with n={n} at any "
                    f"tile <= {tile_n}")
            return _build_smallm_candidates(m, n, k, tile_n=t)(
                search, ref_ops)
        q = jnp.pad(search.T, ((0, k_pad - k), (0, 128 - m)))
        ci, cs = call(q, r_op)
        return ci[:m], cs[:m]

    candidates.prep = prep
    candidates.tile_n = tile_n
    return candidates


@functools.lru_cache(maxsize=None)
def _build_smallm(m: int, n: int, k: int, tile_n: int | None = None):
    """Per-call pipeline: SoA layout + candidates + exact refinement in
    one jit (single device dispatch). Kept for measurement intent
    (explicit tile_n) — the shipping per-call path is _build_aos_scan."""
    from tpu_knn.kernels.fused import _refine, select_cutoff

    cand = _build_smallm_candidates(m, n, k, tile_n)
    cutoff = select_cutoff("exact", k)  # diff-form scores: always certified

    @jax.jit
    def run(search, ref):
        return _refine(search, ref, cand(search, cand.prep(ref)), n,
                       cutoff=cutoff)

    return run


#: k below which the AoS scan also beats the PREPARED Pallas kernel:
#: the SoA operand pads k to a sublane multiple of 8, so at k < 8 the
#: prepared scan reads round_up(k,8)/k times the bytes of the raw AoS
#: array (measured at (2^24, 3): prepared 0.773 ms vs AoS 0.432).
AOS_SCAN_MAX_KPAD_WASTE_K = 8


@functools.lru_cache(maxsize=None)
def _build_aos_scan(m: int, n: int, k: int, masked: bool = False):
    """Zero-prep per-call small-m scan: plain XLA diff-form over the
    caller's (n, k) AoS array.

    The round-2 per-call path paid a ~3.5 ms pad+transpose relayout at
    (2^24, 16) before a 1.5 ms scan (docs/PERF_NOTES.md "Per-call prep
    transpose"; the reference pays the same transform as a device kernel,
    core.cu:315-330). Measured (scripts/r4_probe_percall.py, v5e): XLA
    fuses (ref - q)^2 -> sum -> min/argmin into a single pass over the
    narrow-minor-dim array at HBM roofline — m=1 k=16 n=2^24: 1.574 ms
    (the prepared Pallas scan: 1.538) and k=3: 0.432 ms (BEATS the
    prepared scan's 0.773: the SoA operand pads k 3->8 and reads 2.7x
    the bytes). No Pallas, no relayout, no padding.

    Exactness/ties: diff-form scores are exact f32 (oracle
    conditioning); jnp.argmin returns the FIRST minimum = lowest
    reference index (v0's tie rule, core.cu:50-54). +inf rows (mutable
    index PAD/tombstone slots) self-exclude as in the dense path.

    masked=True adds a dynamic ``live`` scalar argument: rows at index
    >= live score +inf (the mask fuses into the scan's single pass).
    Needed when +inf pad rows are IMPOSSIBLE — an int8 grid shard's pad
    rows are legal points in every value (distributed/sharded.py:
    _build_sharded_int8), so exclusion must be positional.
    """

    @jax.jit
    def run(search, ref, live=None):
        def mask(s, axis_len):
            if not masked:
                return s
            iota = jax.lax.iota(jnp.int32, axis_len)
            if s.ndim == 2:
                iota = iota[None, :]
            return jnp.where(iota < live, s, jnp.inf)

        if m == 1:
            # 1-D graph, exactly the probe's shape: a (1, n) score row
            # re-pays ~0.5 ms over the 1-D (n,) form (measured — the 2-D
            # row gets the (8,128)-tiled layout, 8x the score bytes).
            d = ref - search[0]
            s = mask(jnp.sum(d * d, axis=-1), n)      # (n,)
            j = jnp.argmin(s)
            return j[None].astype(jnp.int32), s[j][None]
        d = ref[None, :, :] - search[:, None, :]      # fused, never
        s = jnp.sum(d * d, axis=-1)                   # materialized (m,n,k)
        s = mask(s, n)
        idx = jnp.argmin(s, axis=1).astype(jnp.int32)
        # Read the winners' d2 out of the score array rather than
        # returning jnp.min(s): a SECOND reduction over the same fused
        # producer makes XLA run the whole scan twice (measured: k=3
        # 0.96 ms vs 0.43 single-pass). The read must be per-row
        # DYNAMIC-SLICES (m <= 4, unrolled): a take_along_axis gather
        # here forces s into a separate fusion and re-pays the whole
        # scan (+0.52 ms, measured), while dynamic slices leave argmin
        # + s in one multi-output fusion. Gathering from `ref` instead
        # would skip s entirely but crashes the AOT compile helper at
        # m=1.
        d2 = jnp.stack([s[r, idx[r]] for r in range(m)])
        return idx, d2

    return run


def smallm_knn(search, ref, *, tile_n: int | None = None):
    """Small-batch exact 1-NN: (m<=4, k<=32) queries against (n, k) refs.

    Returns (indices (m,) i32, exact squared distances (m,) f32); same
    contract and tie semantics as fused_knn (lowest index among exact
    ties), with candidate selection already at diff-form conditioning.
    The default path is the zero-prep AoS scan (_build_aos_scan); an
    explicit tile_n keeps the Pallas SoA pipeline (measurement intent).
    """
    search = jnp.asarray(search, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    m, k = search.shape
    n = ref.shape[0]
    if tile_n is None:
        if not (1 <= m <= SMALLM_MAX_M):
            raise ValueError(
                f"smallm serves 1 <= m <= {SMALLM_MAX_M}, got {m}")
        return _build_aos_scan(m, n, k)(search, ref)
    run = _build_smallm(m, n, k, tile_n)
    return run(search, ref)


def smallm_applicable(m: int, k: int, n: int) -> bool:
    """Dispatch predicate: the regime where this kernel beats the fused
    MXU path (small batch, any n, k within the packed-operand range)."""
    return 1 <= m <= SMALLM_MAX_M and 1 <= k <= SMALLM_MAX_K and n >= 1


def aos_scan_applicable(m: int, k: int, n: int) -> bool:
    """Dispatch predicate for the HIGH-DIMENSION small-batch regime
    (embedding-scale k): the Pallas smallm kernel caps at k <= 32 and
    the fused MXU pipeline's operand-budget tiles shrink to 128-256
    lanes at k_pad >= 512, where the stream runs far below HBM
    bandwidth (measured m=1 k=768 n=2^20: fused 37.4 ms vs the ~5 ms
    read floor — scripts/r14_probe_highk.py). The plain-XLA AoS scan
    has no k limit and stays at roofline (one fused diff-form pass per
    row), so small batches above the smallm range route here."""
    return 1 <= m <= SMALLM_MAX_M and k > SMALLM_MAX_K and n >= 1
