"""NNIndex — the build-once / query-many serving API.

The reference contract pays every preparation cost inside each call: v4
re-transposes the reference set per query batch (core.cu:894-900), v9/v10
rebuild the KD-tree per call (core.cu:1030, 1181) — and its own report
separates build from query time because that's the number a serving system
cares about (README.md:334-343). NNIndex makes the split first-class:

    index = NNIndex(ref, strategy="fused")       # pay layout/build once
    idx, d2 = index.query(search)                # hot path

Strategies:
- "fused":   reference set uploaded once and kept device-resident in the
             SoA (k_pad, n_pad) layout the Pallas kernel wants; queries
             skip the per-call pad+transpose entirely.
- "auto":    fused preparation always; additionally builds the projection
             index when the v11 niche applies (k <= 8) AND a build-time
             probe of the certification bound's hit rate on synthetic
             in-distribution queries clears 90%. Each query batch then
             routes to the projection window pipeline where its cost
             model wins (small m, large n), falling back to the fused
             scan per batch otherwise — the "best version per regime"
             dispatcher philosophy (reference core.cu:1282-1297) applied
             at serving time, where the index build is already paid.
- "kdtree":  host KD-tree built once; implicit-heap arrays device-resident;
             batched TPU traversal per query batch (k <= 8), native CPU
             query otherwise.
- "projection": reference set sorted once by its max-variance axis (v11);
             queries scan dense windows with a provable exactness bound
             and full-scan fallback — the TPU-native spatial index.
- "sharded": reference set sharded over a (dp, sp) mesh once via
             device_put; queries run the v8 shard_map pipeline with no
             per-call resharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_knn.kernels.fused import DEFAULT_PRECISION, _build_fused_candidates
from tpu_knn.kernels.tuning import pick_tiles
from tpu_knn.utils.shapes import round_up


@functools.lru_cache(maxsize=None)
def _build_smallm_prepared(m: int, n: int, k: int, aos_ok: bool = True):
    """Small-batch prepared pipeline: the diff-form VPU kernel
    (kernels/smallm.py) against the SAME SoA operand as the fused path —
    the m<=4 regime where the MXU's packed-dot prep work is all overhead.

    At k < 8 and m == 1 the SoA operand's sublane padding reads
    round_up(k,8)/k times the necessary bytes, so the AoS scan over the
    index's resident ref array wins even prepared (measured at
    (2^24,3): 0.452 vs 0.773 ms — smallm._build_aos_scan). The AoS scan
    is linear in m (per-row roofline reads), so m >= 2 keeps the Pallas
    kernel's one-scan-for-all-rows shape. PAD/tombstone +inf rows
    self-exclude exactly as in the dense path. ``aos_ok=False``
    (filtered views, whose shared ref_dev is NOT masked) forces the
    masked-operand Pallas path at every m."""
    from tpu_knn.kernels.smallm import (
        AOS_SCAN_MAX_KPAD_WASTE_K, SMALLM_MAX_K, _build_aos_scan,
        _build_smallm_candidates,
    )

    if k > SMALLM_MAX_K and not aos_ok:
        # Filtered views at embedding-scale k: neither small-m engine
        # can serve (the Pallas kernel caps at k <= 32; the AoS scan
        # would read the shared UNMASKED ref_dev) — the caller must
        # keep the masked-operand fused pipeline.
        raise ValueError(
            f"smallm prepared route needs k <= {SMALLM_MAX_K} or an "
            f"AoS-maskable index, got k={k} with aos_ok=False")
    if (k < AOS_SCAN_MAX_KPAD_WASTE_K and m == 1 and aos_ok) \
            or k > SMALLM_MAX_K:
        scan = _build_aos_scan(m, n, k)

        @jax.jit
        def run_aos(search, r_ops, ref_aos):
            return scan(search, ref_aos)

        return run_aos
    from tpu_knn.kernels.fused import _refine, select_cutoff

    candidates = _build_smallm_candidates(m, n, k)
    cutoff = select_cutoff("exact", k)  # diff-form scores

    @jax.jit
    def run(search, r_ops, ref_aos):
        return _refine(search, ref_aos, candidates(search, r_ops), n,
                       cutoff=cutoff)

    return run


@functools.lru_cache(maxsize=None)
def _build_prepared_query(m: int, n: int, k: int, tile_m: int, tile_n: int,
                          precision: str = DEFAULT_PRECISION,
                          cutoff_scale: float = 1.0):
    """Query pipeline against a prepared (k_pad, n_pad) SoA array — the
    same candidate kernel as v4 (prepadded_soa skips pad+transpose).

    ``cutoff_scale`` rescales the certified top-T selection cutoff for
    callers whose coordinate space is a scaled embedding of the user's
    (store="int8" queries run in integer grid space, where score
    magnitudes AND resolvable distance gaps both scale by 1/s^2 — the
    certificate's absolute-error budget must scale with them)."""
    from tpu_knn.kernels.fused import _refine, select_cutoff

    candidates = _build_fused_candidates(m, n, k, tile_m, tile_n, soa=True,
                                         precision=precision,
                                         prepadded_soa=True)
    cutoff = select_cutoff(precision, k) * cutoff_scale

    @jax.jit
    def run(search, r_ops, ref_aos):
        cand = candidates(search, r_ops)
        # Exact refinement gathers rows from the AoS copy: a lane-axis
        # gather from the SoA array is strided and measured ~2.7 ms slower
        # at m=1024 than the row gather.
        return _refine(search, ref_aos, cand, n, cutoff=cutoff)

    return run


#: Sentinel coordinate for empty/removed slots in a mutable index: its
#: exact diff-form distance to any in-contract query overflows f32 to
#: +inf and its norm-trick score is +inf, so every kernel (fused fold,
#: small-m diff form, top-K state) excludes the slot with NO masking —
#: updates therefore never change compiled geometry. Same constant, same
#: reasoning as the sharded path's shard padding (distributed/sharded.py).
PAD_VALUE = 1e30


class NNIndex:
    def __init__(self, ref, strategy: str = "fused", mesh=None,
                 precision: str | None = None, mutable: bool = False,
                 capacity: int | None = None, store: str = "float32",
                 metric: str = "l2", _pretransformed: bool = False):
        """store="bf16" (fused strategy only): quantize the reference
        points ONCE to bfloat16 at build. Queries remain EXACT — every
        kernel upcasts at the read site and computes f32 diff-form
        distances — but over the QUANTIZED point set (coordinates carry
        8 significand bits; for unit-scale data that perturbs each
        coordinate by <= ~2^-9 relative). The trade: half the index HBM
        (so 2x the points per chip) and ~2x the read-bound small-batch
        scan paths (measured: scripts/r8_probe_bf16.py). Queries are
        still f32; ties still break to the lowest index among exact-
        equal f32 distances over the stored points.

        store="int8" (fused or sharded, immutable, l2): quantize ONCE
        onto an affine int8 grid p = z + s*g (per-dim zero offsets z,
        one global scale s covering the data's widest half-range in 127
        steps). The ONLY resident state is the (n, k) int8 grid — 4x
        less HBM than f32 (4x the points per chip; strategy="sharded"
        multiplies that by the slice) — and queries run
        the existing exact engines in GRID space on the transformed
        query q' = (q - z)/s: selection, top-K order, and the v0
        lowest-index tie rule are exact over the stored grid points
        (grid integers are exact in f32/bf16 at every read site), with
        reported d2 rescaled by s^2 (monotone). The query transform
        rounds q' once per coordinate — the same query-side rounding
        metric="cosine" accepts. Measured: m=1 1-NN 0.50 ms and top-16
        0.88 ms at (16, 1, 2^24) vs 0.82/1.26 bf16 (read-bound AoS
        scans at the 4x-smaller footprint; scripts/r10_probe_int8.py);
        batch queries materialize a bf16 grid operand per call (the
        memory contract: steady batch serving belongs to store="bf16").

        metric="cosine"/"ip" (fused/sharded): similarity search through
        the SAME exact-L2 machinery via a build-time transform — the
        TPU-idiomatic design is one exact engine plus monotone
        reductions, not per-metric kernels.
        - "cosine": points are L2-normalized once at build, queries at
          query time; argmin L2 over unit vectors IS argmax cosine
          (monotone: d2 = 2 - 2*cos), so selection/ties are exact over
          the stored normalized points. query() returns (idx,
          similarity); query_radius(q, s_min) takes a MINIMUM
          similarity. Zero vectors have no direction and are rejected.
        - "ip" (maximum inner product): the classic augmentation — each
          point gains one dimension sqrt(max_norm2 - |r|2), making
          d2 = |q|2 + max_norm2 - 2*q.r, monotone in the inner product;
          exact MIPS over the stored augmented points. query() returns
          (idx, exact f32 q.r recomputed over the winners — the
          d2-derived form loses precision to cancellation).
        Both compose with top-K, mutable (adds are transformed; an "ip"
        add must fit under the build-time max norm), and save/load —
        but NOT with store="bf16": quantizing AFTER the transform
        perturbs the unit/equal norms the monotone reduction relies on
        (the result would be exact L2 over quantized transformed points,
        which is no longer exactly max-cosine/max-IP over anything), so
        the combination is rejected rather than shipped approximate."""
        if metric not in ("l2", "cosine", "ip"):
            raise ValueError(
                f"metric must be 'l2', 'cosine', or 'ip', got {metric!r}")
        if metric != "l2" and strategy not in ("fused", "sharded"):
            raise ValueError(
                "metric='cosine'/'ip' requires strategy='fused' or "
                "'sharded' (the spatial indexes assume raw-coordinate "
                f"geometry); got {strategy!r}")
        if metric != "l2" and store != "float32":
            raise ValueError(
                "metric='cosine'/'ip' requires store='float32': "
                "quantizing after the metric transform breaks the exact "
                "monotone reduction to L2 (see the class docstring)")
        self.metric = metric
        if store not in ("float32", "bf16", "int8"):
            raise ValueError(f"store must be 'float32', 'bf16', or "
                             f"'int8', got {store!r}")
        if store == "bf16" and strategy not in ("fused", "sharded"):
            raise ValueError(
                "store='bf16' requires strategy='fused' or 'sharded' "
                "(the spatial indexes bake f32 structures into their "
                f"build); got {strategy!r}")
        if store == "int8":
            # The int8 mode stores ONLY the (n, k) int8 grid — no SoA
            # operand (batch queries materialize one per call) — so the
            # strategies/features that keep masked operand state have
            # nothing to hang it on. bf16 covers those. "sharded" keeps
            # the same contract per shard: each chip holds only its
            # grid rows (the capacity ladder times the slice).
            if strategy not in ("fused", "sharded"):
                raise ValueError(
                    "store='int8' requires strategy='fused' or 'sharded' "
                    "(the grid array is the only resident state; spatial "
                    f"builds keep f32/bf16 structures); got {strategy!r}")
            if mutable:
                raise ValueError(
                    "store='int8' is immutable (the quantization grid is "
                    "fixed by the build-time value range; out-of-range "
                    "adds would clip) — use store='bf16' for a mutable "
                    "quantized index")
        self.store = store
        # Device-only strategies take a jax array as-is (no host round
        # trip, which costs seconds over the dev tunnel at n=2^24);
        # anything else (NumPy, lists, tuples) is coerced to a contiguous
        # f32 NumPy array, and host-side builds (kdtree, sharded pre-pad)
        # always need one. Exception: int8+sharded quantizes a DEVICE
        # input on device and reshards the 4x-smaller grid
        # (_init_int8_sharded) — pulling the f32 source to the host cost
        # ~200 s at n=2^24 over the dev tunnel (review r11).
        if (strategy == "kdtree"
                or (strategy == "sharded" and store != "int8")
                or not isinstance(ref, jax.Array)):
            ref = np.ascontiguousarray(ref, np.float32)
        self.k_user = ref.shape[1] - (
            1 if metric == "ip" and _pretransformed else 0)
        if metric != "l2" and not _pretransformed:
            ref = self._transform_ref(ref)
        self.n, self.k = ref.shape
        self.strategy = strategy
        self.mutable = mutable
        if mutable and strategy not in ("fused", "sharded"):
            # The spatial indexes (projection sort, KD-tree) bake the
            # point ORDER into their structure; updates there are
            # rebuilds (use compact()/reconstruction). The fused
            # strategy's prepared operand is position-indexed, so it
            # updates in place — and the sharded strategy extends the
            # same slot contract across the mesh: global slot g lives at
            # padded row g (shard g // n_local), so adds/removes are
            # in-place sharded updates and ids never move (VERDICT r4
            # item 2 — the production multi-chip tier must keep dynamic
            # serving).
            raise ValueError(
                "mutable=True requires strategy='fused' or 'sharded' "
                f"(slot-addressed prepared operands); {strategy!r} bakes "
                "point order into its build — rebuild instead")
        if precision is None:
            from tpu_knn.kernels.fused import auto_precision

            precision = auto_precision(self.k, max(self.n, capacity or 0))
            if store in ("bf16", "int8") and precision == "bf16x3":
                # Quantized stores hold EXACTLY-bf16 operands (bf16
                # points / grid integers): the 2-pass q-split tier keeps
                # the bf16x3 certification at 2/3 the MXU time and half
                # the operand reads (fused.py:_qr_dot "qsplit2" —
                # VERDICT r4 item 1, the embedding-scale regime).
                precision = "qsplit2"
        else:
            from tpu_knn.kernels.fused import _check_precision_certified

            # Serving never accepts a selection-approximate tier: the
            # index's ±1e-3 contract (harness/checker.py) has no
            # allow_approximate escape hatch here by design.
            _check_precision_certified(precision, allow_approximate=False)
        self.precision = precision
        if strategy in ("fused", "auto"):
            # tile_n is fixed at prepare time; pick for a large-batch query
            # and reuse (the n padding must match the kernel's tiling).
            # wide= must match fused_knn's per-call choice — round 1's
            # prepared index benched SLOWER than per-call because it
            # silently used tile_n=2048 instead of the packed path's 8192.
            _, self.tile_n = pick_tiles(self.k, 1024, self.n,
                                        wide=precision == "packed")
            if store == "int8":
                self._init_int8(ref)
                return
            # bf16 store quantizes ONCE, then derives BOTH operands (the
            # AoS rerank copy and the SoA scan operand) from the same
            # quantized values — the kernels' f32 upcasts then agree
            # bit-exactly between candidate selection and refinement.
            dt = jnp.bfloat16 if store == "bf16" else jnp.float32
            ref_t = jnp.asarray(ref)
            if ref_t.dtype != dt:
                # Quantize THROUGH f32 (one deterministic rounding); an
                # input already in the stored dtype skips the round trip —
                # bf16 -> f32 -> bf16 is the identity, and at n = 2^27 the
                # f32 temp alone is 8 GB (the capacity regime store="bf16"
                # exists for — scripts/r8_probe_capacity.py).
                ref_t = jnp.asarray(ref_t, jnp.float32).astype(dt)
            if mutable:
                self._init_mutable(ref_t, capacity)
                return
            # Kernel operands prepared once on device (SoA layout; for the
            # default bf16x3 path: bf16 hi/lo splits + f32 norms).
            builder = _build_fused_candidates(8, self.n, self.k, 8,
                                              self.tile_n, soa=True,
                                              precision=precision)
            self.ref_dev = ref_t  # AoS copy for exact refinement
            self.r_ops = jax.jit(builder.prep_soa)(self.ref_dev)
            jax.block_until_ready(self.r_ops)
            if strategy == "auto":
                self.proj_index = None
                self.cert_rate = 0.0
                self.last_strategy = None
                # Serving-time certification feedback (VERDICT r2 item
                # 5): the build probe is open-loop; these track the
                # REALIZED all-rows-certified rate of served projection
                # batches and demote the route if it collapses.
                self._proj_ok_sum = None     # device scalar, lazy adds
                self._proj_batches = 0
                self.realized_cert_rate = None
                self.proj_demoted = False
                if self.k <= 8 and self.n >= 128:
                    self._probe_projection()
        elif strategy == "projection":
            from tpu_knn.kernels.projection import build_projection_index

            self.ref_dev = jnp.asarray(ref, jnp.float32)
            self.proj_index = build_projection_index(self.ref_dev)
            jax.block_until_ready(self.proj_index)
        elif strategy == "kdtree":
            from tpu_knn import native

            self.ref = ref
            # Backend choice: the native CPU queries win by orders of
            # magnitude (pointer-chasing traversal is anti-TPU,
            # docs/PERF_NOTES.md); among them the leaf-bucketed kdt2
            # (tpuknn_native.cc) is the serving tree — the reference-
            # format implicit-heap tree (`self.tree`) is only built
            # lazily, for checkpointing and the device/NumPy fallbacks.
            self.use_native_query = native.available()
            self._tree = None
            self._kdt2 = None
            if self.use_native_query and self.k <= native.KDT2_MAX_K:
                self._kdt2 = native.Kdt2Index(ref)
            if not self.use_native_query:
                self.tree  # build eagerly for the fallback paths
        elif strategy == "sharded":
            from jax.sharding import NamedSharding, PartitionSpec as P

            from tpu_knn.distributed.sharded import (
                PAD_VALUE, default_mesh, sharded_layout,
            )

            self.mesh = mesh if mesh is not None else default_mesh()
            if store == "int8":
                self._init_int8_sharded(ref)
                return
            # store="bf16": quantize once on the host, keep BOTH shard-
            # resident operands quantized (half the per-shard HBM — 2x
            # the reference points per slice). Kernels upcast at the
            # read site; the bf16 PAD sentinel still squares to +inf.
            if store == "bf16":
                import ml_dtypes

                ref = ref.astype(ml_dtypes.bfloat16)
            if mutable:
                self._init_mutable_sharded(ref, capacity)
                self._live = np.zeros(self.capacity, bool)
                self._live[: self.n] = True
                return
            # Pre-shard ONCE: pad to the shard layout and device_put with
            # the sp sharding, so queries never re-pad or re-transfer refs.
            self.tile_n, n_local, n_pad = sharded_layout(self.n, self.k,
                                                         self.mesh)
            self._n_local = n_local
            self._place_sharded_operands(ref, n_pad)
        else:
            raise ValueError(f"unknown strategy {strategy!r}")

    # ---- metric transforms (cosine / inner product) ------------------

    def _transform_ref(self, ref):
        """Build-time geometry transform: the metric reduces to exact L2
        over transformed points (class docstring). Handles NumPy (host
        builds: sharded) and jax arrays (device builds: fused) alike."""
        xp = jnp if isinstance(ref, jax.Array) else np
        n2 = (ref * ref).sum(axis=1)
        if self.metric == "cosine":
            if float(n2.min()) == 0.0:
                raise ValueError(
                    "metric='cosine': reference contains a zero vector "
                    "(no direction); remove it or use metric='l2'")
            out = ref / xp.sqrt(n2)[:, None]
        else:  # ip: augment with sqrt(max_norm2 - |r|2) so norms equalize
            m2 = float(n2.max())
            self._ip_m2 = m2
            aug = xp.sqrt(xp.maximum(xp.asarray(m2, ref.dtype) - n2, 0))
            out = xp.concatenate([ref, aug[:, None]], axis=1)
        if xp is np:
            out = np.ascontiguousarray(out, np.float32)
        return out

    def _transform_q(self, search):
        """Query-time counterpart of _transform_ref; validates the USER
        dimensionality (k_user — 'ip' stores k_user + 1 columns)."""
        if search.shape[-1] != self.k_user:
            raise ValueError(
                f"queries must have k={self.k_user} dims, "
                f"got {search.shape[-1]}")
        if isinstance(search, np.ndarray) and self.metric == "cosine":
            # Zero queries have no direction; only checkable without a
            # device sync when the batch arrives host-side.
            if not (search.astype(np.float32) ** 2).sum(1).all():
                raise ValueError("metric='cosine': zero query vector")
        search = jnp.asarray(search, jnp.float32)
        if self.metric == "cosine":
            n2 = jnp.sum(search * search, axis=1, keepdims=True)
            return search / jnp.sqrt(n2)
        return jnp.pad(search, ((0, 0), (0, 1)))  # ip: q gains a 0 column

    def _metric_scores(self, search_t, idx, d2):
        """Map the engine's exact L2 outputs to the metric's native
        scores. cosine: sim = 1 - d2/2 (exact transform of the exact d2
        over unit vectors, <= 1 ulp). ip: recompute the exact f32 dot
        over the winners — the d2-derived form (|q|2 + M2 - d2)/2 loses
        low bits to cancellation at large norms. idx may be (m,) or
        (m, K); invalid slots (radius padding, idx < 0) score -inf."""
        if self.metric == "l2":
            return idx, d2
        if self.metric == "cosine":
            return idx, jnp.where(jnp.isfinite(d2), 1.0 - d2 * 0.5,
                                  -jnp.inf)
        src = self.ref_dev if hasattr(self, "ref_dev") else self.r_sharded
        valid = idx >= 0
        pts = jnp.take(src, jnp.where(valid, idx, 0).reshape(-1), axis=0)
        pts = pts.reshape(*idx.shape, src.shape[1])
        q = search_t[:, None, :] if idx.ndim == 2 else search_t
        ip = jnp.sum(pts * q, axis=-1)  # aug column x q's 0 column = 0
        return idx, jnp.where(valid, ip, -jnp.inf)

    # ---- int8 grid storage (quantized serving mode) ------------------
    #
    # store="int8" keeps the reference set as an (n, k) int8 GRID — one
    # byte per coordinate, 4x less HBM than f32 (measured compact on
    # TPU, scripts/r10_probe_int8.py) — and runs every query EXACTLY in
    # grid space: the grid is an affine embedding p = z + s*g with a
    # per-dim zero offset z and ONE positive global scale s, so
    # ||q - p||^2 = s^2 * ||q' - g||^2 for the transformed query
    # q' = (q - z)/s. Engines therefore need NO per-element dequant:
    # int8 upcasts to exact small-integer f32 at the read site and the
    # whole existing exact-selection machinery (diff-form scans, packed
    # MXU scores + certified rerank, top-K engines, v0 tie rule) runs
    # unchanged over (q', g); reported d2 rescale by s^2 on output
    # (monotone — order and ties are grid-exact). The one rounding in
    # q' is the same query-side rounding metric="cosine" already
    # accepts (q/||q||); the contract is "exact 1-NN of the embedded
    # query over the stored grid points".

    def _set_i8_embed(self, lo, hi):
        """Derive and store the int8 embed constants from f64 per-dim
        (lo, hi): zero offsets, the global inverse step, and the d2
        rescale. ONE copy (review r11: the fused and sharded inits
        carried clones, and test_sharded_int8_matches_single_chip's
        equality contract depends on them never drifting). The d2 scale
        derives from the STORED inv_s (the embed's only constant) so
        save/load round-trips bit-identically."""
        z = (lo + hi) / 2.0
        half = float(np.max(hi - z)) if len(z) else 0.0
        s = half / 127.0 if half > 0.0 else 1.0
        self._i8_zero = np.asarray(z, np.float32)      # (k,) host copy
        self._i8_inv_s = np.float32(1.0 / s)
        self._i8_s2 = float(np.float32(
            1.0 / (np.float64(self._i8_inv_s) ** 2)))
        self._i8_zero_dev = jnp.asarray(self._i8_zero)

    def _init_int8(self, ref):
        ref_t = jnp.asarray(ref)
        if ref_t.dtype != jnp.float32:
            ref_t = ref_t.astype(jnp.float32)
        self._set_i8_embed(
            np.asarray(jax.device_get(jnp.min(ref_t, axis=0)), np.float64),
            np.asarray(jax.device_get(jnp.max(ref_t, axis=0)), np.float64))
        g = jnp.clip(jnp.round((ref_t - self._i8_zero_dev) * self._i8_inv_s),
                     -127.0, 127.0).astype(jnp.int8)
        self.ref_dev = jax.block_until_ready(g)
        self.r_ops = None          # no resident SoA operand — that is
        self._i8_ops_fn = None     # the mode's memory contract

    def _init_int8_sharded(self, ref):
        """store="int8" + strategy="sharded": the capacity tier times the
        slice. Each shard's ONLY resident state is its (n_local, k) int8
        grid rows (the same memory contract as _init_int8 per chip —
        2^28 points per 16 GB v5e at k=16, times the shard count). The
        embed (zero/scale) is GLOBAL so every shard serves the same grid
        geometry; pad rows are zeros and excluded positionally at query
        time (an int8 pad value cannot be made to lose —
        distributed/sharded.py:_build_sharded_int8)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpu_knn.distributed.sharded import int8_sharded_layout

        n_local, n_pad = int8_sharded_layout(self.n, self.mesh)
        self._n_local = n_local
        ref_axes = ("dcn", "sp") if "dcn" in self.mesh.shape else ("sp",)
        sharding = NamedSharding(self.mesh, P(ref_axes, None))
        if isinstance(ref, jax.Array):
            # Device input: quantize ON DEVICE and reshard the 4x-
            # smaller grid (the f32 source already fit where it lives;
            # a host round trip costs ~200 s at n=2^24 over the dev
            # tunnel). Past-one-chip builds use from_int8_grid.
            ref_t = (ref if ref.dtype == jnp.float32
                     else ref.astype(jnp.float32))
            self._set_i8_embed(
                np.asarray(jax.device_get(jnp.min(ref_t, axis=0)),
                           np.float64),
                np.asarray(jax.device_get(jnp.max(ref_t, axis=0)),
                           np.float64))
            g = jax.jit(lambda x, z, s: jnp.pad(
                jnp.clip(jnp.round((x - z) * s),
                         -127.0, 127.0).astype(jnp.int8),
                ((0, n_pad - self.n), (0, 0))))(
                ref_t, self._i8_zero_dev, self._i8_inv_s)
            self.r_sharded = jax.device_put(g, sharding)
        else:
            ref = np.ascontiguousarray(ref, np.float32)
            self._set_i8_embed(ref.min(axis=0).astype(np.float64),
                               ref.max(axis=0).astype(np.float64))
            g = np.zeros((n_pad, self.k), np.int8)
            g[: self.n] = np.clip(
                np.round((ref - self._i8_zero) * self._i8_inv_s),
                -127.0, 127.0).astype(np.int8)
            self.r_sharded = jax.device_put(g, sharding)
        jax.block_until_ready(self.r_sharded)
        self.r_ops = None
        self._i8_ops_fn = None

    @property
    def _ref_axes(self):
        return ("dcn", "sp") if "dcn" in self.mesh.shape else ("sp",)

    def _place_sharded_operands(self, ref_host, n_pad: int) -> None:
        """Pad ``ref_host`` (rows <= n_pad, host f32/bf16) to the shard
        layout with PAD_VALUE rows and device_put BOTH prepared operands:
        the AoS (n_pad, k) row array over the reference axes and the SoA
        (k_pad, n_pad) scan operand on its lane axis (k padding rows are
        zeros — distance-neutral; PAD columns carry PAD_VALUE in the
        real-k rows, so their scores overflow to +inf). The build-once
        doctrine through the multi-chip door (VERDICT r2 item 4)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpu_knn.distributed.sharded import PAD_VALUE as SPAD

        padded = np.full((n_pad, self.k), SPAD, ref_host.dtype)
        padded[: ref_host.shape[0]] = ref_host
        self.r_sharded = jax.device_put(
            padded, NamedSharding(self.mesh, P(self._ref_axes, None)))
        k_pad = round_up(self.k, 8)
        soa = np.zeros((k_pad, n_pad), ref_host.dtype)
        soa[: self.k] = padded.T
        self.r_ops_sharded = jax.device_put(
            soa, NamedSharding(self.mesh, P(None, self._ref_axes)))
        jax.block_until_ready((self.r_sharded, self.r_ops_sharded))

    def _init_mutable_sharded(self, slots_host, capacity: int | None):
        """Mutable + sharded: the single-chip slot contract
        (_init_mutable) extended across the mesh. ``slots_host`` holds
        the occupied slot rows (removed slots already PAD sentinels —
        the restore path reuses this); capacity slots are laid out
        contiguously across shards (global slot g = padded row g, shard
        g // n_local), so reported ids equal slot ids and never move.
        Initial occupancy is therefore front-loaded onto the leading
        shards — correctness is unaffected (empty slots self-exclude via
        PAD) and adds fill toward balance; a rebalancing would re-bake
        point order, which is exactly what mutable promises not to do."""
        from tpu_knn.distributed.sharded import sharded_layout

        n_slots = slots_host.shape[0]
        cap_t = max(capacity or 0, 2 * n_slots, 1024)
        self.tile_n, n_local, n_pad = sharded_layout(cap_t, self.k,
                                                     self.mesh)
        self._n_local = n_local
        self.capacity = n_pad
        self._place_sharded_operands(slots_host, n_pad)
        self._n_slots = n_slots

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _build_add_sharded(k: int, k_pad: int, p: int, mesh):
        """One-dispatch sharded append of a (p, k) block at a runtime
        slot position: both shard-resident operands update in place
        (XLA SPMD routes the block to the owning shard(s))."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        ref_axes = ("dcn", "sp") if "dcn" in mesh.shape else ("sp",)
        shards = (NamedSharding(mesh, P(ref_axes, None)),
                  NamedSharding(mesh, P(None, ref_axes)))

        @functools.partial(jax.jit, out_shardings=shards)
        def upd(r_aos, r_soa, pts, pos):
            pts = pts.astype(r_aos.dtype)
            r_aos = jax.lax.dynamic_update_slice(r_aos, pts, (pos, 0))
            blk = jnp.pad(pts, ((0, 0), (0, k_pad - k))).T
            r_soa = jax.lax.dynamic_update_slice(r_soa, blk, (0, pos))
            return r_aos, r_soa

        return upd

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _build_remove_sharded(k: int, k_pad: int, p: int, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpu_knn.distributed.sharded import PAD_VALUE as SPAD

        ref_axes = ("dcn", "sp") if "dcn" in mesh.shape else ("sp",)
        shards = (NamedSharding(mesh, P(ref_axes, None)),
                  NamedSharding(mesh, P(None, ref_axes)))

        @functools.partial(jax.jit, out_shardings=shards)
        def upd(r_aos, r_soa, ids):
            r_aos = r_aos.at[ids].set(SPAD)
            r_soa = r_soa.at[:, ids].set(SPAD)
            return r_aos, r_soa

        return upd

    @classmethod
    def from_int8_grid(cls, grid, zero, scale,
                       precision: str | None = None,
                       mesh=None, strategy: str = "fused") -> "NNIndex":
        """Build an int8 index directly from pre-quantized grid state:
        ``grid`` (n, k) int8, ``zero`` (k,) f32 per-dim offsets, ``scale``
        the positive global step — the stored points are z + scale*g.

        This is the CAPACITY path: the standard constructor derives the
        embed from an f32 source it must hold whole, which caps the
        index at the f32 array's footprint (8 GB at (2^27, 16)); a
        caller chunk-quantizing on the fly (or restoring an external
        grid) can build 4x past that — measured to 2^28 points at k=16
        on one 16 GB v5e (scripts/r10_probe_int8_capacity.py). Queries,
        top-K, radius, and save/load behave exactly as NNIndex(...,
        store="int8").

        strategy="sharded" (optionally with an explicit ``mesh``)
        distributes the grid over the mesh's reference axes — the
        capacity ladder times the slice (each shard resident-holds only
        its rows). Sharded grids are padded and placed HOST-side (one
        device_put with the shard layout): a 2^31-point grid must never
        be materialized whole on one chip (review r11)."""
        if mesh is not None and strategy != "sharded":
            raise ValueError(
                "mesh= requires strategy='sharded' (a fused grid index "
                "lives on one device) — it would otherwise be silently "
                "ignored")
        if strategy != "sharded":
            grid = jnp.asarray(grid)
        if np.dtype(grid.dtype) != np.int8 or grid.ndim != 2:
            raise ValueError(
                f"grid must be an (n, k) int8 array, got {grid.dtype} "
                f"{grid.shape}")
        zero = np.ascontiguousarray(zero, np.float32)
        if zero.shape != (grid.shape[1],):
            raise ValueError(
                f"zero must be ({grid.shape[1]},) f32, got {zero.shape}")
        if not float(scale) > 0.0:
            raise ValueError(f"scale must be positive, got {scale}")
        if precision is None:
            from tpu_knn.kernels.fused import auto_precision

            precision = auto_precision(grid.shape[1], grid.shape[0])
            if precision == "bf16x3":
                precision = "qsplit2"   # grid integers are bf16-exact
        return cls._from_int8_grid(grid, zero,
                                   np.float32(1.0 / np.float64(scale)),
                                   precision, mesh=mesh, strategy=strategy)

    @classmethod
    def _from_int8_grid(cls, grid, zero, inv_s, precision,
                        mesh=None, strategy: str = "fused"):
        """Rebuild from persisted grid state (load()): re-quantizing is
        neither possible (the f32 points were not saved) nor wanted —
        the grid IS the index."""
        from tpu_knn.kernels.tuning import pick_tiles as _pick

        if strategy not in ("fused", "sharded"):
            raise ValueError(
                f"int8 grids serve the fused or sharded strategy, "
                f"got {strategy!r}")
        ix = cls.__new__(cls)
        ix.metric = "l2"
        ix.store = "int8"
        ix.strategy = strategy
        ix.mutable = False
        ix.n, ix.k = grid.shape
        ix.k_user = ix.k
        ix.precision = precision
        _, ix.tile_n = _pick(ix.k, 1024, ix.n, wide=precision == "packed")
        ix._i8_zero = np.asarray(zero, np.float32)
        ix._i8_inv_s = np.float32(inv_s)
        ix._i8_s2 = float(np.float32(1.0 / (np.float64(ix._i8_inv_s) ** 2)))
        ix._i8_zero_dev = jnp.asarray(ix._i8_zero)
        if strategy == "sharded":
            from jax.sharding import NamedSharding, PartitionSpec as P

            from tpu_knn.distributed.sharded import (
                default_mesh, int8_sharded_layout,
            )

            ix.mesh = mesh if mesh is not None else default_mesh()
            n_local, n_pad = int8_sharded_layout(ix.n, ix.mesh)
            ix._n_local = n_local
            # Pad on the HOST and place once with the shard layout: a
            # jnp.pad (or jnp.asarray of the whole grid) would
            # materialize the full array on the default device first —
            # the capacity path's grid does not fit one chip. A device-
            # resident input is pulled to host once (the restore path's
            # grids arrive host-side anyway).
            g = np.asarray(grid)
            if n_pad != ix.n:
                gp = np.zeros((n_pad, ix.k), np.int8)
                gp[: ix.n] = g
                g = gp
            ref_axes = ("dcn", "sp") if "dcn" in ix.mesh.shape else ("sp",)
            ix.r_sharded = jax.device_put(
                g, NamedSharding(ix.mesh, P(ref_axes, None)))
            jax.block_until_ready(ix.r_sharded)
        else:
            ix.ref_dev = jnp.asarray(grid, jnp.int8)
        ix.r_ops = None
        ix._i8_ops_fn = None
        return ix

    def _i8_q(self, search):
        """User-space query batch -> grid-space f32 (one rounding per
        coordinate, the embed's definition)."""
        search = jnp.asarray(search, jnp.float32)
        if search.ndim != 2 or search.shape[1] != self.k:
            raise ValueError(
                f"queries must be (m, {self.k}), got {search.shape}")
        return (search - self._i8_zero_dev) * self._i8_inv_s

    def _i8_ops(self):
        """Per-call dequantized SoA operand for the batch (m > 4 /
        top-K m >= 2) engines: grid values are EXACT in bfloat16
        (integers within +-127), so the batch pipelines compute the
        same grid-space geometry the AoS scans do — route consistency.
        Materialized per call and released after: the int8 mode's
        memory contract is the (n, k) grid ONLY; steady batch serving
        at lower prep cost is what store='bf16' is for."""
        if self._i8_ops_fn is None:
            builder = _build_fused_candidates(
                8, self.n, self.k, 8, self.tile_n, soa=True,
                precision=self.precision)
            self._i8_ops_fn = jax.jit(
                lambda g: builder.prep_soa(g.astype(jnp.bfloat16)))
        return self._i8_ops_fn(self.ref_dev)

    # ---- mutable (dynamic-update) machinery -------------------------

    @property
    def _n_eff(self):
        """The n every compiled pipeline is built for: the logical count
        for static indexes, the slot capacity for mutable ones (where
        empty/removed slots self-exclude via the PAD_VALUE sentinel)."""
        return self.capacity if self.mutable else self.n

    @property
    def n_live(self) -> int:
        """Number of queryable points (static: n; mutable: adds minus
        removes — slot ids of removed points are never reused; filtered
        views: the kept count)."""
        if self.mutable:
            return int(self._live[: self._n_slots].sum())
        view_live = getattr(self, "_view_live", None)
        return self.n if view_live is None else view_live

    def _init_mutable(self, ref_dev, capacity: int | None):
        n = self.n
        self.capacity = round_up(max(capacity or 0, 2 * n, 1024), self.tile_n)
        k_pad = round_up(self.k, 8)
        # dtype follows the stored points (store="bf16" quantizes once at
        # build; PAD_VALUE quantizes to ~1.0038e30 whose square still
        # overflows f32 to +inf, so slot self-exclusion is unchanged).
        fill = jnp.full((self.capacity - n, self.k), PAD_VALUE,
                        ref_dev.dtype)
        self.ref_dev = jnp.concatenate([ref_dev, fill])
        # SoA operand: k zero-padded on sublanes (distance-neutral),
        # empty slots PAD_VALUE across ALL k_pad sublanes (score +inf;
        # the zero query padding contributes 0 * PAD to the dot).
        r_op = jnp.pad(self.ref_dev, ((0, 0), (0, k_pad - self.k))).T
        r_op = r_op.at[:, n:].set(PAD_VALUE)
        self.r_ops = (r_op,)
        jax.block_until_ready(self.r_ops)
        self._n_slots = n                     # next free slot
        self._live = np.zeros(self.capacity, bool)
        self._live[:n] = True

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _build_add(k: int, k_pad: int, p: int):
        """One-dispatch append of a (p, k) block at a runtime position."""

        @jax.jit
        def upd(ref_dev, r_op, pts, pos):
            pts = pts.astype(ref_dev.dtype)  # bf16 store quantizes adds
            ref_dev = jax.lax.dynamic_update_slice(ref_dev, pts, (pos, 0))
            blk = jnp.pad(pts, ((0, 0), (0, k_pad - k))).T
            r_op = jax.lax.dynamic_update_slice(r_op, blk, (0, pos))
            return ref_dev, r_op

        return upd

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def _build_remove(k: int, k_pad: int, p: int):
        @jax.jit
        def upd(ref_dev, r_op, ids):
            ref_dev = ref_dev.at[ids].set(PAD_VALUE)
            r_op = r_op.at[:, ids].set(PAD_VALUE)
            return ref_dev, r_op

        return upd

    def _require_mutable(self):
        if not self.mutable:
            raise ValueError(
                "this index is immutable; build with NNIndex(..., "
                "mutable=True) for add/remove/compact")

    def add(self, points) -> np.ndarray:
        """Append points; returns their stable ids ((p,) int32 — the index
        values future queries report). Device-side in-place update: no
        recompilation unless capacity grows (then amortized doubling)."""
        self._require_mutable()
        if self.metric != "l2":
            # Metric adds transform host-side (the norm guards need a
            # value check anyway; mutable adds are host-interactive).
            points = np.ascontiguousarray(points, np.float32)
            if points.ndim != 2 or points.shape[1] != self.k_user:
                raise ValueError(f"points must be (p, {self.k_user}), "
                                 f"got {points.shape}")
            n2 = (points ** 2).sum(1)
            if self.metric == "cosine":
                if not n2.all():
                    raise ValueError("metric='cosine': zero vector added")
                points = points / np.sqrt(n2)[:, None]
            else:
                if n2.max(initial=0.0) > self._ip_m2:
                    raise ValueError(
                        "metric='ip': added point's squared norm "
                        f"{float(n2.max()):.6g} exceeds the build-time "
                        f"maximum {self._ip_m2:.6g} the augmentation was "
                        "sized for — rebuild the index with the larger "
                        "set")
                # f32 arithmetic exactly as _transform_ref's (a Python-
                # float m2 would promote the aug column through f64 and
                # round differently from the build's).
                aug = np.sqrt(np.maximum(np.float32(self._ip_m2)
                                         - n2.astype(np.float32), 0))
                points = np.concatenate(
                    [points, aug.astype(np.float32)[:, None]], axis=1)
        points = jnp.asarray(points, jnp.float32)
        if points.ndim != 2 or points.shape[1] != self.k:
            raise ValueError(f"points must be (p, {self.k}), "
                             f"got {points.shape}")
        p = points.shape[0]
        if p == 0:
            return np.empty(0, np.int32)
        if self._n_slots + p > self.capacity:
            self._grow(self._n_slots + p)
        if self.strategy == "sharded":
            upd = self._build_add_sharded(self.k, round_up(self.k, 8), p,
                                          self.mesh)
            self.r_sharded, self.r_ops_sharded = upd(
                self.r_sharded, self.r_ops_sharded, points,
                jnp.int32(self._n_slots))
        else:
            upd = self._build_add(self.k, round_up(self.k, 8), p)
            self.ref_dev, r_op = upd(self.ref_dev, self.r_ops[0], points,
                                     jnp.int32(self._n_slots))
            self.r_ops = (r_op,)
        ids = np.arange(self._n_slots, self._n_slots + p, dtype=np.int32)
        self._n_slots += p
        self._live[ids] = True
        return ids

    def remove(self, ids) -> None:
        """Remove points by id. Their slots become PAD sentinels (never
        reported again); capacity is not reclaimed until compact()."""
        self._require_mutable()
        ids = np.atleast_1d(np.asarray(ids, np.int64))
        if ids.size == 0:
            return
        if ids.min() < 0 or ids.max() >= self._n_slots:
            raise ValueError(f"ids out of range [0, {self._n_slots})")
        if not self._live[ids].all():
            dead = ids[~self._live[ids]]
            raise ValueError(f"ids already removed: {dead.tolist()[:8]}")
        if self.strategy == "sharded":
            upd = self._build_remove_sharded(self.k, round_up(self.k, 8),
                                             ids.size, self.mesh)
            self.r_sharded, self.r_ops_sharded = upd(
                self.r_sharded, self.r_ops_sharded,
                jnp.asarray(ids, jnp.int32))
        else:
            upd = self._build_remove(self.k, round_up(self.k, 8), ids.size)
            self.ref_dev, r_op = upd(self.ref_dev, self.r_ops[0],
                                     jnp.asarray(ids, jnp.int32))
            self.r_ops = (r_op,)
        self._live[ids] = False

    def _grow(self, need: int):
        if self.strategy == "sharded":
            # Growth re-lays the slot array over the mesh (n_local
            # changes, so pipelines recompile): gather the slot rows once
            # and re-place. Slot IDS are layout-independent (global slot
            # g = padded row g), so ids survive; amortized doubling keeps
            # this rare. Removed slots are already PAD sentinels in the
            # gathered rows and stay dead.
            slots = np.asarray(jax.device_get(self.r_sharded))[
                : self._n_slots]
            self._init_mutable_sharded(slots, max(2 * self.capacity, need))
            live = np.zeros(self.capacity, bool)
            live[: self._n_slots] = self._live[: self._n_slots]
            self._live = live
            return
        new_cap = round_up(max(2 * self.capacity, need), self.tile_n)
        pad_n = new_cap - self.capacity
        self.ref_dev = jnp.concatenate(
            [self.ref_dev,
             jnp.full((pad_n, self.k), PAD_VALUE, self.ref_dev.dtype)])
        self.r_ops = (jnp.pad(self.r_ops[0], ((0, 0), (0, pad_n)),
                              constant_values=PAD_VALUE),)
        live = np.zeros(new_cap, bool)
        live[: self.capacity] = self._live
        self._live = live
        self.capacity = new_cap

    def compact(self) -> np.ndarray:
        """Defragment: drop removed slots and shrink capacity. Point ids
        CHANGE; returns the (old_slots,) int32 mapping old id -> new id
        (-1 for removed points)."""
        self._require_mutable()
        live_ids = np.nonzero(self._live[: self._n_slots])[0]
        mapping = np.full(self._n_slots, -1, np.int32)
        mapping[live_ids] = np.arange(live_ids.size, dtype=np.int32)
        self.n = int(live_ids.size)
        if self.strategy == "sharded":
            slots = np.asarray(jax.device_get(self.r_sharded))[
                : self._n_slots]
            self._init_mutable_sharded(slots[live_ids], None)
            self._live = np.zeros(self.capacity, bool)
            self._live[: self.n] = True
            return mapping
        ref_live = jnp.take(self.ref_dev, jnp.asarray(live_ids, jnp.int32),
                            axis=0)
        self._init_mutable(ref_live, None)
        return mapping

    def filtered_view(self, keep) -> "NNIndex":
        """An exact FILTERED-search view: a queryable index restricted
        to the points where ``keep`` (shape (n,) bool) is True —
        the vector-database staple (category partitions, tenant
        isolation, time windows) with no reference analog.

        Build-once philosophy applied to filters: the view shares this
        index's device-resident AoS array and materializes ONE masked
        SoA operand (excluded columns become PAD_VALUE sentinels whose
        scores/distances are +inf in every kernel — the same mechanism
        mutable removes use), so queries, top-K, and radius queries run
        the full prepared pipelines at unfiltered speed and report
        ORIGINAL index positions. A persistent filter costs one device
        pass; per-query ad-hoc filters should instead post-filter a
        top-K result. Views are read-only (save/mutation: use the
        parent)."""
        if self.store == "int8":
            raise ValueError(
                "filtered_view requires a resident SoA operand to mask; "
                "store='int8' keeps only the grid array — use "
                "store='bf16' for filtered quantized serving")
        if self.mutable:
            raise ValueError(
                "filtered_view on a mutable index is ambiguous under "
                "later add/remove; use remove() or build a view from a "
                "compacted snapshot")
        if self.strategy != "sharded" and (
                self.strategy not in ("fused", "auto")
                or len(self.r_ops) != 1):
            raise ValueError(
                "filtered_view requires the fused/auto/sharded strategy "
                f"with a plain SoA operand; this index uses "
                f"{self.strategy!r}")
        keep = np.asarray(keep, bool)
        if keep.shape != (self.n,):
            raise ValueError(
                f"keep must be a ({self.n},) boolean mask, "
                f"got shape {keep.shape}")
        live = int(keep.sum())
        if live < 1:
            raise ValueError("filtered_view would keep no points")
        if self.strategy == "sharded":
            return self._filtered_view_sharded(keep, live)
        view = NNIndex.__new__(NNIndex)
        view.strategy = "fused"
        view.mutable = False
        view.n, view.k = self.n, self.k
        view.precision = self.precision
        view.store = self.store
        view.metric = self.metric
        view.k_user = self.k_user
        if self.metric == "ip":
            view._ip_m2 = self._ip_m2
        view.tile_n = self.tile_n
        view.ref_dev = self.ref_dev            # shared AoS (gathers only
        r_op = self.r_ops[0]                   # touch reported winners)
        width = r_op.shape[1]
        col_keep = jnp.pad(jnp.asarray(keep), (0, width - self.n))
        view.r_ops = (jnp.where(col_keep[None, :], r_op, PAD_VALUE),)
        view._view_live = live
        # The shared AoS array is NOT masked — only the SoA operand is.
        # Routes that SCAN ref_dev directly (dense exact, the zero-prep
        # AoS 1-NN/top-K engines) would see excluded points; this flag
        # sends the view down the masked-operand pipelines instead.
        view._aos_selfmasked = False
        return view

    def _filtered_view_sharded(self, keep: np.ndarray, live: int):
        """filtered_view over the mesh (VERDICT r4 item 2: the production
        multi-chip tier keeps dynamic serving): ONE masked copy of each
        shard-resident operand — excluded rows/columns become PAD_VALUE
        sentinels, exactly the fused view's mechanism per shard — so the
        view runs the unmodified prepadded shard pipelines (1-NN, top-K,
        radius) at unfiltered speed and reports ORIGINAL positions. The
        masking jits with the operands' own shardings pinned, so no
        cross-shard traffic moves: each shard masks its rows in place."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpu_knn.distributed.sharded import PAD_VALUE as SPAD

        view = NNIndex.__new__(NNIndex)
        view.strategy = "sharded"
        view.mutable = False
        view.n, view.k = self.n, self.k
        view.precision = self.precision
        view.store = self.store
        view.metric = self.metric
        view.k_user = self.k_user
        if self.metric == "ip":
            view._ip_m2 = self._ip_m2
        view.tile_n = self.tile_n
        view.mesh = self.mesh
        view._n_local = self._n_local
        n_pad = self.r_sharded.shape[0]
        maskp = np.zeros(n_pad, bool)
        maskp[: self.n] = keep
        ref_axes = self._ref_axes
        mask_dev = jax.device_put(
            maskp, NamedSharding(self.mesh, P(ref_axes)))
        mask_aos = functools.partial(
            jax.jit, out_shardings=NamedSharding(self.mesh,
                                                 P(ref_axes, None)))(
            lambda r, mk: jnp.where(mk[:, None], r,
                                    jnp.asarray(SPAD, r.dtype)))
        mask_soa = functools.partial(
            jax.jit, out_shardings=NamedSharding(self.mesh,
                                                 P(None, ref_axes)))(
            lambda r, mk: jnp.where(mk[None, :], r,
                                    jnp.asarray(SPAD, r.dtype)))
        view.r_sharded = mask_aos(self.r_sharded, mask_dev)
        view.r_ops_sharded = mask_soa(self.r_ops_sharded, mask_dev)
        jax.block_until_ready((view.r_sharded, view.r_ops_sharded))
        view._view_live = live
        return view

    # ---- kdtree backends (lazy) --------------------------------------

    @property
    def tree(self):
        """Reference-format implicit-heap KDTree (kdtree strategy only).

        Built lazily: serving queries run on the native kdt2 tree, so the
        reference-format arrays are only materialized when something
        needs the portable layout (save(), the device-traversal demo, or
        the NumPy fallback). Deterministic — two builds over the same
        points produce identical arrays."""
        if self.strategy != "kdtree":
            raise AttributeError("tree: kdtree-strategy indexes only")
        if self._tree is None:
            from tpu_knn.kdtree.build import build_kdtree

            self._tree = build_kdtree(self.ref)
        return self._tree

    @property
    def dev_tree(self):
        """Device traversal handle (capability demo; never used when the
        native backend is available — see PARITY.md 'Dispatch
        decisions')."""
        if self.strategy != "kdtree":
            raise AttributeError("dev_tree: kdtree-strategy indexes only")
        if self.use_native_query or self.k > 8:
            return None
        if getattr(self, "_dev_tree", None) is None:
            from tpu_knn.kdtree.traversal import DeviceKDTree

            self._dev_tree = DeviceKDTree(self.tree)
        return self._dev_tree

    def _serving_tree(self):
        """The native kdt2 serving tree, rebuilding it after a load()
        (one-time, first query) — or None when k exceeds its dim cap."""
        from tpu_knn import native

        if self._kdt2 is None and self.k <= native.KDT2_MAX_K:
            self._kdt2 = native.Kdt2Index(self.ref)
        return self._kdt2

    # ---- checkpoint/resume ------------------------------------------

    def save(self, path: str) -> None:
        """Persist the index (KDTree.save's sibling — the reference has
        no checkpoint story, SURVEY.md §5, because it rebuilds per call).

        Saves the point set + metadata; load() re-prepares the device
        operands (sub-second — the layout is recomputed, the POINTS and,
        for mutable indexes, the slot/id state are what a restore must
        preserve). kdtree strategy delegates to KDTree.save's format so
        the host build is not repaid. Sharded indexes persist their
        payload (points / slot array / int8 grid) plus the MESH SPEC
        (axis names + sizes); a mesh binds to the live process's
        devices, so load() REBINDS — the saved spec when the restoring
        process has enough devices, else its default mesh (exactness is
        layout-independent; only the shard placement differs). Pass
        load(..., mesh=) to override.
        """
        if getattr(self, "_view_live", None) is not None:
            raise ValueError("filtered views are ephemeral; save the "
                             "parent index and the mask")
        meta = dict(strategy=self.strategy, precision=self.precision,
                    mutable=self.mutable, store=getattr(self, "store",
                                                        "float32"),
                    metric=self.metric)
        if self.metric == "ip":
            meta["ip_m2"] = self._ip_m2
        if self.strategy == "sharded":
            meta["mesh_axes"] = np.asarray(self.mesh.axis_names)
            meta["mesh_sizes"] = np.asarray(
                [self.mesh.shape[a] for a in self.mesh.axis_names],
                np.int64)
        if self.strategy == "kdtree":
            np.savez_compressed(path, ref=self.ref, p=self.tree.p,
                                dim=self.tree.dim,
                                split_val=self.tree.split_val, **meta)
            return

        def host(a):
            # bf16 arrays persist as their raw uint16 bits (np.savez has
            # no bfloat16; the view round-trips bit-exactly and keeps the
            # half-size file the storage mode promises).
            a = np.asarray(a)
            return a.view(np.uint16) if a.dtype.itemsize == 2 else a

        # Sharded payloads gather once (device_get of a sharded array
        # assembles the host copy); padding rows are layout, not state —
        # the slices below persist only the real rows.
        src = (self.r_sharded if self.strategy == "sharded"
               else self.ref_dev)
        if self.store == "int8":
            # The grid IS the index: persist it with the embed constants
            # (zero offsets + inv scale) — a restore must NOT re-derive
            # them from data it no longer has.
            np.savez_compressed(
                path, ref=np.asarray(jax.device_get(src))[: self.n],
                i8_zero=self._i8_zero, i8_inv_s=self._i8_inv_s, **meta)
            return
        if self.mutable:
            # Slot array as-is (removed slots are PAD sentinels) + the
            # live mask: ids survive the round trip.
            np.savez_compressed(
                path, ref=host(src[: self._n_slots]),
                live=self._live[: self._n_slots], **meta)
            return
        np.savez_compressed(path, ref=host(src[: self.n]), **meta)

    @staticmethod
    def _rebind_mesh(names, sizes):
        """Recreate a saved mesh spec over the restoring process's
        devices: the saved shape when enough devices exist, else the
        default mesh (results are layout-independent — only shard
        placement differs)."""
        from jax.sharding import Mesh

        from tpu_knn.distributed.sharded import default_mesh

        devs = np.array(jax.devices())
        need = int(np.prod(sizes))
        if need <= devs.size:
            return Mesh(devs[:need].reshape(tuple(int(s) for s in sizes)),
                        tuple(str(a) for a in names))
        return default_mesh()

    @classmethod
    def load(cls, path: str, mesh=None) -> "NNIndex":
        """Restore a saved index. ``mesh`` overrides the rebind target
        for sharded indexes (defaults to the saved mesh spec when the
        process has enough devices, else default_mesh())."""
        with np.load(path) as z:
            strategy = str(z["strategy"])
            mutable = bool(z["mutable"])
            precision = str(z["precision"])
            store = str(z["store"]) if "store" in z else "float32"
            metric = str(z["metric"]) if "metric" in z else "l2"
            ref = z["ref"]
            if strategy == "sharded" and mesh is None:
                mesh = cls._rebind_mesh(z["mesh_axes"], z["mesh_sizes"])
            if store == "int8":
                return cls._from_int8_grid(ref, z["i8_zero"],
                                           z["i8_inv_s"], precision,
                                           mesh=mesh, strategy=strategy)
            if store == "bf16":
                # Saved as raw uint16 bits; the f32 upcast re-quantizes
                # bit-identically in the constructor (bf16 -> f32 -> bf16
                # is the identity).
                import ml_dtypes

                ref = ref.view(ml_dtypes.bfloat16).astype(np.float32)
            if strategy == "kdtree":
                # Restore WITHOUT repaying the host build (the point of
                # persisting a tree — reference README.md:334-343 splits
                # build from query cost for the same reason).
                from tpu_knn import native
                from tpu_knn.kdtree.build import KDTree

                ix = cls.__new__(cls)
                ix.ref = np.ascontiguousarray(ref, np.float32)
                ix.n, ix.k = ix.ref.shape
                ix.k_user = ix.k
                ix.metric = "l2"
                ix.store = "float32"
                ix.strategy = "kdtree"
                ix.mutable = False
                ix.precision = precision
                ix._tree = KDTree(ref=ix.ref, p=z["p"], dim=z["dim"],
                                  split_val=z["split_val"])
                ix.use_native_query = native.available()
                # The serving tree (kdt2) is rebuilt from the points on
                # first query rather than here: load() itself stays
                # instant, and the reference-format arrays above keep the
                # restored build byte-identical to what was saved.
                ix._kdt2 = None
                return ix
            # Saved points are already in the metric's transformed
            # geometry (ip: augmented column included) — re-transforming
            # would double-normalize/re-augment, so the constructor is
            # told to take them as-is.
            extra = dict(metric=metric, _pretransformed=metric != "l2",
                         mesh=mesh)
            if mutable:
                # Rebuild from the SLOT array (dead slots are already PAD
                # sentinels in it), then restore liveness — ids preserved.
                live = z["live"]
                ix = cls(ref, strategy=strategy, precision=precision,
                         mutable=True, store=store, **extra)
                ix._live[: ix._n_slots] = live
            else:
                ix = cls(ref, strategy=strategy, precision=precision,
                         store=store, **extra)
            if metric == "ip":
                ix._ip_m2 = float(z["ip_m2"])
            return ix

    #: Certification hit rate the build-time probe must clear for "auto"
    #: to enable projection serving.
    CERT_RATE_MIN = 0.9

    #: Realized-rate floor for KEEPING the projection route, evaluated
    #: every PROJ_FEEDBACK_PERIOD served batches. The pipeline's fallback
    #: is per-batch (one uncertified row -> lax.cond runs the full scan
    #: for the whole batch, projection.py:402), so the realized quantity
    #: is the fraction of fully-certified batches; break-even is
    #: window_cost/scan_cost, which projection_wins' 2*work <= n guard
    #: bounds at <= 0.5 — below that the window pass is pure waste and
    #: the route demotes to fused.
    PROJ_REALIZED_MIN = 0.5
    PROJ_FEEDBACK_PERIOD = 32

    def _note_projection_batch(self, ok):
        """Accumulate the served batch's certification outcome on device
        (no sync); every PROJ_FEEDBACK_PERIOD batches, one scalar
        readback computes the realized rate OF THAT WINDOW and demotes
        the projection route if it fell below PROJ_REALIZED_MIN — the
        guard-verify-delegate discipline (core.cu:481-485) applied to the
        routing decision itself, closing VERDICT r2 item 5's open loop.

        The rate is per-window, not lifetime-cumulative (review r3): a
        serving distribution that certifies well for N batches and then
        shifts must be demoted within one window of the shift, not after
        the bad batches outnumber the good ones."""
        batch_ok = jnp.all(ok).astype(jnp.float32)
        self._proj_ok_sum = (batch_ok if self._proj_ok_sum is None
                             else self._proj_ok_sum + batch_ok)
        self._proj_batches += 1
        if self._proj_batches % self.PROJ_FEEDBACK_PERIOD == 0:
            realized = (float(jax.device_get(self._proj_ok_sum))
                        / self.PROJ_FEEDBACK_PERIOD)
            self._proj_ok_sum = None  # window reset
            self.realized_cert_rate = realized
            if realized < self.PROJ_REALIZED_MIN:
                self.proj_index = None
                self.proj_demoted = True

    def _probe_projection(self):
        """Build the projection index and estimate the certification
        bound's hit rate with synthetic in-distribution probes: midpoints
        of projection-adjacent reference pairs (representative local
        geometry WITHOUT d=0 self-matches, which would certify trivially).
        A low rate leaves projection disabled — queries serve fused."""
        from tpu_knn.kernels.projection import (
            auto_window, build_projection_index, _build_pallas_window_query,
        )

        proj_index = build_projection_index(self.ref_dev)
        ref_sorted = proj_index[0]
        n_probe = min(64, self.n // 2)
        step = max(1, (self.n - 1) // n_probe)
        pos = np.arange(n_probe) * step
        probes = (ref_sorted[pos] + ref_sorted[pos + 1]) * 0.5
        window = auto_window(self.k, self.n)
        run = _build_pallas_window_query(n_probe, self.n, self.k, window)
        _idx, _d2, ok = run(jnp.asarray(probes), *proj_index)
        self.cert_rate = float(np.asarray(jax.device_get(ok)).mean())
        if self.cert_rate >= self.CERT_RATE_MIN:
            self.proj_index = proj_index

    #: Serving pads each batch up to the next power-of-two bucket so a
    #: varying-m request stream hits a handful of compiled pipelines
    #: instead of one XLA compile per distinct m (compiles are seconds;
    #: the padded rows cost < 2x compute on the padded fraction only).
    bucket_m: bool = True

    @staticmethod
    def _m_bucket(m: int) -> int:
        # Small batches keep their own {1, 2, 4} buckets: the diff-form
        # small-m kernel's cost is linear in the padded m, so padding a
        # single-query lookup to 8 would double-to-octuple its VPU sweep.
        if m <= 4:
            return 1 << max(0, m - 1).bit_length()
        return max(8, 1 << (m - 1).bit_length())

    def query(self, search, neighbors: int | None = None):
        """search (m, k) -> (idx (m,) i32, d2 (m,) f32) arrays (device
        arrays for device strategies; host arrays from the CPU-native
        KD-tree backend).

        neighbors=K (serving extension beyond the reference's 1-NN
        contract) returns (idx (m, K), d2 (m, K)) — including K=1, so
        callers parameterizing K always get two-dimensional rows —
        ascending by exact (d2, index) (kernels/topk.py).

        Metric indexes return the metric's native score in the second
        slot instead of d2 — cosine similarity (descending) or the
        exact f32 inner product (descending) — same index semantics
        (see the class docstring)."""
        if self.mutable and self.n_live < 1:
            raise ValueError("index has no live points")
        if self.metric != "l2":
            search = self._transform_q(search)
        if self.store == "int8":
            search = self._i8_q(search)   # grid space (see _init_int8)
        if neighbors is not None:
            idx, d2 = self._query_topk(search, neighbors)
            return self._metric_scores(search, idx, d2)
        m = search.shape[0]
        if self.strategy == "kdtree" and self.use_native_query:
            # CPU-native backend: keep everything on the host (a device
            # round-trip of even tiny arrays costs ~10-30 ms on the dev
            # tunnel).
            from tpu_knn import native

            kdt2 = self._serving_tree()
            if kdt2 is not None:
                return kdt2.query(np.ascontiguousarray(search, np.float32))
            idx, d2 = native.kdtree_query(
                np.ascontiguousarray(search, np.float32), self.ref,
                self.tree.p, self.tree.dim)
            return idx, d2
        search = jnp.asarray(search, jnp.float32)
        mb = self._m_bucket(m) if self.bucket_m else m
        if mb != m:
            # Edge padding: duplicate real queries so padded rows behave
            # like in-distribution work (and certify under v11's bound).
            search = jnp.concatenate(
                [search, jnp.broadcast_to(search[-1:], (mb - m, self.k))])
        idx, d2 = self._query_padded(search, m)
        if mb != m:
            idx, d2 = idx[:m], d2[:m]
        if self.store == "int8":
            d2 = d2 * self._i8_s2   # back to user units (monotone)
        return self._metric_scores(search[:m], idx, d2)

    def pipeline(self, m: int):
        """Return (run, ops) for the prepared device query pipeline at
        batch size ``m``: ``run(search, *ops) -> (idx, d2)``, with `run`
        jit-traceable and `ops` the device-resident prepared operands.

        For integrations that embed the query in a larger jit (or an
        amplified timing loop). fused/auto expose the prepared
        single-chip pipeline; "sharded" exposes the shard_map pipeline
        over the pre-sharded operands (ops = (r_sharded,)) — queries in
        USER space for every store (the int8 grid transform and d2
        rescale ride inside the returned run). The spatial strategies
        (kdtree/projection) have no single-program pipeline."""
        if self.strategy == "sharded":
            if self.store == "int8":
                from tpu_knn.distributed.sharded import _build_sharded_int8

                # Cache the jitted wrapper per m: a fresh @jax.jit closure
                # is a jit-cache miss on every call (CLAUDE.md trap; same
                # rule as _i8_pipe_cache on the fused path).
                cache = self.__dict__.setdefault("_sharded_i8_pipe_cache", {})
                if m not in cache:
                    run0 = _build_sharded_int8(
                        m, self.n, self.k, self._n_local, self.mesh,
                        cutoff_scale=1.0 / self._i8_s2)
                    z = self._i8_zero_dev
                    inv_s, s2 = self._i8_inv_s, self._i8_s2

                    @jax.jit
                    def run_i8(search, grid):
                        idx, d2 = run0((search - z) * inv_s, grid)
                        return idx, d2 * s2

                    cache[m] = run_i8
                return cache[m], (self.r_sharded,)
            from tpu_knn.distributed.sharded import _build_sharded

            run = _build_sharded(m, self._n_eff, self.k, self.mesh,
                                 tile_n=self.tile_n, prepadded=True,
                                 precision=self.precision)
            return run, (self.r_sharded,)
        if self.strategy not in ("fused", "auto"):
            raise ValueError(
                f"pipeline() requires the fused/auto/sharded strategy, "
                f"not {self.strategy!r}")
        if self.store == "int8":
            return self._i8_pipeline(m)
        from tpu_knn.kernels.smallm import (
            aos_scan_applicable, smallm_applicable,
        )

        n = self._n_eff
        aos_ok = getattr(self, "_aos_selfmasked", True)
        if (smallm_applicable(m, self.k, n)
                or (aos_ok and aos_scan_applicable(m, self.k, n))) \
                and len(self.r_ops) == 1:
            return (_build_smallm_prepared(m, n, self.k, aos_ok=aos_ok),
                    (self.r_ops, self.ref_dev))
        tile_m, _ = pick_tiles(self.k, m, n)
        run = _build_prepared_query(m, n, self.k, tile_m,
                                    self.tile_n, self.precision)
        return run, (self.r_ops, self.ref_dev)

    def _i8_pipeline(self, m: int):
        """pipeline() for the int8 mode: ONE jit containing the grid
        transform, the route _query_padded would take, and the d2
        rescale — so embedded/amplified timing measures the true
        end-to-end serving cost (including, for batch m, the per-call
        bf16 grid-operand materialization the mode's memory contract
        implies)."""
        from tpu_knn.kernels.dense import dense_applicable, _dense
        from tpu_knn.kernels.smallm import SMALLM_MAX_M, _build_aos_scan

        cache = self.__dict__.setdefault("_i8_pipe_cache", {})
        if m not in cache:
            z, inv_s = self._i8_zero_dev, self._i8_inv_s
            s2 = self._i8_s2
            if dense_applicable(m, self.k, self.n):
                inner = _dense
            elif m <= SMALLM_MAX_M:
                inner = _build_aos_scan(m, self.n, self.k)
            else:
                builder = _build_fused_candidates(
                    8, self.n, self.k, 8, self.tile_n, soa=True,
                    precision=self.precision)
                tile_m, _ = pick_tiles(self.k, m, self.n)
                run_q = _build_prepared_query(
                    m, self.n, self.k, tile_m, self.tile_n,
                    self.precision, cutoff_scale=1.0 / s2)

                def inner(qq, g, _b=builder, _r=run_q):
                    return _r(qq, _b.prep_soa(g.astype(jnp.bfloat16)), g)

            @jax.jit
            def run(search, g, _inner=inner):
                qq = (jnp.asarray(search, jnp.float32) - z) * inv_s
                idx, d2 = _inner(qq, g)
                return idx, d2 * s2

            cache[m] = run
        return cache[m], (self.ref_dev,)

    def query_radius(self, search, radius: float,
                     max_results: int | None = None):
        """Exact fixed-radius neighbors (static output shape — see
        kernels/topk.py:within_radius). Returns (idx (m, cap),
        d2 (m, cap), count (m,)): rows ascending by exact (d2, index),
        padded -1/+inf.

        max_results=<int>: single-shot with that cap — a full row means
        the cap MAY have truncated the true in-radius set (count <
        max_results certifies completeness). A cap beyond n_live is
        clamped internally and the output padded back (the cap is on
        RESULTS, not a neighbors-parameter constraint).
        max_results=None (default): escalate the cap (doubling — each a
        compile-cache bucket) until no row truncates, returning each
        query's TRUE in-radius set; raises if some query's in-radius set
        exceeds the engine ceiling (kernels/topk.py:
        PASSES_MAX_NEIGHBORS). All machinery is the shared
        kernels/topk.py:_radius_query loop over this index's prepared
        top-K pipeline.

        metric="cosine": ``radius`` is instead the MINIMUM similarity in
        [-1, 1] (the exact L2 threshold over unit vectors is
        sqrt(2 - 2*s_min)); rows come back (idx, similarity, count),
        similarity descending, padding -1/-inf. metric="ip" has no
        radius analog (inner product is unbounded per query) — raises."""
        from tpu_knn.kernels.topk import _radius_query

        if self.metric == "ip":
            raise ValueError(
                "metric='ip' has no radius-query analog (the inner "
                "product is not a distance); use query(neighbors=K)")
        if self.metric == "cosine":
            if not -1.0 <= radius <= 1.0:
                raise ValueError(
                    "metric='cosine': radius is a minimum similarity in "
                    f"[-1, 1], got {radius}")
            search = self._transform_q(search)
            idx, d2, cnt = _radius_query(
                lambda eff: self._query_topk(search, eff),
                self.n_live, float(np.sqrt(max(2.0 - 2.0 * radius, 0.0))),
                max_results)
            _, sim = self._metric_scores(search, idx, d2)
            return idx, sim, cnt
        if self.store == "int8":
            # Grid-space transform here; _query_topk returns USER-unit
            # d2 (scaled on exit), so the radius compare below is in the
            # user's units with no threshold transform.
            search = self._i8_q(search)
        return _radius_query(
            lambda eff: self._query_topk(search, eff),
            self.n_live, radius, max_results)

    def _query_topk(self, search, neighbors: int):
        from tpu_knn.kernels.topk import _build_topk

        if self.strategy == "kdtree" and self.use_native_query:
            # Native CPU tree K-NN: bounded (d2, idx) max-heap per query
            # with the same lex tie rule (tpuknn_native.cc); the kdt2
            # serving tree handles K <= its in-traversal heap capacity,
            # the reference-format tree the (unbounded-K) remainder.
            from tpu_knn import native

            if not (1 <= neighbors <= self.n):
                raise ValueError(
                    f"neighbors must be in [1, {self.n}], got {neighbors}")
            kdt2 = (self._serving_tree()
                    if neighbors <= native.KDT2_TOPK_MAX else None)
            if kdt2 is not None:
                return kdt2.query_topk(
                    np.ascontiguousarray(search, np.float32), neighbors)
            return native.kdtree_query_topk(
                np.ascontiguousarray(search, np.float32), self.ref,
                self.tree.p, self.tree.dim, neighbors)
        if self.store == "int8":
            return self._i8_query_topk(search, neighbors)
        if self.strategy not in ("fused", "auto", "sharded") or (
                self.strategy != "sharded" and len(self.r_ops) != 1):
            raise ValueError(
                "neighbors>1 requires the fused/auto/sharded strategy "
                "(prepared SoA operand) or the native kdtree backend; "
                f"this index uses {self.strategy!r}")
        search, m, mb = self._topk_prep_batch(search, neighbors)
        if self.strategy == "sharded":
            # Prepared multi-chip top-K: both shard-resident operands
            # (AoS for the exact rerank, SoA for the scan) built once at
            # init — a query ships only itself (VERDICT r2 item 4).
            from tpu_knn.distributed.sharded import _build_sharded_topk

            run = _build_sharded_topk(mb, self._n_eff, self.k, neighbors,
                                      self.mesh, n_local=self._n_local,
                                      prepadded=True,
                                      precision=self.precision)
            idx, d2 = run(search, self.r_sharded, self.r_ops_sharded)
            return idx[:m], d2[:m]
        from tpu_knn.kernels.smallm import SMALLM_MAX_M
        from tpu_knn.kernels.topk import MAX_NEIGHBORS, _build_aos_topk

        if (mb == 1 and neighbors <= MAX_NEIGHBORS
                and getattr(self, "_aos_selfmasked", True)):
            # m=1 top-K: the zero-prep AoS cell engine over the resident
            # ref beats the prepared bounded sweep (k=16/K=16: 2.05 vs
            # 3.30 ms; k=3: 0.88 vs ~1.74). It is linear in m (one
            # roofline scan per row), so m >= 2 keeps the prepared
            # one-scan engines. +inf PAD/tombstone rows self-exclude;
            # an adversarial live-cell collapse degrades to the
            # engine's exact top_k fallback, never to an error.
            idx, d2 = _build_aos_topk(mb, self._n_eff, self.k,
                                      neighbors)(search, self.ref_dev)
            return idx[:m], d2[:m]
        run = _build_topk(mb, self._n_eff, self.k, neighbors,
                          self.r_ops[0].shape[1], self.precision)
        idx, d2 = run(search, self.r_ops, self.ref_dev)
        return idx[:m], d2[:m]

    def _topk_prep_batch(self, search, neighbors: int):
        """Shared top-K entry: validate the K cap, coerce the batch, and
        bucket+edge-pad m. One copy (review r3: the f32 and int8 entries
        carried two 15-line clones whose error messages had already
        drifted). Returns (search (mb, k) f32, m, mb)."""
        from tpu_knn.kernels.topk import PASSES_MAX_NEIGHBORS

        cap = min(self.n_live, PASSES_MAX_NEIGHBORS)
        if not (1 <= neighbors <= cap):
            raise ValueError(
                f"neighbors must be in [1, min(n_live, "
                f"{PASSES_MAX_NEIGHBORS})] = [1, {cap}], got {neighbors}")
        search = jnp.asarray(search, jnp.float32)
        m = search.shape[0]
        mb = self._m_bucket(m) if self.bucket_m else m
        if mb != m:
            search = jnp.concatenate(
                [search, jnp.broadcast_to(search[-1:], (mb - m, self.k))])
        return search, m, mb

    def _i8_query_topk(self, search, neighbors: int):
        """int8 top-K: ``search`` arrives ALREADY in grid space (the
        public entries transform); returns user-unit d2. m=1 runs the
        zero-prep AoS cell engine straight off the int8 grid (measured
        2.3x the f32 scan, scripts/r10_probe_int8.py); m>=2 runs the
        one-scan batch engines over a per-call bf16 grid operand
        (_i8_ops — grid integers are bf16-exact, so every route reports
        identical grid-space geometry)."""
        from tpu_knn.kernels.topk import (
            MAX_NEIGHBORS, _build_aos_topk, _build_topk,
        )

        search, m, mb = self._topk_prep_batch(search, neighbors)
        if self.strategy == "sharded":
            from tpu_knn.distributed.sharded import _build_sharded_int8_topk

            run = _build_sharded_int8_topk(mb, self.n, self.k, neighbors,
                                           self._n_local, self.mesh)
            idx, d2 = run(search, self.r_sharded)
        elif mb == 1 and neighbors <= MAX_NEIGHBORS:
            idx, d2 = _build_aos_topk(mb, self.n, self.k,
                                      neighbors)(search, self.ref_dev)
        else:
            ops = self._i8_ops()
            run = _build_topk(mb, self.n, self.k, neighbors,
                              ops[0].shape[1], self.precision)
            idx, d2 = run(search, ops, self.ref_dev)
        return idx[:m], d2[:m] * self._i8_s2

    def _query_padded(self, search, m_true: int):
        m = search.shape[0]
        if self.store == "int8":
            # Grid-space 1-NN (search already transformed; query()
            # rescales d2). m <= 4: the zero-prep XLA diff-form scan
            # straight off the int8 grid — at 4x less HBM it beats even
            # the prepared bf16 Pallas scan at every k (0.496 vs 0.817 ms
            # at (16, 1, 2^24), scripts/r10_probe_int8.py). Small n: the
            # dense exact path (same promotion). Batch m: the prepared
            # MXU pipeline over the per-call bf16 grid operand, with the
            # selection certificate rescaled to grid units (cutoff_scale
            # — score magnitudes and resolvable gaps both grow 1/s^2).
            from tpu_knn.kernels.dense import dense_applicable, _dense
            from tpu_knn.kernels.smallm import SMALLM_MAX_M, _build_aos_scan

            if self.strategy == "sharded":
                # Grid shards stay int8-resident per chip; the builder
                # routes m <= 4 to the masked AoS scan and batches to a
                # per-call upcast + the fused pipeline (certificate
                # rescaled to grid units).
                from tpu_knn.distributed.sharded import _build_sharded_int8

                run = _build_sharded_int8(
                    m, self.n, self.k, self._n_local, self.mesh,
                    cutoff_scale=1.0 / self._i8_s2)
                return run(search, self.r_sharded)
            if dense_applicable(m, self.k, self.n):
                return _dense(search, self.ref_dev)
            if m <= SMALLM_MAX_M:
                return _build_aos_scan(m, self.n, self.k)(search,
                                                          self.ref_dev)
            ops = self._i8_ops()
            tile_m, _ = pick_tiles(self.k, m, self.n)
            run = _build_prepared_query(m, self.n, self.k, tile_m,
                                        self.tile_n, self.precision,
                                        cutoff_scale=1.0 / self._i8_s2)
            return run(search, ops, self.ref_dev)
        if self.strategy in ("fused", "auto"):
            if self.strategy == "auto":
                from tpu_knn.kernels.projection import (
                    auto_window, projection_wins, _build_projection_pipeline,
                )

                # Cost model on the true batch size (padding is an
                # implementation detail, not extra user work).
                if (self.proj_index is not None
                        and projection_wins(self.k, m_true, self.n)):
                    self.last_strategy = "projection"
                    run = _build_projection_pipeline(
                        m, self.n, self.k, auto_window(self.k, self.n))
                    idx, d2, ok = run(search, self.ref_dev,
                                      *self.proj_index)
                    self._note_projection_batch(ok)
                    return idx, d2
                self.last_strategy = "fused"
            from tpu_knn.kernels.smallm import (
                aos_scan_applicable, smallm_applicable,
            )

            n = self._n_eff
            aos_ok = getattr(self, "_aos_selfmasked", True)
            if (smallm_applicable(m, self.k, n)
                    or (aos_ok and aos_scan_applicable(m, self.k, n))) \
                    and len(self.r_ops) == 1:
                # The diff-form VPU kernel serves tiny batches off the
                # very same SoA operand (still the "fused" strategy — a
                # kernel choice, not a route). Embedding-scale k (> 32)
                # at m <= 4 takes the roofline AoS scan over ref_dev
                # instead (aos_scan_applicable) — PAD/tombstone +inf
                # rows self-exclude; filtered views (aos_ok=False) keep
                # the masked fused pipeline.
                run = _build_smallm_prepared(m, n, self.k, aos_ok=aos_ok)
                return run(search, self.r_ops, self.ref_dev)
            from tpu_knn.kernels.dense import dense_applicable, _dense

            if dense_applicable(m, self.k, n) and aos_ok:
                # Small reference sets skip the streaming pipeline (same
                # routing as per-call fused_knn — ADVICE r2: SERVING.md
                # promised this route; PAD slots of mutable indexes
                # self-exclude via their +inf diff-form distance).
                # Filtered views skip it: _dense scans the SHARED
                # unmasked ref_dev and would see excluded points.
                return _dense(search, self.ref_dev)
            tile_m, _ = pick_tiles(self.k, m, n)
            run = _build_prepared_query(m, n, self.k, tile_m,
                                        self.tile_n, self.precision)
            return run(search, self.r_ops, self.ref_dev)
        if self.strategy == "projection":
            from tpu_knn.kernels.projection import projection_knn

            return projection_knn(search, self.ref_dev,
                                  prebuilt=self.proj_index)
        if self.strategy == "kdtree":
            if self.dev_tree is not None:
                return self.dev_tree.query(search)
            from tpu_knn.kdtree.build import query_numpy

            idx, d2 = query_numpy(self.tree, np.asarray(search))
            return idx, d2
        # sharded: refs already padded + device-resident with the sp
        # sharding; the jitted pipeline sees a matching input and inserts
        # no transfers. _n_eff = slot capacity for mutable indexes (PAD
        # slots self-exclude), the logical n otherwise.
        from tpu_knn.distributed.sharded import _build_sharded

        run = _build_sharded(m, self._n_eff, self.k, self.mesh,
                             tile_n=self.tile_n, prepadded=True,
                             precision=self.precision)
        return run(search, self.r_sharded)
