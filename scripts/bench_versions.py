#!/usr/bin/env python3
"""Per-version benchmark table — the analog of the reference README's
v0-v8 x ds8-11 table (README.md:281-291) and its KD-tree build/query
split (README.md:334-343), measured device-resident with the amplified
in-dispatch protocol (VERDICT r2 item 3: every ladder version gets a
committed row, readable side-by-side with the reference's table).

Writes docs/VERSION_BENCH.md. Usage: python scripts/bench_versions.py
(ONE TPU process at a time.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = [
    ("ds8", 3, 1, 1 << 24),
    ("ds9", 16, 1, 1 << 24),
    ("ds10", 3, 1024, 1 << 20),
    ("ds11", 16, 1024, 1 << 20),
]

# Reference numbers for the footer (BASELINE.md; v0 = serial CPU,
# v1-v7 = 1x V100, v8 = 4x V100).
REF_ROWS = {
    "v0 (serial CPU)": (46.044, 201.456, 2804.439, 12104.106),
    "v1 (two-phase, thrust argmin)": (48.321, 236.344, 384.369, 488.961),
    "v2 (+block tree-reduce argmin)": (61.228, 262.765, 40.041, 148.049),
    "v3 (fused distance+argmin)": (58.445, 338.374, 14.915, 128.129),
    "v4 (+AoS->SoA transpose)": (97.289, 410.671, 17.890, 46.449),
    "v5 (texture mem)": (107.971, 399.344, 18.036, 47.162),
    "v6 (+constant mem queries)": (67.248, 346.049, 17.656, 64.690),
    "v7 (+multi-block occupancy)": (58.224, 343.083, 20.012, 48.639),
    "v8 (4-GPU sharding)": (25.650, 100.346, 9.971, 17.292),
}


def host_ms(fn, min_reps: int = 1, budget_s: float = 10.0) -> float:
    """Wall-time a HOST path (native CPU): best of as many reps as fit
    the budget (>= min_reps)."""
    best = float("inf")
    t_start = time.perf_counter()
    reps = 0
    while reps < min_reps or (time.perf_counter() - t_start < budget_s
                              and reps < 16):
        t0 = time.perf_counter()
        fn()
        best = min(best, (time.perf_counter() - t0) * 1e3)
        reps += 1
    return best


def main():
    import jax
    import jax.numpy as jnp

    from tpu_knn import native
    from tpu_knn.harness.timing import amplified_ms, calibrated_amplified_ms
    from tpu_knn.kernels.dma_pipeline import dma_knn
    from tpu_knn.kernels.fused import fused_knn
    from tpu_knn.kernels.twolevel import twolevel_knn
    from tpu_knn.kernels.twophase import (
        _v1_argmin, _v1_guard, _v2_argmin,
    )
    from tpu_knn.utils.shapes import round_up

    _ = jax.device_get(jnp.zeros((8, 128)))  # absorb cold start

    def v1_fn(q, r):
        return _v1_argmin(q, r)

    def v2_fn(q, r):
        from tpu_knn.kernels.twophase import V2_CHUNK

        n = r.shape[0]
        chunk = min(V2_CHUNK, round_up(n, 128))
        n_pad = round_up(n, chunk)
        rp = jnp.pad(r, ((0, n_pad - n), (0, 0))) if n_pad != n else r
        return _v2_argmin(q, rp, n, chunk)

    def v6_fn(q, r):
        return fused_knn(q, r, soa=True, tile_m=round_up(q.shape[0], 8))[0]

    # (label, fn, guard) — guard(k, m, n) False => the version's own
    # dispatch guard delegates on this shape (cell rendered with a note).
    paths = [
        ("v1 (matrix + argmin)", v1_fn, _v1_guard),
        ("v2 (scan two-phase XLA)", v2_fn, None),
        ("v3 (fused Pallas, AoS + on-chip transpose)",
         lambda q, r: fused_knn(q, r, soa=False)[0], None),
        ("v4 (fused Pallas, SoA)", lambda q, r: fused_knn(q, r)[0], None),
        ("v5 (fused + manual DMA)", lambda q, r: dma_knn(q, r)[0], None),
        ("v6 (whole query set VMEM-resident)", v6_fn, None),
        ("v7 (two-level partitions)", lambda q, r: twolevel_knn(q, r)[0],
         None),
        ("v8 (one chip: guard delegates to v7)",
         lambda q, r: twolevel_knn(q, r)[0], None),
    ]

    key = jax.random.PRNGKey(0)
    results = {}
    notes = {}
    for si, (name, k, m, n) in enumerate(SHAPES):
        kq = jax.random.fold_in(key, si)
        q = jax.random.uniform(jax.random.fold_in(kq, 1), (m, k), jnp.float32)
        r = jax.random.uniform(jax.random.fold_in(kq, 2), (n, k), jnp.float32)
        q.block_until_ready(); r.block_until_ready()

        # v0: the native OpenMP oracle (host path; wall-timed — the
        # reference's v0 row is its serial CPU analog).
        if native.available():
            qh = np.asarray(q)
            rh = np.asarray(r)
            ms0 = host_ms(lambda: native.oracle(qh, rh, parallel=True))
            results.setdefault("v0 (native OpenMP oracle, host CPU)",
                               {})[name] = ms0
            print(f"# v0 @ {name}: {ms0:.3f} ms", file=sys.stderr, flush=True)
            del qh, rh

        for vname, fn, guard in paths:
            if guard is not None and not guard(k, m, n):
                results.setdefault(vname, {})[name] = float("nan")
                notes.setdefault(vname, {})[name] = "guard->v2"
                print(f"# {vname} @ {name}: guard delegates",
                      file=sys.stderr, flush=True)
                continue
            try:
                def step(i, c, q, r, fn=fn):
                    # Full-row checksum (review r3: a row-0 read lets XLA
                    # slice per-row epilogues after the kernel).
                    eps = i.astype(jnp.float32) * 1e-9
                    return c + jnp.sum(
                        fn(q + eps, r + eps).astype(jnp.float32)) * 1e-9

                ms, _iters = calibrated_amplified_ms(step, q, r,
                                                     target_ms=300.0)
            except Exception as e:
                ms = float("nan")
                notes.setdefault(vname, {})[name] = "FAILED"
                print(f"{vname} @ {name}: FAILED {type(e).__name__}: {e}"[:300],
                      file=sys.stderr)
            results.setdefault(vname, {})[name] = ms
            print(f"# {vname} @ {name}: {ms:.3f} ms", file=sys.stderr,
                  flush=True)
        del q, r

    # ---- KD-tree / spatial-index table: (3, 1024, 65536), the
    # reference's README.md:334-343 split ----
    tree_rows = []
    k, m, n = 3, 1024, 65536
    rng = np.random.default_rng(7)
    qh = rng.random((m, k), np.float32)
    rh = rng.random((n, k), np.float32)
    if native.available():
        from tpu_knn.kdtree.build import build_kdtree

        t_build = host_ms(lambda: build_kdtree(rh))
        tree = build_kdtree(rh)
        t_query = host_ms(
            lambda: native.kdtree_query(qh, rh, tree.p, tree.dim))
        tree_rows.append(("v9 (native C++ KD-tree, host)", t_build, t_query,
                          "reference v9: 18.7 / 1.07 ms"))
        # kdt2: the leaf-bucketed serving tree NNIndex(kdtree) actually
        # queries (tpuknn_native.cc; reference-format v9 row above kept
        # for the ladder comparison).
        t2 = native.Kdt2Index(rh)
        t2_build = host_ms(lambda: native.Kdt2Index(rh))
        t2_query = host_ms(lambda: t2.query(qh))
        tree_rows.append(("kdt2 (leaf-bucketed serving tree, host)",
                          t2_build, t2_query,
                          "NNIndex(kdtree) serving backend"))
        # v10: batched device traversal (capability demo — dispatch-
        # excluded; see docs/PARITY.md "Dispatch decisions").
        try:
            from tpu_knn.kdtree.traversal import DeviceKDTree

            dt = DeviceKDTree(tree)
            qd = jnp.asarray(qh)

            def step10(i, c, qd):
                idx, _ = dt.query(qd + i.astype(jnp.float32) * 1e-9)
                return c + jnp.sum(idx.astype(jnp.float32)) * 1e-9

            ms10 = amplified_ms(step10, qd, iters=2, reps=2)
            tree_rows.append(("v10 (batched TPU traversal)", float("nan"),
                              ms10, "capability demo; reference v10: "
                              "24.8 / 0.433 ms"))
        except Exception as e:
            print(f"v10: FAILED {type(e).__name__}", file=sys.stderr)
    # v11: the projection window index at its serving niche (small m,
    # huge n) — build once, amplified query.
    try:
        from tpu_knn.kernels.projection import (
            auto_window, build_projection_index, _build_projection_pipeline,
        )

        k11, m11, n11 = 3, 16, 1 << 24
        r11 = jax.random.uniform(jax.random.fold_in(key, 99), (n11, k11),
                                 jnp.float32)
        q11 = jax.random.uniform(jax.random.fold_in(key, 98), (m11, k11),
                                 jnp.float32)
        t0 = time.perf_counter()
        idx11 = build_projection_index(r11)
        jax.block_until_ready(idx11)
        t_build11 = (time.perf_counter() - t0) * 1e3
        run11 = _build_projection_pipeline(m11, n11, k11,
                                           auto_window(k11, n11))

        def step11(i, c, q, r, *pre):
            out, d2, ok = run11(q + i.astype(jnp.float32) * 1e-9, r, *pre)
            return (c + jnp.sum(d2)
                    + jnp.sum(out.astype(jnp.float32)) * 1e-9
                    + jnp.sum(ok.astype(jnp.float32)) * 1e-9)

        ms11, _ = calibrated_amplified_ms(step11, q11, r11, *idx11,
                                          target_ms=300.0)
        tree_rows.append(("v11 (projection window index, (3,16,2^24))",
                          t_build11, ms11,
                          "TPU-native spatial index; full scan ~3 ms; "
                          "build includes cold-process compile/first-"
                          "touch — warm rebuild is sub-second"))
        del r11, q11, idx11
    except Exception as e:
        print(f"v11: FAILED {type(e).__name__}: {e}"[:300], file=sys.stderr)

    # ---- render ----
    lines = [
        "# Per-version benchmark (one TPU v5e chip, device-resident, ms)",
        "",
        "The analog of the reference README's version tables "
        "(README.md:281-291). Shapes: ds8=(3,1,2^24), ds9=(16,1,2^24), "
        "ds10=(3,1024,2^20), ds11=(16,1024,2^20). Amplified in-dispatch "
        "timing (harness/timing.py:amplified_ms — N dependent iterations "
        "inside one jit, completion forced by host readback); v0/v9 are "
        "host-CPU paths, wall-timed. Day-to-day device/tunnel variance "
        "is ±20-30%, so compare rows within this table, not against "
        "tables from other days.",
        "",
        "'guard->v2' marks shapes where the version's own dispatch guard "
        "delegates (v1's matrix would need m*n > 2^28 elements — the "
        "same adaptive posture as the reference's guards, "
        "core.cu:481-485); v8 on one chip delegates to v7 by its device-"
        "count guard (core.cu:865-872) — the row shows that path's cost; "
        "the mesh-scaling projection for real multi-chip v8 is in "
        "docs/PERF_NOTES.md.",
        "",
        "| version | ds8 | ds9 | ds10 | ds11 |",
        "|---|---|---|---|---|",
    ]

    def cell(vname, sname):
        v = results.get(vname, {}).get(sname, float("nan"))
        if np.isnan(v):
            note = notes.get(vname, {}).get(sname, "-")
            return "crash[1]" if note == "FAILED" else note
        return f"{v:.2f}"

    for vname in results:
        cells = " | ".join(cell(vname, s[0]) for s in SHAPES)
        lines.append(f"| {vname} | {cells} |")
    lines += [
        "",
        "Reference (BASELINE.md, same shapes; v0 serial CPU, v1-v7 1x "
        "V100, v8 4x V100):",
        "",
        "| version | ds8 | ds9 | ds10 | ds11 |",
        "|---|---|---|---|---|",
    ]
    for vname, vals in REF_ROWS.items():
        cells = " | ".join(f"{v:.2f}" for v in vals)
        lines.append(f"| {vname} | {cells} |")
    lines += [
        "",
        "[1] v3's AoS per-tile-transpose kernel at (m=1, n=2^24) now "
        "crashes the TPU AOT compile helper: a Pallas (n, k<=16) AoS "
        "operand forces the 8x lane-padded row-major layout "
        "(PERF_NOTES 'Per-call prep transpose') — the same wall that "
        "makes SoA the only viable big-n layout. v3's capability is "
        "still measured at the m=1024 shapes (its on-chip transpose "
        "costs ~2.3-2.5x v4's one XLA relayout, the reference's own "
        "v3-vs-v4 lesson, README.md:105-111).",
    ]
    if tree_rows:
        lines += [
            "",
            "## Spatial indexes — build / query split at (3, 1024, 65536)",
            "(reference README.md:334-343: v9 CPU 18.7 / 1.07 ms, "
            "v10 GPU 24.8 / 0.433 ms; v11 row at its own serving niche)",
            "",
            "| index | build ms | query ms | note |",
            "|---|---|---|---|",
        ]
        for name, b, qq, note in tree_rows:
            bb = "-" if np.isnan(b) else f"{b:.2f}"
            lines.append(f"| {name} | {bb} | {qq:.3f} | {note} |")
    lines.append("")
    with open("docs/VERSION_BENCH.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote docs/VERSION_BENCH.md", file=sys.stderr)


if __name__ == "__main__":
    main()
