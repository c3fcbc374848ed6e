#!/usr/bin/env python3
"""Per-version benchmark table — the analog of the reference README's
v0-v8 x ds8-11 tables (README.md:281-291), measured device-resident.

Writes docs/VERSION_BENCH.md. Usage: python scripts/bench_versions.py
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

# Reference numbers for the footer (BASELINE.md).
REF_ROWS = {
    "v0 serial CPU": (46.044, 201.456, 2804.439, 12104.106),
    "v4 (1x V100)": (97.289, 410.671, 17.890, 46.449),
    "v7 (1x V100)": (58.224, 343.083, 20.012, 48.639),
    "v8 (4x V100)": (25.650, 100.346, 9.971, 17.292),
}


def main():
    import jax
    import jax.numpy as jnp

    from tpu_knn.harness.timing import calibrated_amplified_ms
    from tpu_knn.kernels.dma_pipeline import dma_knn
    from tpu_knn.kernels.fused import fused_knn
    from tpu_knn.kernels.twolevel import twolevel_knn
    from tpu_knn.kernels.twophase import _v2_argmin
    from tpu_knn.utils.shapes import round_up

    _ = jax.device_get(jnp.zeros((8, 128)))  # absorb cold start

    def v2_fn(q, r):
        from tpu_knn.kernels.twophase import V2_CHUNK

        n = r.shape[0]
        chunk = min(V2_CHUNK, round_up(n, 128))
        n_pad = round_up(n, chunk)
        rp = jnp.pad(r, ((0, n_pad - n), (0, 0))) if n_pad != n else r
        return _v2_argmin(q, rp, n, chunk)

    paths = [
        ("v2 (scan two-phase XLA)", lambda q, r: v2_fn(q, r)),
        ("v4 (fused Pallas, SoA)", lambda q, r: fused_knn(q, r)[0]),
        ("v5 (fused + manual DMA)", lambda q, r: dma_knn(q, r)[0]),
        ("v7 (two-level partitions)", lambda q, r: twolevel_knn(q, r)[0]),
    ]

    key = jax.random.PRNGKey(0)
    results = {}
    for si, (name, k, m, n) in enumerate(SHAPES):
        kq = jax.random.fold_in(key, si)
        q = jax.random.uniform(jax.random.fold_in(kq, 1), (m, k), jnp.float32)
        r = jax.random.uniform(jax.random.fold_in(kq, 2), (n, k), jnp.float32)
        q.block_until_ready(); r.block_until_ready()
        for vname, fn in paths:
            try:
                # Amplified in-dispatch protocol (harness/timing.py):
                # block_until_ready is unreliable over the axon tunnel.
                def step(i, c, q, r, fn=fn):
                    eps = i.astype(jnp.float32) * 1e-9
                    return c + fn(q + eps, r + eps)[0].astype(jnp.float32) * 1e-9

                ms, _iters = calibrated_amplified_ms(step, q, r,
                                                     target_ms=300.0)
            except Exception as e:
                ms = float("nan")
                print(f"{vname} @ {name}: FAILED {type(e).__name__}",
                      file=sys.stderr)
            results.setdefault(vname, {})[name] = ms
            print(f"# {vname} @ {name}: {ms:.3f} ms", file=sys.stderr,
                  flush=True)

    lines = [
        "# Per-version benchmark (one TPU v5e chip, device-resident, ms)",
        "",
        "The analog of the reference README's version tables "
        "(README.md:281-291). Shapes: ds8=(3,1,2^24), ds9=(16,1,2^24), "
        "ds10=(3,1024,2^20), ds11=(16,1024,2^20). Amplified in-dispatch "
        "timing (harness/timing.py:amplified_ms — N dependent iterations "
        "inside one jit, completion forced by host readback); day-to-day "
        "device/tunnel variance is ±20-30%, so compare rows within this "
        "table, not against tables from other days.",
        "",
        "| version | ds8 | ds9 | ds10 | ds11 |",
        "|---|---|---|---|---|",
    ]
    for vname, row in results.items():
        cells = " | ".join(f"{row[s[0]]:.2f}" for s in SHAPES)
        lines.append(f"| {vname} | {cells} |")
    lines += [
        "",
        "Reference (BASELINE.md, for the same shapes):",
        "",
        "| version | ds8 | ds9 | ds10 | ds11 |",
        "|---|---|---|---|---|",
    ]
    for vname, vals in REF_ROWS.items():
        cells = " | ".join(f"{v:.2f}" for v in vals)
        lines.append(f"| {vname} | {cells} |")
    lines.append("")
    with open("docs/VERSION_BENCH.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote docs/VERSION_BENCH.md", file=sys.stderr)


if __name__ == "__main__":
    main()
