"""r7 probe, part 2: validate the Pallas cell compactor against a NumPy
reference and time it at the engine geometries.

CPU first (interpreted Pallas): python -c "import jax; ..." — run with
JAX_PLATFORMS unset on TPU for the timing legs.

  python scripts/r7_probe_compact2.py cpu    # correctness only
  python scripts/r7_probe_compact2.py tpu    # correctness + timing
"""
import sys

import numpy as np

sys.path.insert(0, ".")

MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"

if MODE == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels.topk import _build_cell_compactor


def ref_compact(fields, parts, cap):
    m, nc = fields[0].shape
    pw = nc // parts
    outs = [np.zeros((m, parts * cap), np.int32)
            for _ in range(len(fields) + 1)]
    for r in range(m):
        for p in range(parts):
            s = 0
            for c in range(pw):
                if fields[0][r, p * pw + c] != 0 and s < cap:
                    outs[0][r, p * cap + s] = c
                    for f in range(len(fields)):
                        outs[f + 1][r, p * cap + s] = fields[f][r, p * pw + c]
                    s += 1
    return outs


def check(m, nc, parts, cap, nf, density, seed):
    rng = np.random.default_rng(seed)
    qual = rng.random((m, nc)) < density
    fields = []
    a0 = np.where(qual, rng.integers(1, 1 << 30, (m, nc)), 0).astype(np.int32)
    fields.append(a0)
    for _ in range(nf - 1):
        fields.append(np.where(qual, rng.integers(0, 1 << 26, (m, nc)),
                               0).astype(np.int32))
    comp = _build_cell_compactor(m, nc, parts, cap, nf)
    got = [np.asarray(o) for o in comp(*[jnp.asarray(f) for f in fields])]
    want = ref_compact(fields, parts, cap)
    for i, (g, w) in enumerate(zip(got, want)):
        if not np.array_equal(g, w):
            bad = np.argwhere(g != w)
            print(f"  MISMATCH out[{i}] at {bad[:5]}: got "
                  f"{g[tuple(bad[0])]} want {w[tuple(bad[0])]}")
            return False
    return True


def main():
    ok = True
    cases = [
        (16, 512, 1, 8, 1, 0.02, 0),
        (16, 512, 1, 8, 2, 0.05, 1),      # overflow rows expected
        (16, 1024, 4, 8, 2, 0.01, 2),
        (8, 8192, 4, 48, 2, 110 / 8192, 3),   # K=64 geometry, small m
        (8, 8192, 1, 144, 2, 110 / 8192, 4),  # escalation tier, out_w=256
        (8, 16384, 1, 48, 2, 0.005, 5),       # w_tiles > 1 (pw > 4096)
        (13, 4096, 1, 48, 1, 50 / 4096, 6),   # ragged m, quad geometry
        (16, 512, 1, 8, 2, 0.0, 7),           # all-empty
    ]
    for case in cases:
        good = check(*case)
        ok &= good
        print(f"case {case}: {'OK' if good else 'FAIL'}", flush=True)
    if MODE == "tpu" and ok:
        rng = np.random.default_rng(9)
        for label, m, nc, parts, cap, nf, dens in [
                ("K64 geom (m=1024, nc=8192, 4x48, 3 fld)",
                 1024, 8192, 4, 48, 2, 110 / 8192),
                ("K32 geom (m=1024, nc=4096, 1x48, 3 fld)",
                 1024, 4096, 1, 48, 2, 50 / 4096),
                ("K16 geom (m=1024, nc=4096, 1x48, 2 fld)",
                 1024, 4096, 1, 48, 1, 25 / 4096),
                ("K64 escalation (m=1024, nc=8192, 1x144)",
                 1024, 8192, 1, 144, 2, 110 / 8192)]:
            qual = rng.random((m, nc)) < dens
            fields = [jnp.asarray(np.where(
                qual, rng.integers(1, 1 << 30, (m, nc)), 0,
            ).astype(np.int32)) for _ in range(nf)]
            comp = _build_cell_compactor(m, nc, parts, cap, nf)

            def step(i, c, *fs):
                outs = comp(*[f + i for f in fs])
                return c + outs[0][0, 0].astype(jnp.float32) * 1e-9

            ms, it = calibrated_amplified_ms(step, *fields)
            print(f"{label}: {ms:.3f} ms (x{it})", flush=True)
    print("ALL OK" if ok else "FAILURES", flush=True)


if __name__ == "__main__":
    main()
