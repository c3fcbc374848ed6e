"""r17d: isolate the K64 compactor's cost driver — cap, parts, tile_m.
Correctness irrelevant (overflow fine): timing only.
Run on the real chip: python scripts/r17_compact_iso.py
"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.kernels import topk as T

M, NC = 1024, 8192

def consume(c, *outs):
    for o in outs:
        c = c + o.astype(jnp.float32).sum() * 1e-9
    return c

def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(3)
    qual = np.zeros((M, NC), bool)
    for r in range(M):
        qual[r, rng.choice(NC, 110, replace=False)] = True
    lanes = rng.integers(0, 128, (M, NC))
    a = np.where(qual, 1 | (lanes << 2) | (lanes * lanes << 12), 0).astype(np.int32)
    p3 = np.where(qual, lanes, 0).astype(np.int32)
    fa, fp = jnp.asarray(a), jnp.asarray(p3)
    for parts, cap, tile_m, nf in [(4, 48, 128, 2), (4, 24, 128, 2),
                                   (4, 12, 128, 2), (2, 48, 128, 2),
                                   (1, 48, 128, 2), (4, 48, 256, 2),
                                   (4, 48, 512, 2), (8, 24, 256, 2),
                                   (8, 24, 512, 2), (4, 48, 128, 1),
                                   (8, 48, 512, 2), (8, 12, 512, 2)]:
        try:
            comp = T._build_cell_compactor(M, NC, parts, cap, nf, tile_m=tile_m)
            fields = (fa,) if nf == 1 else (fa, fp)
            def step(i, c, *fs):
                fs = tuple(jnp.roll(f, i, axis=0) for f in fs)
                outs = comp(*fs)
                return consume(c, *outs)
            ms, it = calibrated_amplified_ms(step, *fields)
            print(f"parts={parts} cap={cap} tile_m={tile_m} nf={nf}: "
                  f"{ms:.3f} ms (x{it})", flush=True)
        except Exception as e:
            print(f"parts={parts} cap={cap} tile_m={tile_m} nf={nf}: FAILED "
                  f"{type(e).__name__}: {str(e)[:150]}", flush=True)

if __name__ == "__main__":
    main()
