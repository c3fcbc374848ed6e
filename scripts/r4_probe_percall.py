"""Round-3 TPU probe #7: can the per-call m-small prep transpose go away?

XLA stores (n, k<=16) f32 arrays column-major ({0,1} minor-to-major) on
TPU — a device-resident AoS reference array is PHYSICALLY already the
SoA bytes the smallm kernel wants.  The committed prep
(jnp.pad(ref, ...).T, fused.py) measured ~3.5 ms at (2^24, 16) — this
probe asks which part is unavoidable:

  1. pad+T (the committed prep) at (2^24,16) and (2^24,3);
  2. plain ref.T with NO pad at (2^24,16) (k == k_pad, n % tile == 0:
     if XLA bitcasts the layout-compatible transpose this is ~0 ms and
     the ds9-shaped per-call prep is free);
  3. sublane-pad only at (2^24,3) (k=3 -> k_pad=8; lane dim untouched);
  4. a pure-XLA AoS scan baseline: argmin(sum((ref-q)^2, -1)) straight
     off the (n, k) array, no Pallas — if XLA handles the narrow minor
     dim well this bounds what any zero-prep path must beat;
  5. smallm end-to-end off a PRE-TRANSPOSED operand (the known 1.6 ms
     roofline scan, for the same-session comparison).

Run alone: python scripts/r4_probe_percall.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms
from tpu_knn.utils.shapes import round_up


def _time(label, fn, *args):
    try:
        def step(i, c, *a):
            return c + fn(i, *a)

        ms, it = calibrated_amplified_ms(step, *args)
        print(f"{label}: {ms:8.3f} ms (x{it})", flush=True)
        return ms
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {e}"[:240], flush=True)
        return None


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(1)

    for n, k in (((1 << 24), 16), ((1 << 24), 3)):
        k_pad = round_up(k, 8)
        ref = jnp.asarray(rng.random((n, k), np.float32))
        jax.block_until_ready(ref)
        print(f"--- (n={n}, k={k}) layouts "
              f"{[jax.typeof(ref)]}", flush=True)

        @jax.jit
        def prep_padT(i, r):
            out = jnp.pad(r + i.astype(jnp.float32) * 1e-9,
                          ((0, 0), (0, k_pad - k))).T
            return out[0, 0] + out[-1, -1]

        @jax.jit
        def prep_T(i, r):
            out = (r + i.astype(jnp.float32) * 1e-9).T
            return out[0, 0] + out[-1, -1]

        @jax.jit
        def prep_subpad(i, r):
            # k -> k_pad pad only (sublane dim of the {0,1} layout).
            out = jnp.pad(r + i.astype(jnp.float32) * 1e-9,
                          ((0, 0), (0, k_pad - k)))
            return out[0, 0] + out[-1, -1]

        _time(f"pad+T   (k{k})", prep_padT, ref)
        _time(f"T only  (k{k})", prep_T, ref)
        if k_pad != k:
            _time(f"subpad  (k{k})", prep_subpad, ref)

        q = jnp.asarray(rng.random((1, k), np.float32))

        @jax.jit
        def xla_scan(i, q, r):
            d = r - (q + i.astype(jnp.float32) * 1e-9)
            s = jnp.sum(d * d, axis=-1)
            j = jnp.argmin(s)
            return s[j] + j.astype(jnp.float32) * 1e-9

        _time(f"xla m=1 (k{k})", xla_scan, q, ref)

        # m=4 variant of the XLA scan (the smallm regime's upper edge)
        q4 = jnp.asarray(rng.random((4, k), np.float32))

        @jax.jit
        def xla_scan4(i, q, r):
            d = r[None, :, :] - (q[:, None, :] + i.astype(jnp.float32) * 1e-9)
            s = jnp.sum(d * d, axis=-1)
            j = jnp.argmin(s, axis=1)
            return s[0, j[0]] + j.sum().astype(jnp.float32) * 1e-9

        _time(f"xla m=4 (k{k})", xla_scan4, q4, ref)

        # smallm kernel off a prepared operand (same-session roofline)
        from tpu_knn.kernels.smallm import _build_smallm_candidates
        cand = _build_smallm_candidates(1, n, k)
        r_op = jax.jit(lambda r: jnp.pad(
            r, ((0, round_up(n, cand.tile_n) - n), (0, k_pad - k))).T)(ref)
        jax.block_until_ready(r_op)

        @jax.jit
        def smallm_prepared(i, q, r_op):
            ci, cs = cand(q + i.astype(jnp.float32) * 1e-9, (r_op,))
            return cs[0, 0] + ci[0, 0].astype(jnp.float32) * 1e-9

        _time(f"smallm prepared (k{k})", smallm_prepared, q, r_op)
        del r_op, ref
    print("done", flush=True)


if __name__ == "__main__":
    main()
