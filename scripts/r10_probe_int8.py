"""Round-3 TPU probe #10 (part 1): int8 storage groundwork facts.

Questions this answers on the real chip, before building store="int8":

  1. Physical footprint of int8 arrays (memory_stats deltas): does an
     (n, 16) int8 AoS array store compactly (16n bytes), and does a
     (16, n) int8 SoA array pay the 32-sublane tile padding (32n)?
  2. Does the XLA zero-prep AoS diff-form scan accept an int8 ref and
     at what speed vs bf16/f32 (read-bound m=1 flagship)?
  3. Does Mosaic accept an int8 (128, W) operand block and an
     int8 x int8 -> int32 dot_general inside a Pallas kernel?
  4. The m=1 AoS cell top-K engine over an int8 ref array.

Run alone: python scripts/r10_probe_int8.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms


def _time(label, fn, *args):
    try:
        def step(i, c, *a):
            return c + fn(i, *a)

        ms, it = calibrated_amplified_ms(step, *args)
        print(f"{label}: {ms:8.3f} ms (x{it})", flush=True)
        return ms
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {e}"[:300], flush=True)
        return None


def _consume(idx, d2):
    return jnp.sum(d2) + jnp.sum(idx).astype(jnp.float32) * 1e-9


def _used_bytes():
    st = jax.local_devices()[0].memory_stats()
    return st.get("bytes_in_use", 0) if st else 0


def footprint(label, make):
    before = _used_bytes()
    arr = jax.block_until_ready(make())
    after = _used_bytes()
    logical = arr.size * arr.dtype.itemsize
    print(f"{label}: logical {logical/2**20:8.2f} MiB  physical "
          f"{(after-before)/2**20:8.2f} MiB", flush=True)
    return arr


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(1)
    n = 1 << 24
    k = 16

    # ---- 1. footprints ----------------------------------------------
    ref_f32 = footprint(
        "AoS (2^24,16) f32 ",
        lambda: jax.random.uniform(key, (n, k), jnp.float32))
    ref_i8 = footprint(
        "AoS (2^24,16) int8",
        lambda: jnp.clip(jnp.round((ref_f32 - 0.5) * 254.0), -127, 127)
        .astype(jnp.int8))
    footprint("SoA (16,2^24) int8", lambda: ref_i8.T.copy())
    footprint("stacked (128,2^21) int8",
              lambda: ref_i8.reshape(n // 8, 128).T.copy())
    footprint("norms (8,2^21) f32",
              lambda: jnp.sum(ref_i8.astype(jnp.float32) ** 2, axis=1)
              .reshape(n // 8, 8).T.copy())
    footprint("(1,2^24) f32", lambda: jnp.zeros((1, n), jnp.float32))

    # ---- 2. XLA AoS diff-form scan over int8 ------------------------
    from tpu_knn.kernels.smallm import _build_aos_scan

    q = jax.random.uniform(jax.random.PRNGKey(2), (1, k), jnp.float32)
    qg = (q - 0.5) * 254.0  # grid-space query
    run = _build_aos_scan(1, n, k)

    def scan_step(i, r, qg=qg, run=run):
        idx, d2 = run(qg + i * 1e-9, r)
        return _consume(idx, d2)

    _time("aos_scan m=1 k=16 f32 ", scan_step, ref_f32)
    _time("aos_scan m=1 k=16 bf16", scan_step, ref_f32.astype(jnp.bfloat16))
    _time("aos_scan m=1 k=16 int8", scan_step, ref_i8)

    # ---- 4. m=1 AoS cell top-K over int8 -----------------------------
    from tpu_knn.kernels.topk import _build_aos_topk

    topk1 = _build_aos_topk(1, n, k, 16)

    def aos_topk_step(i, r, qg=qg, run=topk1):
        idx, d2 = run(qg + i * 1e-9, r)
        return _consume(idx, d2)

    _time("aos_topk m=1 K=16 f32 ", aos_topk_step, ref_f32)
    _time("aos_topk m=1 K=16 int8", aos_topk_step, ref_i8)

    # ---- 3. Mosaic int8 block + int8 matmul smoke --------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 512

    def kern(q_ref, r_ref, out_ref):
        acc = jax.lax.dot_general(
            q_ref[:], r_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out_ref[:] = acc

    qi8 = jnp.ones((32, 128), jnp.int8)
    ri8 = jnp.ones((128, W), jnp.int8)
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((32, W), jnp.int32),
        )(qi8, ri8)
        print("pallas int8 dot: OK, out[0,0] =", int(out[0, 0]), flush=True)
    except Exception as e:
        print(f"pallas int8 dot: FAILED {type(e).__name__}: {e}"[:400],
              flush=True)

    # int8 x int8 via XLA dot_general (outside pallas) as a reference.
    try:
        o2 = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))(qi8, ri8)
        print("xla int8 dot: OK, out[0,0] =", int(o2[0, 0]), flush=True)
    except Exception as e:
        print(f"xla int8 dot: FAILED {type(e).__name__}: {e}"[:400],
              flush=True)


if __name__ == "__main__":
    main()
