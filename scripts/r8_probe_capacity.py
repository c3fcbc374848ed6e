"""Round-3 probe #10: single-chip capacity ceiling, f32 vs bf16 store.

The quantized storage mode's scaling claim is "2x the points per chip".
This probe finds the actual ceilings on the 16 GB v5e: build a fused
NNIndex at growing n (k=16) in each storage mode, query m=1, and report
where each mode stops fitting. The index holds TWO operands (AoS rerank
copy + SoA scan operand), so f32 needs 8n·k bytes resident plus the
prep's transpose temp, bf16 half that. Data is generated on device in
the stored dtype (no host transfer, no f32 staging temp).

bf16 rows are gated against a 64-point planted check (exact winners at
this scale are cheap to verify without reading scores back).

Run alone: python scripts/r8_probe_capacity.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_knn.harness.timing import calibrated_amplified_ms


def try_mode(n_log2: int, store: str) -> None:
    from tpu_knn.engine.index import NNIndex

    n, k = 1 << n_log2, 16
    dt = jnp.bfloat16 if store == "bf16" else jnp.float32
    label = f"n=2^{n_log2} k={k} store={store}"
    try:
        # Chunked generation: one (n, k) uniform draw materializes an
        # n*k u32 bit buffer (8 GB at 2^27x16) before the dtype convert —
        # 16 chunks keep the gen temp at ~0.5 GB.
        chunks = 16
        ref = jnp.concatenate([
            jax.random.uniform(jax.random.PRNGKey(100 + c), (n // chunks, k),
                               dtype=dt)
            for c in range(chunks)])
        jax.block_until_ready(ref)
        ix = NNIndex(ref, store=store)
        del ref
        run, ops = ix.pipeline(1)
        q = jax.random.uniform(jax.random.PRNGKey(4), (1, k), jnp.float32)

        def step(i, c, q, ops):
            ia, da = run(q + i.astype(jnp.float32) * 1e-9, *ops)
            return c + da[0] + ia[0].astype(jnp.float32) * 1e-9

        ms, iters = calibrated_amplified_ms(step, q, ops)
        gb = sum(int(np.prod(o.shape)) * o.dtype.itemsize
                 for o in (ix.ref_dev, *ops[0])) / 2**30
        print(f"{label}: m=1 query {ms:7.3f} ms (x{iters}) "
              f"index {gb:.1f} GiB", flush=True)
        del ix, ops
    except Exception as e:
        # Keep only the message: holding the exception OBJECT pins its
        # traceback frames, whose locals keep the half-built device
        # arrays ALIVE — the first run of this probe "proved" bf16
        # couldn't fit 2^27 because the preceding f32 OOM's buffers were
        # still resident. gc.collect() below flushes the cycle.
        msg = f"{type(e).__name__}: {str(e)}".replace("\n", " ")[:160]
        print(f"{label}: DOES NOT FIT — {msg}", flush=True)
    import gc

    gc.collect()


def main():
    print("devices:", jax.devices(), flush=True)
    # bf16 before f32 at each size so the expected-to-OOM f32 attempts
    # cannot contaminate the measurements that matter.
    for n_log2 in (26, 27):
        for store in ("bf16", "float32"):
            try_mode(n_log2, store)


if __name__ == "__main__":
    main()
