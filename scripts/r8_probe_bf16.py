"""Round-3 TPU probe #8: bf16-stored reference operands.

A quantized storage mode (NNIndex store="bf16") halves index HBM and —
for the read-bound small-m scans — should halve query time. Every kernel
already computes in f32 (the operand upcasts at the read site:
fused._score_tile, smallm/_smallm_topk kernels), so results are the f32
pipeline's over the QUANTIZED point set. This probe measures, same
process, f32 vs bf16 operands:

  1. zero-prep AoS scan, m=1, n=2^24, k=16 and k=3 (the read-bound
     flagship: expect ~2x);
  2. prepared smallm Pallas scan, k=16 (does Mosaic take a (8, tile_n)
     bf16 block at all? sublane granularity risk);
  3. prepared fused candidates + full 1-NN pipeline at ds11
     (k=16, m=1024, n=2^20) — MXU-bound, expect a small read-side win;
  4. the m=1 AoS cell top-K engine at K=16 (read-bound, expect ~2x);
  5. the seeded batch top-K at ds11 K=8 (2 reads + moment machinery).

Prepared rows perturb only q (serving semantics); per-call AoS rows
perturb q only as well here because the bf16/f32 comparison needs the
same protocol on both sides and the operand is index-resident in the
serving story. Every output row folds into the carry (DCE trap).

Run alone: python scripts/r8_probe_bf16.py
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


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(1)

    # ---- m=1 zero-prep AoS scan, n=2^24 ----------------------------
    from tpu_knn.kernels.smallm import _build_aos_scan

    n = 1 << 24
    for k in (16, 3):
        ref_f32 = jax.random.uniform(key, (n, k), jnp.float32)
        ref_bf16 = ref_f32.astype(jnp.bfloat16)
        q = jax.random.uniform(jax.random.PRNGKey(2), (1, k), jnp.float32)
        run = _build_aos_scan(1, n, k)

        def scan_step(i, r, q=q, run=run):
            idx, d2 = run(q + i * 1e-9, r)
            return _consume(idx, d2)

        _time(f"aos_scan m=1 k={k} f32 ", scan_step, ref_f32)
        _time(f"aos_scan m=1 k={k} bf16", scan_step, ref_bf16)
        del ref_f32, ref_bf16

    # ---- prepared smallm Pallas scan, k=16, n=2^24 ------------------
    from tpu_knn.kernels.smallm import _build_smallm_candidates

    k = 16
    ref_f32 = jax.random.uniform(key, (n, k), jnp.float32)
    cand = _build_smallm_candidates(1, n, k)
    (op_f32,) = jax.jit(cand.prep)(ref_f32)
    op_bf16 = op_f32.astype(jnp.bfloat16)
    q = jax.random.uniform(jax.random.PRNGKey(2), (1, k), jnp.float32)

    def smallm_step(i, op, q=q, cand=cand):
        ci, cs = cand(q + i * 1e-9, (op,))
        return _consume(ci, cs)

    _time("smallm prepared k=16 f32 ", smallm_step, op_f32)
    _time("smallm prepared k=16 bf16", smallm_step, op_bf16)

    # ---- m=1 AoS cell top-K, K=16 -----------------------------------
    from tpu_knn.kernels.topk import _build_aos_topk

    topk1 = _build_aos_topk(1, n, k, 16)

    def aos_topk_step(i, r, q=q, run=topk1):
        idx, d2 = run(q + i * 1e-9, r)
        return _consume(idx, d2)

    ref_bf16 = ref_f32.astype(jnp.bfloat16)
    _time("aos_topk m=1 K=16 f32 ", aos_topk_step, ref_f32)
    _time("aos_topk m=1 K=16 bf16", aos_topk_step, ref_bf16)
    del ref_f32, ref_bf16, op_f32, op_bf16

    # ---- ds11 prepared fused 1-NN + seeded top-K --------------------
    from tpu_knn.engine.index import _build_prepared_query
    from tpu_knn.kernels.fused import _build_fused_candidates
    from tpu_knn.kernels.tuning import pick_tiles
    from tpu_knn.kernels.topk import _build_topk

    k, m, n2 = 16, 1024, 1 << 20
    ref = jax.random.uniform(key, (n2, k), jnp.float32)
    refb = ref.astype(jnp.bfloat16)
    q = jax.random.uniform(jax.random.PRNGKey(3), (m, k), jnp.float32)
    tile_m, tile_n = pick_tiles(k, m, n2, wide=True)
    builder = _build_fused_candidates(8, n2, k, 8, tile_n, soa=True,
                                      precision="packed")
    ops_f32 = jax.jit(builder.prep_soa)(ref)
    ops_bf16 = tuple(o.astype(jnp.bfloat16) for o in ops_f32)
    run = _build_prepared_query(m, n2, k, tile_m, tile_n, "packed")

    def full_step(i, ops, ref_aos, q=q, run=run):
        idx, d2 = run(q + i * 1e-9, ops, ref_aos)
        return _consume(idx, d2)

    _time("ds11 prepared 1-NN f32 ", full_step, ops_f32, ref)
    _time("ds11 prepared 1-NN bf16", full_step, ops_bf16, refb)

    n_ops = ops_f32[0].shape[1]
    tk = _build_topk(m, n2, k, 8, n_ops, "packed")

    def topk_step(i, ops, ref_aos, q=q, run=tk):
        idx, d2 = run(q + i * 1e-9, ops, ref_aos)
        return _consume(idx, d2)

    _time("ds11 topk K=8 f32 ", topk_step, ops_f32, ref)
    _time("ds11 topk K=8 bf16", topk_step, ops_bf16, refb)

    # ---- correctness spot check (bf16 == oracle over quantized pts) --
    n3 = 1 << 14
    ref3 = jax.random.uniform(key, (n3, k), jnp.float32)
    ref3b = ref3.astype(jnp.bfloat16)
    q3 = jax.random.uniform(jax.random.PRNGKey(4), (64, k), jnp.float32)
    r1 = _build_prepared_query(64, n3, k, 8, 512, "packed")
    b2 = _build_fused_candidates(8, n3, k, 8, 512, soa=True,
                                 precision="packed")
    ops3 = tuple(o.astype(jnp.bfloat16) for o in jax.jit(b2.prep_soa)(ref3))
    idx_b, d2_b = jax.device_get(r1(q3, ops3, ref3b))
    rq = np.asarray(jax.device_get(ref3b)).astype(np.float32)
    qh = np.asarray(jax.device_get(q3))
    d = ((qh[:, None, :] - rq[None]) ** 2).sum(-1)
    exp = d.argmin(1)
    ok = int((idx_b == exp).sum())
    print(f"bf16 vs quantized-oracle: {ok}/64 exact", flush=True)


if __name__ == "__main__":
    main()
