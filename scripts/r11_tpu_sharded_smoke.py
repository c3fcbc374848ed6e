"""Real-TPU smoke of every sharded pipeline on a 1-device mesh.

All mesh tests run Pallas in interpreter mode on the virtual CPU mesh;
this script compiles and runs the SAME shard_map pipelines on the real
chip (sp=1: the collectives are no-ops, but the Mosaic compile of the
fused/topk kernels inside shard_map, the int8 grid paths, and the
index rebasing all execute for real). Gates: the single-chip fused
answer and the grid-space v2 differential.

Run: python scripts/r11_tpu_sharded_smoke.py   (needs the TPU)
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tpu_knn.distributed.sharded import (
    _build_sharded, default_mesh, sharded_topk_knn,
)
from tpu_knn.engine.index import NNIndex
from tpu_knn.kernels.fused import fused_knn

assert jax.default_backend() == "tpu", "this smoke needs the real chip"
mesh = default_mesh(dp=1, sp=1)

rng = np.random.default_rng(0)
k, m, n = 16, 64, 1 << 18
q = rng.random((m, k), np.float32)
r = rng.random((n, k), np.float32)

# f32 sharded 1-NN (Mosaic-compiled fused kernel inside shard_map).
run = _build_sharded(m, n, k, mesh)
idx, d2 = run(jnp.asarray(q), jnp.asarray(r))
want, _ = fused_knn(q, r)
assert np.array_equal(np.asarray(idx), np.asarray(want)), "f32 sharded"
print("tpu sharded smoke ok: f32 1-NN (mosaic fused kernel in shard_map)")

# sharded top-K (per-shard sweep engine + merge).
ti, td = sharded_topk_knn(q, r, 8, mesh=mesh)
from tpu_knn.kernels.topk import topk_knn

wi, wd = topk_knn(q, r, 8)
assert np.array_equal(np.asarray(ti), np.asarray(wi)), "sharded topk"
print("tpu sharded smoke ok: top-8 (sweep engine in shard_map)")

# sharded int8: scan regime (m<=4) and batch regime, vs the fused int8
# index on the same data (identical embed).
ixs = NNIndex(r, store="int8", strategy="sharded", mesh=mesh)
ixf = NNIndex(r, store="int8")
for mm in (2, 64):
    qs = q[:mm]
    gi, gd = ixs.query(qs)
    fi, fd = ixf.query(qs)
    assert np.array_equal(np.asarray(gi), np.asarray(fi)), f"int8 m={mm}"
    np.testing.assert_allclose(np.asarray(gd), np.asarray(fd), rtol=1e-6)
    print(f"tpu sharded smoke ok: int8 1-NN m={mm} "
          f"({'masked AoS scan' if mm <= 4 else 'upcast batch'} regime)")
ti8, _ = ixs.query(q[:2], neighbors=8)
tf8, _ = ixf.query(q[:2], neighbors=8)
assert np.array_equal(np.asarray(ti8), np.asarray(tf8)), "int8 topk"
print("tpu sharded smoke ok: int8 top-8 (masked AoS cell engine)")

# bf16 sharded (quantized shard-resident operands).
ixb = NNIndex(r, store="bf16", strategy="sharded", mesh=mesh)
bi, _ = ixb.query(q)
r_q = jnp.asarray(r).astype(jnp.bfloat16).astype(jnp.float32)
wbi, _ = fused_knn(q, np.asarray(r_q))
assert np.array_equal(np.asarray(bi), np.asarray(wbi)), "bf16 sharded"
print("tpu sharded smoke ok: bf16 sharded 1-NN (quantized operands)")
print("ALL TPU SHARDED SMOKES PASS")
