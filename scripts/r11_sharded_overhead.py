"""What does the shard_map wrapper itself cost on one chip?

Measures, on the real TPU with a 1-device (dp=1, sp=1) mesh, the
prepared sharded pipeline vs the prepared fused pipeline at the ds11
shape, and the int8 sharded scan vs the fused int8 scan at the ds9
shape — amplified in-dispatch protocol, full-checksum carries.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tpu_knn.distributed.sharded import _build_sharded, default_mesh
from tpu_knn.engine.index import NNIndex
from tpu_knn.harness.timing import calibrated_amplified_ms

assert jax.default_backend() == "tpu"
mesh = default_mesh(dp=1, sp=1)

rng = np.random.default_rng(0)
k, m, n = 16, 1024, 1 << 20
q = jnp.asarray(rng.random((m, k), np.float32))
r = rng.random((n, k), np.float32)


def consume(c, *outs):
    for o in outs:
        c = c + jnp.sum(o.astype(jnp.float32)) * 1e-9
    return c


ixf = NNIndex(r, strategy="fused")
run_f, ops = ixf.pipeline(m)


def f_step(i, c, q, ops):
    ia, da = run_f(q + i.astype(jnp.float32) * 1e-9, *ops)
    return consume(c, da, ia)


f_ms, f_it = calibrated_amplified_ms(f_step, q, ops)
print(f"fused prepared ds11: {f_ms:.3f} ms x{f_it}", flush=True)

ixs = NNIndex(r, strategy="sharded", mesh=mesh)
run_s = _build_sharded(m, n, k, ixs.mesh, tile_n=ixs.tile_n,
                       prepadded=True)


def s_step(i, c, q, rs):
    ia, da = run_s(q + i.astype(jnp.float32) * 1e-9, rs)
    return consume(c, da, ia)


s_ms, s_it = calibrated_amplified_ms(s_step, q, ixs.r_sharded)
print(f"sharded (sp=1) prepared ds11: {s_ms:.3f} ms x{s_it} "
      f"(wrapper overhead {s_ms - f_ms:+.3f} ms)", flush=True)
# gate
ia, _ = run_s(q, ixs.r_sharded)
fa, _ = run_f(q, *ops)
assert np.array_equal(np.asarray(ia), np.asarray(fa))
print("gate ok (sharded == fused winners)")
