"""Embedding-scale dimensionality (k > 32) — the regime production
vector-search workloads live in (k = 128..1024).

The reference supports arbitrary k in v1-v8 (core.h:71 places no bound;
only the KD-tree versions guard k <= 16, core.cu:1035-1036) but records
k in {3, 16} only. Round 3 makes high-k a first-class served regime:

- small batches (m <= 4) route to the roofline AoS scan — the Pallas
  smallm kernel caps at k <= 32 and the fused pipeline's operand-budget
  tiles stream far below HBM bandwidth at k_pad >= 512 (measured m=1
  k=768 n=2^20: 37.4 ms fused vs ~5 ms scan, scripts/r14_probe_highk.py).
- the seeded batch top-K engines clamp their extraction tile by k_pad
  (topk._extract_tile_n): unclamped, k=768 at tile_n=8192 is a 24 MB
  double-buffered operand tile — a VMEM OOM on v5e (same probe).
"""

import numpy as np
import pytest

import tpu_knn
from tpu_knn.engine.index import NNIndex
from tpu_knn.kernels.topk import _extract_tile_n, topk_knn


def oracle(search, ref):
    d2 = ((search[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    return d2.argmin(1), d2.min(1)


def oracle_topk(q, r, kk):
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    return np.array(
        [np.lexsort((np.arange(len(row)), row))[:kk] for row in d2])


@pytest.mark.parametrize("k,m,n", [
    (33, 1, 3000),     # just past the smallm kernel's k cap
    (100, 4, 2048),    # aos-scan m range, non-multiple-of-8 k
    (768, 1, 4096),    # embedding scale, m=1
    (768, 2, 1000),    # ragged n
    (384, 32, 6000),   # batch -> fused MXU pipeline (bf16x3 ladder)
])
def test_highk_nearest_neighbors_conformance(k, m, n):
    rng = np.random.default_rng(hash((k, m, n)) % 2**31)
    q = rng.random((m, k), np.float32)
    r = rng.random((n, k), np.float32)
    # plant exact duplicates: lowest index must win
    r[n // 2] = r[7] = q[0]
    idx, d2 = tpu_knn.nearest_neighbors(q, r), None
    want, want_d = oracle(q, r)
    np.testing.assert_array_equal(np.asarray(idx), want)


@pytest.mark.parametrize("k,m,n,kk,method", [
    (768, 1, 4096, 16, "auto"),     # aos cell engine
    (768, 4, 2048, 8, "auto"),      # aos route extended past k=32
    (768, 40, 4096, 8, "seeded"),   # extraction kernel, clamped tiles
    (300, 48, 2048, 8, "seeded"),   # k_pad=304: non-power-of-two clamp
    (768, 40, 4096, 6, "passes"),   # banded fallback engine at high k
    (100, 2, 512, 512, "seeded"),   # multi-round at high k (K > 64)
])
def test_highk_topk_conformance(k, m, n, kk, method):
    rng = np.random.default_rng(hash((k, m, n, kk)) % 2**31)
    q = rng.random((m, k), np.float32)
    r = rng.random((n, k), np.float32)
    r[11] = r[n - 5] = q[0]          # planted duplicate tie
    idx, d2 = topk_knn(q, r, kk, method=method)
    want = oracle_topk(q, r, kk)
    np.testing.assert_array_equal(np.asarray(idx), want)
    d2n = np.asarray(d2)
    assert np.all(np.diff(d2n, axis=1) >= 0)


def test_extract_tile_n_clamps_by_operand_budget():
    """The (k_pad, tile_n) reference tile is double-buffered; wide k must
    shrink tile_n below the fused path's OPERAND_TILE_BUDGET or the
    extraction kernel OOMs scoped VMEM (observed at k=768, tile_n=8192:
    48 MB of stack vs the ~16 MB limit)."""
    from tpu_knn.kernels.tuning import OPERAND_TILE_BUDGET

    for k in (16, 33, 128, 300, 768, 2048, 4096):
        t = _extract_tile_n(1 << 20, 8192, k)
        k_pad = -(-k // 8) * 8
        assert t % 128 == 0
        # 128 is the floor tile even when the budget asks for less
        assert t == 128 or t * k_pad <= OPERAND_TILE_BUDGET
    # small k keeps the measured wide geometry
    assert _extract_tile_n(1 << 20, 8192, 16) == 8192
    assert _extract_tile_n(1 << 20, 4096, 16) == 4096
    # k=768 -> k_pad=768 -> 2^18 // 768 = 341 -> widest pow2*128 is 256
    assert _extract_tile_n(1 << 20, 8192, 768) == 256


def test_highk_nnindex_serving():
    """NNIndex at embedding scale: prepared m<=4 (AoS scan route), batch
    (fused pipeline), top-K, and mutability (+inf tombstones must
    self-exclude from the scan)."""
    k, n = 768, 2500
    rng = np.random.default_rng(42)
    r = rng.random((n, k), np.float32)
    q1 = rng.random((1, k), np.float32)
    q4 = rng.random((4, k), np.float32)
    qb = rng.random((32, k), np.float32)

    index = NNIndex(r, strategy="fused")
    for q in (q1, q4, qb):
        idx, d2 = index.query(q)
        want, want_d = oracle(q, r)
        np.testing.assert_array_equal(np.asarray(idx), want)
        np.testing.assert_allclose(np.asarray(d2), want_d,
                                   rtol=1e-5, atol=1e-5)
    ti, td = index.query(q1, neighbors=8)
    np.testing.assert_array_equal(np.asarray(ti), oracle_topk(q1, r, 8))

    mut = NNIndex(r, mutable=True)
    # remove the true winner: the scan must pick the runner-up
    want, _ = oracle(q1, r)
    mut.remove(np.asarray([int(want[0])]))
    idx2, _ = mut.query(q1)
    live = np.ones(n, bool)
    live[int(want[0])] = False
    d2 = ((q1[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    d2[:, ~live] = np.inf
    np.testing.assert_array_equal(np.asarray(idx2), d2.argmin(1))


def test_highk_sharded_mesh():
    """Multi-chip at embedding scale on the virtual 8-device mesh: the
    per-shard fused kernel and the sharded top-K inherit the k-clamped
    tile geometry."""
    from tpu_knn.distributed.sharded import (
        default_mesh, sharded_knn, sharded_topk_knn,
    )

    rng = np.random.default_rng(3)
    k = 300
    q = rng.random((5, k), np.float32)
    r = rng.random((4000, k), np.float32)
    idx, d2 = sharded_knn(q, r, mesh=default_mesh(dp=1, sp=8))
    want, _ = oracle(q, r)
    np.testing.assert_array_equal(np.asarray(idx), want)
    ti, td = sharded_topk_knn(q, r, 8, mesh=default_mesh(dp=1, sp=4))
    np.testing.assert_array_equal(np.asarray(ti), oracle_topk(q, r, 8))


def test_highk_int8_store():
    """int8 grid serving at embedding scale: m<=4 runs the AoS scan
    straight off the (n, k) int8 grid at any k."""
    k, n = 300, 1500
    rng = np.random.default_rng(7)
    r = rng.random((n, k), np.float32)
    q = rng.random((2, k), np.float32)
    index = NNIndex(r, store="int8")
    idx, d2 = index.query(q)
    # exact in grid space: recompute the oracle over the dequantized grid
    g = np.asarray(index.ref_dev, np.float32)
    z = np.asarray(index._i8_zero_dev, np.float32)
    s = 1.0 / float(np.asarray(index._i8_inv_s))
    rq = z + s * g
    want, _ = oracle(q, rq)
    np.testing.assert_array_equal(np.asarray(idx), want)
