"""Quantized stores at embedding-scale k (VERDICT r4 item 1).

The qsplit2 score tier: NNIndex(store="bf16"/"int8") operands are
EXACTLY representable in bf16 (bf16 points / grid integers <= 127), so
the bf16x3 ladder's r-side split terms vanish — two MXU passes
(q_hi·r + q_lo·r) carry the same 2^-17 q-truncation error at 2/3 the
MXU time and half the operand reads (fused._qr_dot "qsplit2").

Gates at wide k: selection differences on 1-2-ulp near-ties are
accumulation-ORDER artifacts (XLA picks the f32 sum association over
k=768; any fixed-order host oracle disagrees in the last ulp), so batch
routes are checked with the harness' tie-tolerant rule
(harness/checker.py: index equal OR true sqrt distances within 1e-3 —
the reference's own acceptance rule, main.cu:79-99). Planted EXACT
duplicates — bit-identical coordinates, immune to ordering — pin the
lowest-index tie rule strictly.
"""

import ml_dtypes
import numpy as np
import pytest

from tpu_knn.engine.index import NNIndex
from tpu_knn.harness.checker import check_results


def _quantized(ref):
    return ref.astype(ml_dtypes.bfloat16).astype(np.float32)


def _oracle_1nn(q, r):
    d = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1, dtype=np.float32)
    return np.argmin(d, axis=1).astype(np.int32)


@pytest.mark.parametrize("k", [128, 768])
def test_bf16_store_embedding_scale(k):
    """bf16 store at embedding k: auto-selects qsplit2 and stays within
    the tie-tolerant gate vs the quantized-point oracle (1-NN + top-16
    through the prepared batch pipeline)."""
    rng = np.random.default_rng(60 + k)
    n, m = 4000, 32
    r = rng.random((n, k), np.float32)
    q = rng.random((m, k), np.float32)
    ix = NNIndex(r, store="bf16")
    assert ix.precision == "qsplit2"
    rq = _quantized(r)
    i1, d1 = ix.query(q)
    errs, tot = check_results(_oracle_1nn(q, rq), np.asarray(i1), q, rq)
    assert errs == 0, f"{errs}/{tot} outside the 1e-3 gate"
    # top-16: every reported point's true distance must be within the
    # gate of the oracle's k-th ladder (per-slot tie-tolerant check)
    ti, td = ix.query(q, neighbors=16)
    d = ((q[:, None, :] - rq[None, :, :]) ** 2).sum(-1, dtype=np.float32)
    want_d = np.sort(d, axis=1)[:, :16]
    got_d = np.take_along_axis(d, np.asarray(ti), axis=1)
    np.testing.assert_allclose(np.sqrt(got_d), np.sqrt(want_d), atol=1e-3)
    # rows are ascending and indices distinct
    assert np.all(np.diff(np.asarray(td), axis=1) >= 0)
    assert all(len(set(row)) == 16 for row in np.asarray(ti))


@pytest.mark.parametrize("k", [128, 768])
def test_int8_store_embedding_scale(k):
    """int8 grid at embedding k: the per-call bf16 grid operand is
    grid-exact, qsplit2 selected, results match the grid-space oracle
    under the tie-tolerant rule."""
    rng = np.random.default_rng(70 + k)
    n, m = 4000, 32
    r = rng.random((n, k), np.float32)
    q = rng.random((m, k), np.float32)
    ix = NNIndex(r, store="int8")
    assert ix.precision == "qsplit2"
    g = np.asarray(ix.ref_dev).astype(np.float32)
    qg = (q - ix._i8_zero) * np.float32(ix._i8_inv_s)
    i1, _ = ix.query(q)
    errs, tot = check_results(_oracle_1nn(qg, g), np.asarray(i1), qg, g)
    assert errs == 0, f"{errs}/{tot} outside the gate (grid space)"
    ti, _ = ix.query(q, neighbors=16)
    d = ((qg[:, None, :] - g[None, :, :]) ** 2).sum(-1, dtype=np.float32)
    want_d = np.sort(d, axis=1)[:, :16]
    got_d = np.take_along_axis(d, np.asarray(ti), axis=1)
    np.testing.assert_allclose(np.sqrt(got_d * ix._i8_s2),
                               np.sqrt(want_d * ix._i8_s2), atol=1e-3)


def test_qsplit2_exact_duplicate_ties_wide_k():
    """Bit-identical duplicate points at k=256: ordering artifacts
    cannot explain away a tie-rule violation — the lowest index must
    win, strictly, through the qsplit2 selection + exact rerank."""
    rng = np.random.default_rng(80)
    k, n = 256, 3000
    r = rng.random((n, k), np.float32)
    q = rng.random((8, k), np.float32)
    r[2500] = r[700] = q[3]          # exact duplicate pair, d=0 hit
    ix = NNIndex(r, store="bf16")
    i1, d1 = ix.query(q)
    assert int(np.asarray(i1)[3]) == 700
    # d2 is the bf16 quantization residual of q[3], not 0 (the stored
    # duplicates are bf16 copies): bounded by k * (2^-9)^2
    assert 0.0 <= float(np.asarray(d1)[3]) <= k * (2.0 ** -9) ** 2
    ti, _ = ix.query(q, neighbors=4)
    assert list(np.asarray(ti)[3][:2]) == [700, 2500]


def test_qsplit2_rejected_for_f32_operands():
    """The tier is store-internal: per-call f32 references would lose
    2^-8 of r in the downcast, so the public entry rejects it."""
    from tpu_knn.kernels.fused import fused_knn

    r = np.random.rand(64, 16).astype(np.float32)
    q = np.random.rand(4, 16).astype(np.float32)
    with pytest.raises(ValueError, match="qsplit2"):
        fused_knn(q, r, precision="qsplit2")
    with pytest.raises(ValueError, match="qsplit2"):
        NNIndex(r, precision="qsplit2")


def test_qsplit2_narrow_k_keeps_packed():
    """k <= 32 still routes to the packed single-pass tier (strictly
    better error at comparable cost); qsplit2 only replaces the
    multi-pass bf16x3 band."""
    rng = np.random.default_rng(81)
    r = rng.random((5000, 16), np.float32)
    ix = NNIndex(r, store="bf16")
    assert ix.precision == "packed"


def test_bf16_store_sharded_embedding_scale():
    """bf16 store + sharded at k=128: qsplit2 rides the shard pipelines
    (1-NN + top-K through the two prepared sharded operands)."""
    from tpu_knn.distributed.sharded import default_mesh

    rng = np.random.default_rng(82)
    k, n, m = 128, 2100, 16          # ragged across 8 shards
    r = rng.random((n, k), np.float32)
    q = rng.random((m, k), np.float32)
    ix = NNIndex(r, strategy="sharded", mesh=default_mesh(dp=2, sp=4),
                 store="bf16")
    assert ix.precision == "qsplit2"
    rq = _quantized(r)
    i1, _ = ix.query(q)
    errs, tot = check_results(_oracle_1nn(q, rq), np.asarray(i1), q, rq)
    assert errs == 0
    ti, _ = ix.query(q, neighbors=8)
    d = ((q[:, None, :] - rq[None, :, :]) ** 2).sum(-1, dtype=np.float32)
    got_d = np.take_along_axis(d, np.asarray(ti), axis=1)
    np.testing.assert_allclose(np.sqrt(got_d),
                               np.sqrt(np.sort(d, 1)[:, :8]), atol=1e-3)
