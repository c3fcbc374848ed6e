"""Randomized differential fuzzing: every registered version against the
serial oracle on adversarial inputs (SURVEY.md §4 — the reference's only
gate is 8 fixed shapes; this sweeps the shape/data space it never visits).

Data recipes deliberately provoke the failure modes the engines guard
against: quantized coordinates (dense exact-tie groups stress every
reducer's lowest-index rule), planted duplicates, near-duplicate pairs
(catastrophic-cancellation regime for the norm-trick score), degenerate
shapes (n=1, m=1, k=1), and k above the packed-dot boundary."""

import numpy as np
import pytest

from tpu_knn.api import knn_callback
from tpu_knn.engine.registry import list_versions
from tpu_knn.oracle import oracle_knn

CASES = [
    # (seed, k, m, n, recipe)
    (0, 1, 1, 1, "uniform"),
    (1, 1, 7, 33, "quantized"),
    (2, 2, 3, 1000, "duplicates"),
    (3, 3, 17, 999, "quantized"),
    (4, 3, 32, 2048, "near-dup"),
    (5, 5, 1, 4096, "uniform"),
    (6, 8, 24, 1500, "duplicates"),
    (7, 13, 5, 700, "quantized"),
    (8, 16, 9, 2000, "near-dup"),
    (9, 31, 4, 512, "uniform"),
    (10, 33, 3, 400, "quantized"),   # past the packed-dot k boundary
    (11, 40, 2, 300, "duplicates"),
    (12, 300, 6, 900, "quantized"),   # wide-k: multi-pass score ladder
]


def make_data(seed, k, m, n, recipe):
    rng = np.random.default_rng(seed)
    q = rng.random((m, k), np.float32)
    r = rng.random((n, k), np.float32)
    if recipe == "quantized":
        # One decimal: huge exact-tie groups in every distance reducer.
        q = np.round(q, 1).astype(np.float32)
        r = np.round(r, 1).astype(np.float32)
    elif recipe == "duplicates":
        for _ in range(min(n // 4, 50)):
            a, b = rng.integers(0, n, 2)
            r[a] = r[b]
        for i in range(min(m, n, 4)):
            r[rng.integers(0, n)] = q[i]
    elif recipe == "near-dup":
        # Offsets ~1e-6: exact diff-form separates them, the norm-trick
        # score alone cannot — exercises the refinement stage.
        base = rng.random((1, k), np.float32)
        r[: n // 2] = base + rng.normal(0, 1e-6, (n // 2, k)).astype(np.float32)
        q[: max(m // 2, 1)] = base
    return q, r


@pytest.mark.parametrize("seed,k,m,n,recipe", CASES)
def test_fuzz_all_versions(seed, k, m, n, recipe):
    from tpu_knn.harness.checker import check_results

    q, r = make_data(seed, k, m, n, recipe)
    want = oracle_knn(q, r)
    d2 = ((q[:, None, :].astype(np.float64)
           - r[None, :, :].astype(np.float64)) ** 2).sum(-1)
    for v in list_versions():
        got = knn_callback(k, m, n, q, r, version=v)
        if np.array_equal(got, want):
            continue
        # The harness rule (main.cu:88-95): a differing index is accepted
        # only when the true distances tie within +-1e-3. On top of that,
        # assert the engines sit ORDERS OF MAGNITUDE inside the gate: any
        # index swap must be a genuine near-tie (f64 squared-distance gap
        # <= 1e-6 — quantized one-decimal data produces f32-rounding
        # near-ties at the 1e-8 scale that different-but-exact arithmetic
        # forms may legitimately order differently; anything larger is a
        # real selection bug the +-1e-3 gate could mask).
        errors, total = check_results(want, got, q, r)
        assert errors == 0, f"{v} on {recipe} (k={k},m={m},n={n})"
        bad = np.nonzero(got != want)[0]
        gaps = np.abs(d2[bad, got[bad]] - d2[bad, want[bad]])
        assert gaps.max() <= 1e-6, (
            f"{v} on {recipe} (k={k},m={m},n={n}): swap with gap "
            f"{gaps.max():.3e} at rows {bad[gaps > 1e-6][:4].tolist()}")


def test_fuzz_topk_random():
    from tpu_knn.kernels.topk import topk_knn

    rng = np.random.default_rng(99)
    for _ in range(6):
        k = int(rng.integers(1, 12))
        m = int(rng.integers(1, 20))
        n = int(rng.integers(32, 3000))
        kk = int(rng.integers(1, min(n, 33)))
        recipe = ["uniform", "quantized", "duplicates"][int(rng.integers(3))]
        q, r = make_data(int(rng.integers(1 << 30)), k, m, n, recipe)
        idx, d2 = topk_knn(q, r, kk)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        tag = f"(k={k},m={m},n={n},K={kk},{recipe})"
        D = ((q[:, None, :].astype(np.float64)
              - r[None, :, :].astype(np.float64)) ** 2).sum(-1)
        want_d = np.sort(D, axis=1)[:, :kk]
        # Rank-wise distances must match the f64 oracle within fp noise
        # (quantized data creates 1e-9 near-ties whose ORDER f32 cannot
        # resolve — the same tolerance class as the 1-NN gate)…
        got_d = np.take_along_axis(D, idx, axis=1)
        np.testing.assert_allclose(got_d, want_d, atol=1e-6, rtol=0,
                                   err_msg=tag)
        # …rows must be valid, duplicate-free, and sorted by (d2, idx)…
        for row_i, row_d in zip(idx, d2):
            assert len(set(row_i.tolist())) == kk, tag
            pairs = list(zip(row_d.tolist(), row_i.tolist()))
            assert pairs == sorted(pairs), tag
        # …and wherever a rank is UNAMBIGUOUS (no other reference point
        # within 1e-6 of its distance), the exact index is required.
        for qi in range(m):
            for pos in range(kk):
                close = np.abs(D[qi] - want_d[qi, pos]) <= 1e-6
                if close.sum() == 1:
                    assert idx[qi, pos] == int(np.nonzero(close)[0][0]), (
                        f"{tag} q{qi} rank{pos}")


def _check_topk_properties(q, r, idx, d2, kk, tag):
    idx, d2 = np.asarray(idx), np.asarray(d2)
    D = ((q[:, None, :].astype(np.float64)
          - r[None, :, :].astype(np.float64)) ** 2).sum(-1)
    want_d = np.sort(D, axis=1)[:, :kk]
    got_d = np.take_along_axis(D, idx, axis=1)
    np.testing.assert_allclose(got_d, want_d, atol=1e-6, rtol=0,
                               err_msg=tag)
    for row_i, row_d in zip(idx, d2):
        assert len(set(row_i.tolist())) == kk, tag
        pairs = list(zip(row_d.tolist(), row_i.tolist()))
        assert pairs == sorted(pairs), tag


def test_fuzz_metric_indexes():
    """Randomized sweep of the metric reductions (cosine/ip): selection
    must equal the f64 brute force over the index's own STORED points at
    every unambiguous rank; score vectors ordered; adversarial recipes
    include exact scaled duplicates (bit-identical normalizations)."""
    from tpu_knn.engine.index import NNIndex

    rng = np.random.default_rng(314)
    for trial in range(5):
        k = int(rng.integers(2, 17))
        m = int(rng.integers(1, 40))
        n = int(rng.integers(64, 4000))
        kk = int(rng.integers(1, 9))
        metric = ("cosine", "ip")[trial % 2]
        recipe = ["uniform", "quantized", "duplicates"][int(rng.integers(3))]
        q, r = make_data(int(rng.integers(1 << 30)), k, m, n, recipe)
        q += 0.05
        r += 0.05   # keep vectors nonzero for cosine
        if metric == "cosine":   # exact scaled duplicates
            for _ in range(4):
                a, b = rng.integers(0, n, 2)
                r[a] = r[b] * 4.0
        ix = NNIndex(r, metric=metric)
        stored = np.asarray(ix.ref_dev).astype(np.float64)
        q_t = (np.asarray(ix._transform_q(q)) if metric == "cosine"
               else np.pad(q, ((0, 0), (0, 1)))).astype(np.float64)
        D = ((q_t[:, None, :] - stored[None, :, :]) ** 2).sum(-1)
        idx, score = ix.query(q, neighbors=kk)
        idx, score = np.asarray(idx), np.asarray(score)
        tag = f"({metric},k={k},m={m},n={n},K={kk},{recipe})"
        want_d = np.sort(D, axis=1)[:, :kk]
        got_d = np.take_along_axis(D, idx, axis=1)
        np.testing.assert_allclose(got_d, want_d, atol=1e-6, rtol=0,
                                   err_msg=tag)
        assert (np.diff(score, axis=1) <= 1e-5).all(), tag  # descending
        for qi in range(m):
            close = np.abs(D[qi] - want_d[qi, 0]) <= 1e-9
            if close.sum() == 1:
                assert idx[qi, 0] == int(np.nonzero(close)[0][0]), tag


def test_fuzz_topk_batch_engines():
    """Batch-regime fuzz (the round-3 moment-extraction engine plus its
    certified fallback): adversarial recipes at m large enough that
    auto-routing picks 'seeded', each also forced explicitly, with the
    same distance/validity/sort properties as the small-m fuzz. The
    duplicates recipe plants same-cell clusters that must drive the
    cnt>=3 fallback path."""
    from tpu_knn.kernels.topk import topk_knn

    rng = np.random.default_rng(123)
    for _ in range(4):
        k = int(rng.integers(2, 17))
        m = int(rng.integers(80, 600))
        n = int(rng.integers(1500, 6000))
        kk = int(rng.integers(2, 17))
        recipe = ["uniform", "quantized", "duplicates",
                  "near-dup"][int(rng.integers(4))]
        q, r = make_data(int(rng.integers(1 << 30)), k, m, n, recipe)
        tag = f"(k={k},m={m},n={n},K={kk},{recipe})"
        for method in ("auto", "seeded"):
            idx, d2 = topk_knn(q, r, kk, method=method)
            _check_topk_properties(q, r, idx, d2, kk, f"{tag} {method}")
    # dense same-cell duplicate cluster: certified fallback must engage
    # and stay exact (>= 3 duplicates inside one 128-lane cell).
    q, r = make_data(7, 4, 96, 2000, "uniform")
    for c in (10, 30, 50, 70, 90):
        r[c] = q[5]
    idx, d2 = topk_knn(q, r, 6, method="seeded")
    idx = np.asarray(idx)
    np.testing.assert_array_equal(idx[5, :5], [10, 30, 50, 70, 90])
    _check_topk_properties(q, r, idx, d2, 6, "dup-cluster")


def test_fuzz_sharded_int8():
    """Randomized sweep of the sharded int8 capacity tier: the contract
    is GRID-EXACT, so the gate is strict index equality against the v0
    oracle run in grid space over the upcast grid — across adversarial
    recipes, mesh splits, batch regimes, and ragged shard widths."""
    from tpu_knn.distributed.sharded import default_mesh
    from tpu_knn.engine.index import NNIndex

    rng = np.random.default_rng(2718)
    for trial in range(5):
        k = int(rng.integers(1, 17))
        m = int(rng.integers(1, 40))
        n = int(rng.integers(64, 5000))
        kk = int(rng.integers(1, 9))
        dp, sp = [(1, 8), (2, 4), (1, 4)][trial % 3]
        recipe = ["uniform", "quantized", "duplicates",
                  "near-dup"][int(rng.integers(4))]
        q, r = make_data(int(rng.integers(1 << 30)), k, m, n, recipe)
        ix = NNIndex(r, store="int8", strategy="sharded",
                     mesh=default_mesh(dp=dp, sp=sp))
        g = np.asarray(ix.r_sharded)[:n].astype(np.float32)
        qg = ((q - ix._i8_zero) * np.float32(ix._i8_inv_s))
        tag = f"(k={k},m={m},n={n},K={kk},dp{dp}sp{sp},{recipe})"
        got = np.asarray(ix.query(q)[0])
        np.testing.assert_array_equal(got, oracle_knn(qg, g), err_msg=tag)
        D = ((qg[:, None, :].astype(np.float64)
              - g[None, :, :].astype(np.float64)) ** 2).sum(-1)
        want_t = np.array([np.lexsort((np.arange(n), row))[:kk]
                           for row in D])
        np.testing.assert_array_equal(
            np.asarray(ix.query(q, neighbors=kk)[0]), want_t, err_msg=tag)
