"""Model-based soak test for the mutable serving index: a random
interleaving of add / remove / query / top-K / compact / save-load is
checked against a shadow NumPy model after EVERY step. This is the
strongest correctness artifact for the capacity-semantics design (PAD
sentinel slots, stable ids, amortized growth) — any stale-slot leak,
id drift, or operand/AoS divergence surfaces immediately."""

import numpy as np
import pytest

from tpu_knn.engine.index import NNIndex


class ShadowModel:
    """id -> point for live points, mirroring NNIndex's stable-id rule."""

    def __init__(self, ref):
        self.pts = {i: ref[i].copy() for i in range(len(ref))}
        self.next_id = len(ref)

    def add(self, points):
        ids = []
        for p in points:
            self.pts[self.next_id] = p.copy()
            ids.append(self.next_id)
            self.next_id += 1
        return np.array(ids, np.int32)

    def remove(self, ids):
        for i in np.atleast_1d(ids):
            del self.pts[int(i)]

    def query(self, q, kk=1):
        ids = np.array(sorted(self.pts), np.int64)
        r = np.stack([self.pts[i] for i in ids])
        d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
        order = np.array([np.lexsort((ids, row))[:kk] for row in d2])
        return ids[order]  # (m, kk) global ids, lex (d2, id) ascending

    def compact(self, mapping):
        old = self.pts
        self.pts = {}
        for oid, pt in old.items():
            nid = int(mapping[oid])
            assert nid >= 0, f"live id {oid} mapped to -1"
            self.pts[nid] = pt
        self.next_id = len(self.pts)


def test_mutation_soak(tmp_path):
    rng = np.random.default_rng(77)
    k = 5
    ref = rng.random((400, k), np.float32)
    ix = NNIndex(ref, mutable=True)
    model = ShadowModel(ref)

    for step in range(40):
        op = rng.choice(["add", "remove", "query", "topk", "compact",
                         "saveload"],
                        p=[0.25, 0.25, 0.2, 0.15, 0.075, 0.075])
        if op == "add":
            pts = rng.random((int(rng.integers(1, 30)), k), np.float32)
            got = ix.add(pts)
            want = model.add(pts)
            np.testing.assert_array_equal(got, want, err_msg=f"step {step}")
        elif op == "remove" and len(model.pts) > 20:
            live = np.array(sorted(model.pts))
            ids = rng.choice(live, size=int(rng.integers(1, 10)),
                             replace=False)
            ix.remove(ids)
            model.remove(ids)
        elif op == "compact":
            mapping = ix.compact()
            model.compact(mapping)
        elif op == "saveload":
            p = str(tmp_path / f"soak{step}.npz")
            ix.save(p)
            ix = NNIndex.load(p)
        elif op in ("query", "topk"):
            m = int(rng.integers(1, 12))
            # Half in-distribution probes, half near-copies of live points
            # (tie pressure on the id rule).
            q = rng.random((m, k), np.float32)
            if rng.random() < 0.5 and model.pts:
                some = rng.choice(sorted(model.pts), size=min(m, 3),
                                  replace=False)
                for j, sid in enumerate(some):
                    q[j] = model.pts[int(sid)]
            kk = 1 if op == "query" else int(
                rng.integers(2, min(9, len(model.pts) + 1)))
            if op == "query":
                gi, _ = ix.query(q)
                gi = np.asarray(gi).reshape(m, 1)
            else:
                gi, _ = ix.query(q, neighbors=kk)
                gi = np.asarray(gi)
            want = model.query(q, kk)
            np.testing.assert_array_equal(gi, want, err_msg=f"step {step}")
        assert ix.n_live == len(model.pts), f"step {step}: live count drift"
