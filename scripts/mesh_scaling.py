#!/usr/bin/env python3
"""Multi-chip scaling evidence on the virtual 8-device CPU mesh.

The reference's scaling table (README.md:281-291: v8 = 2.81x over v7 on 4
GPUs at ds11) is wall-time on real hardware; a virtual CPU mesh cannot
reproduce wall-time honestly, so this artifact records what CAN be
validated without hardware (VERDICT round 1, item 8):

- the per-shard work split (padded shard sizes, per-shard score FLOPs,
  balance ratio) for every big shape on dp x sp and dcn x dp x sp meshes,
- the collective traffic of the min-index allreduce per device: the pmin
  path moves 2 rounds x m_local x 4 B (f32 distances, then i32 indices);
  the ring path moves (P-1) steps x m_local x 8 B,
- a correctness check of every configuration against the v0 oracle.

Output: docs/MESH_SCALING.json (committed). The ICI cost projection that
pairs with this artifact lives in docs/PERF_NOTES.md ("Multi-chip
projection").

Run: python scripts/mesh_scaling.py   (self-provisions the CPU mesh)
"""

import json
import os
import sys

if __name__ == "__main__" and os.environ.get("MESH_SCALING_CHILD") != "1":
    # Self-provision the 8-device CPU mesh in a child process (the same
    # trap/fix as __graft_entry__.dryrun_multichip; one shared definition
    # of the workaround lives in tpu_knn.utils.platform).
    import subprocess

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tpu_knn.utils.platform import virtual_cpu_mesh_env

    env = virtual_cpu_mesh_env(8)
    env["MESH_SCALING_CHILD"] = "1"
    raise SystemExit(subprocess.run([sys.executable, __file__], env=env).returncode)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_knn.distributed.sharded import (
    default_mesh, multislice_mesh, sharded_knn, sharded_layout,
)
from tpu_knn.harness.generator import BIG_SHAPES
from tpu_knn.utils.shapes import cdiv, round_up


def analyze(k, m, n, mesh, label, method, check_m=64):
    num_shards = mesh.shape["sp"] * mesh.shape.get("dcn", 1)
    dp = mesh.shape["dp"]
    tile_n, n_local, n_pad = sharded_layout(n, k, mesh, m_hint=m)
    m_pad = round_up(m, dp * 8)
    m_local = m_pad // dp
    # Per-shard score work (matmul form): 2 * m_local * n_local * k_pad.
    k_pad = round_up(k, 8)
    shard_flops = 2 * m_local * n_local * k_pad
    total_flops = 2 * m * n * k_pad
    # Collective bytes PER DEVICE for the min-index allreduce over the
    # reference axes (m_local f32 distances + m_local i32 indices).
    P = num_shards
    pmin_bytes = 2 * (m_local * 4)          # two pmin rounds
    ring_bytes = (P - 1) * m_local * 8      # (P-1) ppermute steps, 8 B/query
    row = {
        "mesh": label,
        "method": method,
        "k": k, "m": m, "n": n,
        "num_shards": P, "dp": dp,
        "tile_n": tile_n,
        "n_local": n_local,
        "n_pad": n_pad,
        "m_local": m_local,
        "shard_score_flops": shard_flops,
        "work_balance": round(shard_flops * P * dp / total_flops, 4),
        "collective_bytes_per_device": {
            "pmin_2round": pmin_bytes,
            "ring": ring_bytes,
        },
    }
    # Correctness on a reduced m (the oracle gate; full shapes are gated by
    # tests and bench.py on hardware). Use a smaller n for the CPU oracle
    # at the 2^24 shapes so this stays fast while the MESH geometry above
    # reflects the true shape.
    mc = min(m, check_m)
    nc = min(n, 1 << 18)
    rng = np.random.default_rng(k * 1000 + P)
    q = rng.random((mc, k), np.float32)
    r = rng.random((nc, k), np.float32)
    idx, _ = sharded_knn(q, r, mesh=mesh, method=method)
    from tpu_knn.oracle import oracle_knn

    want = oracle_knn(q, r)
    row["check"] = ("ok" if np.array_equal(np.asarray(idx), want)
                    else "MISMATCH")
    row["check_shape"] = [k, mc, nc]
    return row


def main():
    assert len(jax.devices()) == 8, jax.devices()
    rows = []
    meshes = [
        ("dp1 x sp8", default_mesh(dp=1, sp=8)),
        ("dp2 x sp4", default_mesh(dp=2, sp=4)),
        ("dcn2 x dp1 x sp4", multislice_mesh(dcn=2, dp=1, sp=4)),
    ]
    for (k, m, n) in BIG_SHAPES:
        for label, mesh in meshes:
            for method in ("pmin", "ring"):
                rows.append(analyze(k, m, n, mesh, label, method))
                print(f"{rows[-1]['mesh']:18s} {method:5s} k={k:2d} m={m:5d} "
                      f"n=2^{n.bit_length()-1:2d}: n_local={rows[-1]['n_local']:8d} "
                      f"balance={rows[-1]['work_balance']:.3f} "
                      f"pmin={rows[-1]['collective_bytes_per_device']['pmin_2round']}B "
                      f"ring={rows[-1]['collective_bytes_per_device']['ring']}B "
                      f"check={rows[-1]['check']}", flush=True)
    # The capacity side of the multi-chip story: MEASURED per-chip
    # point ceilings by storage tier (largest power-of-two index that
    # built and served on the real 16 GB v5e at k=16 — scripts/
    # r8_probe_capacity.py, r10_probe_int8_capacity.py; query-time
    # temps keep the ceiling below the raw byte arithmetic), times the
    # shard count via strategy="sharded" (per-shard state is the
    # shard's rows only; wrapper measured free,
    # scripts/r11_sharded_overhead.py).
    capacity = []
    for k_cap, store, bpp, measured_pow2, extra in (
            (16, "float32", 4 * 16 * 2, 26, "AoS + SoA f32 operands"),
            (16, "bf16", 2 * 16 * 2, 27, "AoS + SoA bf16 operands"),
            (16, "int8", 16, 28, "the int8 grid ONLY"),
            # k=768 (embedding scale, VERDICT r4 item 1) — measured on
            # the real 16 GB v5e, scripts/r22_capacity_k768.py: builds
            # AND serves m=1 + m=128 batch. int8's m=1 ceiling is 2^23
            # (grid-only AoS scan); the BATCH tier materializes a
            # per-call bf16 grid operand, capping batch serving at 2^22
            # — recorded as the conservative all-routes number.
            (768, "float32", 4 * 768 * 2, 21, "AoS + SoA f32 operands"),
            (768, "bf16", 2 * 768 * 2, 22, "AoS + SoA bf16 operands"),
            (768, "int8", 768, 22,
             "the int8 grid ONLY (m=1 serves to 2^23; batch m=128 "
             "caps at 2^22 via the per-call bf16 operand)")):
        capacity.append({
            "store": store, "k": k_cap,
            "resident_bytes_per_point": bpp,
            "state": extra,
            "measured_points_per_chip_pow2": measured_pow2,
            "points_v5e8_slice_pow2": measured_pow2 + 3,
        })
    out = {
        "note": "virtual 8-device CPU mesh: work split + collective bytes "
                "are exact; wall time is meaningless here by design "
                "(see docs/PERF_NOTES.md 'Multi-chip projection')",
        "rows": rows,
        "capacity_note": "measured per-16GB-chip point ceilings by "
                         "storage tier at k=16 and k=768 (largest power-of-two "
                         "index that built AND served on the real "
                         "chip), times 8 shards for a v5e-8 slice via "
                         "strategy='sharded'",
        "capacity": capacity,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "MESH_SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")
    assert all(r["check"] == "ok" for r in rows)


if __name__ == "__main__":
    main()
