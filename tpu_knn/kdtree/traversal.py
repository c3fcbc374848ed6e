"""v10 — batched KD-tree traversal on TPU.

The reference v10 (core.cu:1051-1191) runs real device-side recursion, one
CUDA thread per query. TPUs have neither recursion nor per-query threads;
the TPU-native shape is a vmapped iterative traversal:

- the implicit-heap arrays (p, dim, split_val) and the reference points
  live as device arrays,
- each query runs a `lax.while_loop` over an explicit fixed-depth stack of
  (node, plane-distance²) entries; the far child is pushed with its
  splitting-plane distance and pruned at pop time against the current best
  (the reference's backtrack prune, core.cu:1020-1023, made exact: the far
  side is visited when delta² <= best, so equal-distance points across the
  plane are never lost),
- `jax.vmap` batches queries; the batched while_loop runs until every
  query's stack empties (per-query masking is XLA's job).

Tie-breaking is explicit: update on (d² < best) OR (d² == best AND index <
best_index) — deterministic lowest-index winners regardless of traversal
order, matching v0 (core.cu:50-54).

The median-split tree is balanced, so depth <= ceil(log2 n)+1 and a stack
of depth+2 entries suffices; STACK_CAP covers n up to 2^30.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

STACK_CAP = 36  # depth(2^30-balanced) + slack; 2 pushes pop 1 per visit

_I32_MAX = np.int32(2**31 - 1)


@functools.partial(jax.jit, static_argnames=("cap",))
def _batched_traverse(q, ref, p, dim, split_val, cap: int):
    """q: (m, k); tree arrays on device. Returns (idx (m,), d2 (m,))."""

    def one(qi):
        # Stack slot 0 = sentinel; entries are (node, plane_d2).
        stack_n = jnp.zeros((STACK_CAP,), jnp.int32)
        stack_d = jnp.zeros((STACK_CAP,), jnp.float32)
        stack_n = stack_n.at[0].set(1)  # root, plane_d2 0
        # Hard step bound: a valid traversal pops each node at most once
        # (<= cap pops); the bound is a safety valve against watchdog
        # kills, never reached for well-formed trees.
        max_steps = jnp.int32(cap + STACK_CAP)
        state = (jnp.int32(1), jnp.float32(jnp.inf), _I32_MAX, stack_n,
                 stack_d, jnp.int32(0))

        def cond(state):
            sp, best, besti, _, _, steps = state
            return (sp > 0) & (steps < max_steps)

        def body(state):
            sp, best, besti, stack_n, stack_d, steps = state
            sp = sp - 1
            node = stack_n[sp]
            plane_d2 = stack_d[sp]

            def visit(args):
                # All tree-array reads go through jnp.take (gather): scalar
                # ref[pi]-style indexing would batch under vmap as a
                # dynamic_slice that XLA lowers by broadcasting the whole
                # array per query — observed as an (m, n, k) HBM blowup.
                sp, best, besti, stack_n, stack_d = args
                pi = jnp.take(p, node)
                r = jnp.take(ref, pi, axis=0)
                diff = qi - r
                d2 = jnp.sum(diff * diff)
                better = (d2 < best) | ((d2 == best) & (pi < besti))
                best = jnp.where(better, d2, best)
                besti = jnp.where(better, pi, besti)
                delta = jnp.take(qi, jnp.take(dim, node)) - jnp.take(split_val, node)
                near = jnp.where(delta < 0, 2 * node, 2 * node + 1)
                far = jnp.where(delta < 0, 2 * node + 1, 2 * node)
                # Push far (pruned at pop), then near (popped first).
                def push(sp, stack_n, stack_d, child, pd2):
                    ok = (child < cap) & (jnp.take(p, child, mode="clip") >= 0)
                    stack_n = stack_n.at[sp].set(jnp.where(ok, child, 0))
                    stack_d = stack_d.at[sp].set(pd2)
                    return sp + ok.astype(jnp.int32), stack_n, stack_d

                sp, stack_n, stack_d = push(sp, stack_n, stack_d, far,
                                            delta * delta)
                sp, stack_n, stack_d = push(sp, stack_n, stack_d, near,
                                            jnp.float32(0))
                return sp, best, besti, stack_n, stack_d

            # Prune: skip when the splitting plane is already farther than
            # the best (strict >: equal-distance points are still visited).
            pruned = plane_d2 > best
            out = jax.lax.cond(
                pruned,
                lambda args: args,
                visit,
                (sp, best, besti, stack_n, stack_d),
            )
            return (*out, steps + 1)

        sp, best, besti, _, _, _ = jax.lax.while_loop(cond, body, state)
        return besti, best

    idx, d2 = jax.vmap(one)(q)
    return idx.astype(jnp.int32), d2


class DeviceKDTree:
    """Tree arrays uploaded once; queries run batched on device."""

    def __init__(self, tree):
        self.n = tree.n
        self.cap = int(tree.p.shape[0])
        self.ref = jnp.asarray(tree.ref)
        self.p = jnp.asarray(tree.p)
        self.dim = jnp.asarray(jnp.maximum(jnp.asarray(tree.dim), 0))
        self.split_val = jnp.asarray(tree.split_val)

    def query(self, search):
        q = jnp.asarray(search, jnp.float32)
        return _batched_traverse(q, self.ref, self.p, self.dim,
                                 self.split_val, self.cap)
