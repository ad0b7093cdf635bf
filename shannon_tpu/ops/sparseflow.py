"""Device batched sparse flow (SURVEY.md §8 M4): thousands of per-node
greedy max-min transport decompositions solved as one vmapped
fixed-iteration kernel, bit-identical to the oracle solver
(shannon_tpu/oracle/sparseflow.py — float32 arithmetic, identical
tie-hash, identical restart-selection key).

Nodes are padded to a fixed (M, N) = (8, 8) margin shape (dBG degrees
are <= 4 per side; MB splits can push higher — larger nodes fall back
to the host solver).  Each node is solved with sf_restarts+1 seeds at
once; restart selection (min pairing count, then min support-bitmask)
happens on host from the returned flow tensors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shannon_tpu.oracle.sparseflow import SF_MAXD, _node_flows, fnv1a, solve_node

MAXD = SF_MAXD  # padded margin size per side


def _tie_hash_dev(i, j, seed):
    h = (
        i.astype(jnp.uint32) * jnp.uint32(2654435761)
        ^ j.astype(jnp.uint32) * jnp.uint32(40503)
        ^ seed.astype(jnp.uint32)
    )
    h = (h ^ (h >> 16)) * jnp.uint32(2246822519)
    return h ^ (h >> 13)


@partial(jax.jit, static_argnames=("max_steps",))
def batched_greedy(
    a: jnp.ndarray,  # [B, M] float32 (zero-padded)
    b: jnp.ndarray,  # [B, N] float32
    seeds: jnp.ndarray,  # [B] uint32
    use_hash: jnp.ndarray,  # [B] bool (False -> lexicographic ties)
    max_steps: int = 2 * MAXD,
) -> jnp.ndarray:
    """Flow tensors F [B, M, N] of the greedy max-min decomposition."""
    B, M = a.shape
    N = b.shape[1]
    eps = jnp.float32(1e-6) * jnp.maximum(
        jnp.maximum(a.sum(1), b.sum(1)), jnp.float32(1.0)
    )  # [B]
    ii = jax.lax.broadcasted_iota(jnp.int32, (M, N), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (M, N), 1)

    def step(_, state):
        a, b, F = state
        m = jnp.minimum(a[:, :, None], b[:, None, :])  # [B, M, N]
        best = m.max(axis=(1, 2))  # [B]
        active = best > eps
        ties = m >= best[:, None, None]
        # lexicographic pick: first tie in row-major order
        flat_lex = jnp.argmax(ties.reshape(B, -1), axis=1)
        # hash pick: max tie_hash, residual ties -> smallest flat index
        h = _tie_hash_dev(ii[None], jj[None], seeds[:, None, None])
        hm = jnp.where(ties, h, 0).max(axis=(1, 2))
        cand = ties & (h == hm[:, None, None])
        flat_hash = jnp.argmax(cand.reshape(B, -1), axis=1)
        flat = jnp.where(use_hash, flat_hash, flat_lex).astype(jnp.int32)
        pi = flat // N
        pj = flat % N
        oh_i = jax.nn.one_hot(pi, M, dtype=jnp.float32)  # [B, M]
        oh_j = jax.nn.one_hot(pj, N, dtype=jnp.float32)
        f = jnp.where(active, best, 0.0)
        a = a - f[:, None] * oh_i
        b = b - f[:, None] * oh_j
        F = F + f[:, None, None] * (oh_i[:, :, None] * oh_j[:, None, :])
        return a, b, F

    F0 = jnp.zeros((B, M, N), jnp.float32)
    _, _, F = jax.lax.fori_loop(0, max_steps, step, (a, b, F0))
    return F


def solve_nodes_device(g, xs: list[int], config, edge_flows=None) -> dict[int, list]:
    """Batched device solver for all X-nodes in xs; mirrors oracle
    solve_node exactly (same block plan, margins, seeds,
    restart-selection, threshold).  One batch row per (node, block,
    restart).  Oversized nodes (degree > MAXD) use the host solver."""
    from shannon_tpu.oracle.sparseflow import node_blocks

    R = config.sf_restarts
    K = R + 1
    jobs = []  # (v, ins, outs, rows, cols, ab, bb, s, node_seed)
    result: dict[int, list] = {}
    for v in xs:
        ins, outs, a, b, s = _node_flows(g, v, edge_flows)
        if s <= 0:
            result[v] = []
            continue
        if len(ins) > MAXD or len(outs) > MAXD:
            result[v] = solve_node(g, v, config, edge_flows)
            continue
        result[v] = []
        node_seed = fnv1a(g.nodes[v].seq.encode()) ^ config.seed
        for rows, cols, ab, bb in node_blocks(a, b, config, s):
            jobs.append((v, ins, outs, rows, cols, ab, bb, s, node_seed))
    if not jobs:
        return result

    B = len(jobs)
    # pad the batch to a power of two (min 64): B varies per round and
    # per bucket, and every distinct shape is a fresh XLA compile —
    # measured 36s of recompiles in one 100k-read assembly vs 4s of
    # actual solving.  Zero-margin pad rows solve to all-zero flows.
    B_pad = max(64, 1 << (B - 1).bit_length())
    a_pad = np.zeros((B_pad * K, MAXD), np.float32)
    b_pad = np.zeros((B_pad * K, MAXD), np.float32)
    seeds = np.zeros(B_pad * K, np.uint32)
    use_hash = np.zeros(B_pad * K, bool)
    for bi, (v, ins, outs, brows, bcols, ab, bb, s, node_seed) in enumerate(
        jobs
    ):
        for r in range(K):
            row = bi * K + r
            a_pad[row, : len(ab)] = ab
            b_pad[row, : len(bb)] = bb
            if r > 0:
                seeds[row] = np.uint32((node_seed + r) & 0xFFFFFFFF)
                use_hash[row] = True
    F = np.asarray(
        batched_greedy(
            jnp.asarray(a_pad), jnp.asarray(b_pad),
            jnp.asarray(seeds), jnp.asarray(use_hash),
        )
    )  # [B*K, MAXD, MAXD]

    # vectorized restart selection: key = (pairing count, support
    # bitmask at stride MAXD — identical to the host key); earliest
    # restart among equal keys wins, matching oracle _best_of_restarts
    nz = F[: B * K] > 0  # [B*K, MAXD, MAXD]
    counts = nz.sum(axis=(1, 2)).reshape(B, K)
    bit = (
        np.uint64(1)
        << (
            np.arange(MAXD, dtype=np.uint64)[:, None] * np.uint64(MAXD)
            + np.arange(MAXD, dtype=np.uint64)[None, :]
        )
    )
    masks = (nz * bit).sum(axis=(1, 2), dtype=np.uint64).reshape(B, K)
    cmin = counts.min(axis=1, keepdims=True)
    cand = counts == cmin
    m_masked = np.where(cand, masks, np.uint64(0xFFFFFFFFFFFFFFFF))
    mmin = m_masked.min(axis=1, keepdims=True)
    best_r = (cand & (m_masked == mmin)).argmax(axis=1)  # first True

    for bi, (v, ins, outs, brows, bcols, ab, bb, s, node_seed) in enumerate(
        jobs
    ):
        M, N = len(ab), len(bb)
        best_F = F[bi * K + best_r[bi], :M, :N]
        thresh = np.float32(config.sf_min_flow_frac) * np.float32(s)
        result[v].extend(
            (ins[brows[i]], outs[bcols[j]], float(best_F[i, j]))
            for i, j in zip(*np.nonzero(best_F >= thresh))
        )
    return result
