"""Oracle sparse flow — per-node sparsest flow decomposition (reference
stage 4 SF; SURVEY.md §3.1 'Sparse flow', §4.3).

Spec (binding for the TPU pipeline):

  * For every remaining X-node v (indeg>1, outdeg>1 after MB), take
    in-flows a_i = abund(u_i) / outdeg(u_i) and out-flows
    b_j = abund(w_j) / indeg(w_j) (a neighbor's abundance is divided
    evenly among its parallel branch directions — the only local
    estimate available without resolved global flow), then rescale both
    sides to a common total s = (Σa + Σb)/2.

  * **Decomposition**: find a sparse nonnegative matrix F with row sums a
    and column sums b.  Solver: greedy max-min — repeatedly pick the
    (i, j) maximizing min(a_i, b_j), assign f_ij = min(a_i, b_j), deduct;
    stop when residuals < eps.  This yields <= m+n-1 pairings and
    recovers the exact sparsest solution whenever abundances are
    well-separated (the information-optimality regime of the paper).
    `sf_restarts` randomized tie-breaking restarts (seeded with
    config.seed ^ node id -> deterministic) keep the sparsest result,
    ties broken by lexicographically smallest pairing set (SURVEY.md §8
    hard part 4: pinned-seed determinism).

  * Pairings with f_ij < sf_min_flow_frac * s are dropped.  v then
    splits into one copy per surviving pairing exactly as in MB, with
    abundance f_ij (per-k-mer), and read paths reroute the same way.
    Iterate with condensation until no X-nodes remain (or max rounds).
"""

from __future__ import annotations

import numpy as np

from shannon_tpu.config import AssemblyConfig
from shannon_tpu.oracle.nodegraph import NodeGraph


def greedy_decompose(
    a: np.ndarray, b: np.ndarray, rng: np.random.Generator | None = None
) -> list[tuple[int, int, float]]:
    """Greedy max-min transport decomposition of margins (a, b).

    Returns [(i, j, f_ij), ...].  Deterministic when rng is None (ties ->
    smallest (i, j)); with rng, ties are broken uniformly at random.
    """
    a = a.astype(np.float64).copy()
    b = b.astype(np.float64).copy()
    eps = 1e-9 * max(a.sum(), b.sum(), 1.0)
    out: list[tuple[int, int, float]] = []
    for _ in range(len(a) + len(b)):
        if a.max(initial=0.0) <= eps or b.max(initial=0.0) <= eps:
            break
        m = np.minimum.outer(a, b)  # m[i, j] = min(a_i, b_j)
        best = m.max()
        if best <= eps:
            break
        ties = np.argwhere(m >= best - 1e-12 * best)
        if rng is None or len(ties) == 1:
            i, j = ties[0]
        else:
            i, j = ties[rng.integers(len(ties))]
        f = float(min(a[i], b[j]))
        out.append((int(i), int(j), f))
        a[i] -= f
        b[j] -= f
    return out


def _node_flows(g: NodeGraph, v: int) -> tuple[list[int], list[int], np.ndarray, np.ndarray, float]:
    node = g.nodes[v]
    ins = sorted(node.inc)
    outs = sorted(node.out)
    a = np.array(
        [g.nodes[u].abundance / max(len(g.nodes[u].out), 1) for u in ins],
        dtype=np.float64,
    )
    b = np.array(
        [g.nodes[w].abundance / max(len(g.nodes[w].inc), 1) for w in outs],
        dtype=np.float64,
    )
    s = 0.5 * (a.sum() + b.sum())
    if a.sum() > 0:
        a *= s / a.sum()
    if b.sum() > 0:
        b *= s / b.sum()
    return ins, outs, a, b, s


def solve_node(
    g: NodeGraph, v: int, config: AssemblyConfig
) -> list[tuple[int, int, float]]:
    """Sparse-flow pairings for X-node v: [(in_node, out_node, flow)]."""
    ins, outs, a, b, s = _node_flows(g, v)
    if s <= 0:
        return []
    best = greedy_decompose(a, b)

    def key(sol: list[tuple[int, int, float]]) -> tuple:
        return (len(sol), sorted((i, j) for i, j, _ in sol))

    for r in range(config.sf_restarts):
        rng = np.random.default_rng(
            np.uint64(config.seed) ^ np.uint64(v * 2654435761 + r + 1)
        )
        cand = greedy_decompose(a, b, rng)
        if key(cand) < key(best):
            best = cand
    thresh = config.sf_min_flow_frac * s
    return [
        (ins[i], outs[j], f)
        for i, j, f in best
        if f >= thresh
    ]


def sparse_flow(g: NodeGraph, config: AssemblyConfig, max_rounds: int = 16) -> int:
    """Resolve all remaining X-nodes in place; returns #nodes split."""
    total = 0
    for _ in range(max_rounds):
        g.condense()
        xs = g.x_nodes()
        if not xs:
            break
        split_map: dict[int, dict[tuple[int, int], int]] = {}
        for v in xs:
            pairings = solve_node(g, v, config)
            if not pairings:
                continue
            node = g.nodes[v]
            copies: dict[tuple[int, int], int] = {}
            for u, w, f in pairings:
                nid = g.add_node(node.seq, f, node.klen)
                copies[(u, w)] = nid
            split_map[v] = copies
        if not split_map:
            break
        for v, copies in split_map.items():
            for (u, w), nid in copies.items():
                if u not in split_map:
                    g.add_edge(u, nid)
                if w not in split_map:
                    g.add_edge(nid, w)
        # adjacent split X-nodes: connect copies that agree on the shared
        # edge (copy of u with out==v pairs with every copy of v with
        # in==u — flow between specific copies is unknown locally; the
        # conservative join keeps all consistent continuations)
        for v, copies in split_map.items():
            for (u, w), nid in copies.items():
                if u in split_map:
                    for (u2, w2), nid2 in split_map[u].items():
                        if w2 == v:
                            g.add_edge(nid2, nid)
                if w in split_map:
                    for (u2, w2), nid2 in split_map[w].items():
                        if u2 == v:
                            g.add_edge(nid, nid2)
        # reroute read paths (same semantics as MB rerouting)
        new_paths: list[list[int]] = []
        for p in g.paths:
            q: list[int] = []
            for i, x in enumerate(p):
                if x not in split_map:
                    q.append(x)
                    continue
                a_ = p[i - 1] if i > 0 else None
                b_ = p[i + 1] if i + 1 < len(p) else None
                copies = split_map[x]
                nid = copies.get((a_, b_)) if a_ is not None and b_ is not None else None
                if nid is None and a_ is not None and b_ is None:
                    cands = sorted({n for (pa, pb), n in copies.items() if pa == a_})
                    nid = cands[0] if len(cands) == 1 else None
                if nid is None and b_ is not None and a_ is None:
                    cands = sorted({n for (pa, pb), n in copies.items() if pb == b_})
                    nid = cands[0] if len(cands) == 1 else None
                if nid is None:
                    break
                q.append(nid)
            if q:
                new_paths.append(q)
        g.paths = new_paths
        for v in split_map:
            g.remove_node(v)
        total += len(split_map)
    g.condense()
    return total
