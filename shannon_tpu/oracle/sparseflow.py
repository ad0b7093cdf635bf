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
    stop when residuals vanish.  This yields <= m+n-1 pairings and
    recovers the exact sparsest solution whenever abundances are
    well-separated (the information-optimality regime of the paper).

  * **Determinism / portability** (SURVEY.md §8 hard part 4): ties in
    the max-min choice are broken by an arithmetic uint32 hash
    h(i, j, seed) — NOT a host RNG — so the batched device solver
    reproduces the oracle bit-for-bit.  `sf_restarts` restarts vary the
    seed (seed_r = mix(config.seed, fnv1a(node.seq), r)); the sparsest
    result wins, ties between restarts broken by lexicographically
    smallest pairing set.  Restart 0 uses plain smallest-(i, j) ties.

  * Pairings with f_ij < sf_min_flow_frac * s are dropped.  v then
    splits into one copy per surviving pairing exactly as in MB, with
    abundance f_ij (per-k-mer), and read paths reroute the same way.
    Iterate with condensation until no X-nodes remain (or max rounds).
"""

from __future__ import annotations

import numpy as np

from shannon_tpu.config import AssemblyConfig
from shannon_tpu.oracle.nodegraph import NodeGraph

def fnv1a(data: bytes) -> int:
    h = 2166136261
    for byte in data:
        h = ((h ^ byte) * 16777619) & 0xFFFFFFFF
    return h


def tie_hash(i: np.ndarray, j: np.ndarray, seed: int) -> np.ndarray:
    """Portable uint32 mixing hash used for tie-breaking (same formula
    on device)."""
    h = (
        np.uint32(i) * np.uint32(2654435761)
        ^ np.uint32(j) * np.uint32(40503)
        ^ np.uint32(seed)
    )
    h = np.uint32(h ^ (h >> np.uint32(16))) * np.uint32(2246822519)
    return np.uint32(h ^ (h >> np.uint32(13)))


def greedy_decompose(
    a: np.ndarray, b: np.ndarray, seed: int | None = None
) -> list[tuple[int, int, float]]:
    """Greedy max-min transport decomposition of margins (a, b) in
    float32.  seed=None: ties -> smallest flat (i, j); else ties ->
    maximum tie_hash(i, j, seed)."""
    a = a.astype(np.float32).copy()
    b = b.astype(np.float32).copy()
    eps = np.float32(1e-6) * max(a.sum(), b.sum(), np.float32(1.0))
    out: list[tuple[int, int, float]] = []
    for _ in range(len(a) + len(b)):
        m = np.minimum.outer(a, b).astype(np.float32)  # m[i,j]=min(a_i,b_j)
        best = m.max()
        if best <= eps:
            break
        ties = m >= best  # float32 exact max comparison
        if seed is None:
            flat = int(np.argmax(ties))  # first True = smallest (i, j)
        else:
            ii, jj = np.nonzero(ties)
            h = tie_hash(ii.astype(np.uint32), jj.astype(np.uint32), seed)
            # max hash wins; residual hash ties -> smallest flat (i, j)
            cand = np.nonzero(h == h.max())[0]
            flats = ii[cand] * len(b) + jj[cand]
            flat = int(flats.min())
        i, j = divmod(flat, len(b))
        f = np.float32(min(a[i], b[j]))
        out.append((int(i), int(j), float(f)))
        a[i] -= f
        b[j] -= f
    return out


def edge_flows_from_paths(g: NodeGraph) -> dict[tuple[int, int], int]:
    """Read-crossing counts per edge: every consecutive (a, b) in every
    evidence path is one observed traversal.  The most direct junction
    flow estimate available (reference: copy counts maintained through
    every split — SURVEY.md §3.1)."""
    flows: dict[tuple[int, int], int] = {}
    for p, w in zip(g.paths, g.path_weight_list()):
        for i in range(len(p) - 1):
            e = (p[i], p[i + 1])
            flows[e] = flows.get(e, 0) + w
    return flows


def _node_flows(
    g: NodeGraph,
    v: int,
    edge_flows: dict[tuple[int, int], int] | None = None,
) -> tuple[list[int], list[int], np.ndarray, np.ndarray, float]:
    """SF margins for X-node v.  When every in- and out-edge of v has
    read-crossing support, the margins are those crossing counts
    (direct evidence); otherwise fall back to neighbor abundance split
    evenly over its parallel branches (the only local estimate).
    All float32 (device parity)."""
    node = g.nodes[v]
    ins = sorted(node.inc)
    outs = sorted(node.out)
    a = b = None
    if edge_flows is not None:
        fa = [edge_flows.get((u, v), 0) for u in ins]
        fb = [edge_flows.get((v, w), 0) for w in outs]
        if all(x > 0 for x in fa) and all(x > 0 for x in fb):
            a = np.array(fa, dtype=np.float32)
            b = np.array(fb, dtype=np.float32)
    if a is None:
        a = np.array(
            [
                np.float32(g.nodes[u].abundance)
                / np.float32(max(len(g.nodes[u].out), 1))
                for u in ins
            ],
            dtype=np.float32,
        )
        b = np.array(
            [
                np.float32(g.nodes[w].abundance)
                / np.float32(max(len(g.nodes[w].inc), 1))
                for w in outs
            ],
            dtype=np.float32,
        )
    s = np.float32(0.5) * (a.sum() + b.sum())
    if a.sum() > 0:
        a = a * (s / a.sum())
    if b.sum() > 0:
        b = b * (s / b.sum())
    return ins, outs, a, b, float(s)


def solve_node(
    g: NodeGraph, v: int, config: AssemblyConfig, edge_flows=None
) -> list[tuple[int, int, float]]:
    """Sparse-flow pairings for X-node v: [(in_node, out_node, flow)]."""
    ins, outs, a, b, s = _node_flows(g, v, edge_flows)
    if s <= 0:
        return []
    best = greedy_decompose(a, b, seed=None)

    def key(sol: list[tuple[int, int, float]]) -> tuple:
        # (pairing count, support-bitmask value) — bitmask bit i*N+j.
        # Chosen over sorted-list lexicographic order because the device
        # solver compares it as two uint32 words (M*N <= 64).
        mask = 0
        for i, j, _ in sol:
            mask |= 1 << (i * len(b) + j)
        return (len(sol), mask)

    node_seed = fnv1a(g.nodes[v].seq.encode()) ^ config.seed
    for r in range(config.sf_restarts):
        cand = greedy_decompose(a, b, seed=(node_seed + r + 1) & 0xFFFFFFFF)
        if key(cand) < key(best):
            best = cand
    thresh = np.float32(config.sf_min_flow_frac) * np.float32(s)
    return [(ins[i], outs[j], f) for i, j, f in best if f >= thresh]


def sparse_flow(
    g: NodeGraph,
    config: AssemblyConfig,
    max_rounds: int = 16,
    solver=None,
) -> int:
    """Resolve all remaining X-nodes in place; returns #nodes split.

    solver(g, xs, config) -> {node: pairings} decomposes a round's
    X-nodes; default is the per-node host solver, the device backend
    passes the batched kernel (ops/sparseflow.solve_nodes_device) —
    both produce identical pairings (tested)."""
    total = 0
    for _ in range(max_rounds):
        g.condense()
        xs = g.x_nodes()
        if not xs:
            break
        flows = edge_flows_from_paths(g) if config.sf_use_read_flows else None
        if solver is None:
            solved = {v: solve_node(g, v, config, flows) for v in xs}
        else:
            solved = solver(g, xs, config, flows)
        split_map: dict[int, dict[tuple[int, int], int]] = {}
        for v in xs:
            pairings = solved.get(v) or []
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
        # edge (flow between specific copies is unknown locally; the
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
        new_weights: list[int] = []
        for p, pw in zip(g.paths, g.path_weight_list()):
            q: list[int] = []
            for i, x in enumerate(p):
                if x not in split_map:
                    q.append(x)
                    continue
                a_ = p[i - 1] if i > 0 else None
                b_ = p[i + 1] if i + 1 < len(p) else None
                copies = split_map[x]
                nid = (
                    copies.get((a_, b_))
                    if a_ is not None and b_ is not None
                    else None
                )
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
                new_weights.append(pw)
        g.set_paths(new_paths, new_weights)
        for v in split_map:
            g.remove_node(v)
        total += len(split_map)
    g.condense()
    return total
