"""Oracle multibridging — read threading + repeat-node resolution
(reference stage 4 MB; SURVEY.md §3.1 'Multibridging', §4.3).

Spec (binding for the TPU pipeline):

  * **Threading**: each read is mapped to a node path once, on the
    condensed graph: walk the read's k-mers (as-is orientation; in
    canonical mode the RC copy of the path is implied by graph symmetry
    and is added explicitly so both orientation copies receive identical
    evidence), look each up in the k-mer -> (contig, offset) map, take the
    longest consecutive run of found k-mers with *consistent geometry*
    (same contig with advancing offset, or a contig-graph edge at a
    contig boundary), and record the sequence of distinct contigs
    visited.  Reads whose k-mers are all absent (fully corrected away)
    contribute no path.

  * **Evidence**: every consecutive triple (a, v, b) in a read path is
    one unit of bridging evidence for pairing in-edge (a,v) with
    out-edge (v,b) at v.  Paired-end mates whose paths connect through an
    edge contribute a joined path (mate path reverse-complemented into
    the read's orientation), extending evidence across gaps shorter than
    one node — the 'long context' mechanism (SURVEY.md §6).

  * **Resolution** (iterated with condensation until fixpoint): an X-node
    v (indeg>1, outdeg>1) is *fully bridged* when every in-neighbor and
    every out-neighbor of v appears in at least one evidence pair at v.
    A fully bridged v splits into one copy per distinct evidence pair
    (u, w): copy v_{u,w} has edges u -> v_{u,w} -> w, sequence = v's,
    abundance = abund(v) * evidence(u,w) / total_evidence(v).  Read
    paths through v are rerouted to the matching copy; reads that start
    (resp. end) at v reroute to the unique copy consistent with their
    next (resp. previous) node if unique, otherwise their path is
    truncated at v (ambiguous continuation carries no evidence).
    All fully bridged X-nodes split in the same round (jacobi-style,
    order-independent -> reproducible on device).
"""

from __future__ import annotations

from collections import Counter

from shannon_tpu.config import AssemblyConfig
from shannon_tpu.oracle.counting import _seq_kmers
from shannon_tpu.oracle.graph import ContigGraph
from shannon_tpu.oracle.nodegraph import NodeGraph

import numpy as np


def thread_read_runs(
    codes: np.ndarray,
    k: int,
    contig_of_kmer: dict[int, tuple[int, int]],
    graph: ContigGraph,
) -> list[tuple[list[int], int]]:
    """Map one read to its consistent runs: [(contig path, #windows)],
    in read order.

    A run is a maximal stretch of consecutive windows whose k-mers are
    alive.  Note: consecutive alive windows are automatically
    geometrically consistent (an alive k-mer's in-contig successor is
    its unique graph successor), so no adjacency re-checks are needed —
    the device threading kernel relies on the same fact.
    """
    kmers = _seq_kmers(codes, k)
    if len(kmers) == 0:
        return []
    hits = [contig_of_kmer.get(int(v)) for v in kmers]

    runs: list[tuple[list[int], int]] = []
    cur: list[int] = []
    cur_w = 0
    prev: tuple[int, int] | None = None

    def flush() -> None:
        nonlocal cur, cur_w
        if cur_w:
            runs.append((cur, cur_w))
        cur, cur_w = [], 0

    for h in hits:
        if h is None:
            flush()
            prev = None
            continue
        cid, off = h
        if prev is None:
            cur = [cid]
            cur_w = 1
        else:
            cur_w += 1
            if off == 0:
                cur.append(cid)  # crossing a contig boundary
        prev = (cid, off)
    flush()
    return runs


def thread_read(
    codes: np.ndarray,
    k: int,
    contig_of_kmer: dict[int, tuple[int, int]],
    graph: ContigGraph,
) -> list[int]:
    """Longest-run contig path (ties -> earliest run); the
    rescue_reads=False threading mode."""
    runs = thread_read_runs(codes, k, contig_of_kmer, graph)
    best: list[int] = []
    best_w = 0
    for path, w in runs:
        if w > best_w:
            best, best_w = path, w
    return best


def join_pair_paths(
    pl: list[int], pr: list[int], graph: ContigGraph
) -> list[int] | None:
    """Join mate paths (both already in transcript orientation — mate 2
    is reverse-complemented at ingest).  Prefers the largest contig-level
    overlap (suffix of pl == prefix of pr); falls back to a gap join when
    an edge pl[-1] -> pr[0] exists (fragment gap shorter than a contig —
    the paired-end 'long context' bridge, SURVEY.md §6).  None if the
    paths neither overlap nor connect."""
    if not pl or not pr:
        return None
    for t in range(len(pl)):
        m = len(pl) - t
        if m <= len(pr) and pl[t:] == pr[:m]:
            return pl + pr[m:]
        if m > len(pr) and pl[t : t + len(pr)] == pr:
            return pl  # mate 2 entirely inside mate 1's path
    if pr[0] in graph.out_edges[pl[-1]]:
        return pl + pr
    return None


def expand_paths(
    raw_runs: list[list[list[int]]],
    graph: ContigGraph,
    config: AssemblyConfig,
    paired: bool = False,
    weights: list[int] | None = None,
) -> tuple[list[list[int]], list[int]]:
    """Per-read run lists (aligned with reads; [] = unthreadable) ->
    (evidence path list, per-path multiplicities):

      * every run is evidence (read rescue);
      * for pairs, the facing ends (last run of mate 1, first run of
        mate 2 — both already transcript-oriented) are joined where
        possible, bridging repeats longer than a read;
      * in canonical mode each path's RC twin is added so both
        orientation copies of the graph receive identical evidence;
      * `weights` (aligned with raw_runs; mates of a deduped pair carry
        equal weight) lets callers pass pre-deduplicated rows — every
        emitted path inherits its source read's multiplicity.

    Shared by the oracle and device threading backends."""
    out: list[list[int]] = []
    out_w: list[int] = []
    if weights is None:
        weights = [1] * len(raw_runs)

    def emit(p: list[int], w: int) -> None:
        if not p:
            return
        out.append(p)
        out_w.append(w)
        if not config.strand_specific:
            out.append([graph.rc_pair[c] for c in reversed(p)])
            out_w.append(w)

    def emit_all(runs: list[list[int]], w: int) -> None:
        for p in runs:
            emit(p, w)

    if paired and config.use_pairs:
        for i in range(0, len(raw_runs) - 1, 2):
            rl, rr = raw_runs[i], raw_runs[i + 1]
            w = weights[i]
            joined = (
                join_pair_paths(rl[-1], rr[0], graph) if rl and rr else None
            )
            if joined is not None:
                emit_all(rl[:-1], w)
                emit(joined, w)
                emit_all(rr[1:], w)
            else:
                emit_all(rl, w)
                emit_all(rr, w)
        if len(raw_runs) % 2:
            emit_all(raw_runs[-1], weights[-1])
    else:
        for runs, w in zip(raw_runs, weights):
            emit_all(runs, w)
    return out, out_w


def thread_reads(
    read_codes: list[np.ndarray],
    graph: ContigGraph,
    config: AssemblyConfig,
    paired: bool = False,
) -> tuple[list[list[int]], list[int]]:
    """Thread every read and expand to evidence (paths, weights)
    (rescue + pair joining + RC twins per expand_paths)."""
    contig_of_kmer = graph._contig_of_kmer  # type: ignore[attr-defined]
    raw: list[list[list[int]]] = []
    for codes in read_codes:
        runs = thread_read_runs(codes, config.k, contig_of_kmer, graph)
        if not config.rescue_reads:
            best: list[int] = []
            best_w = 0
            for path, w in runs:
                if w > best_w:
                    best, best_w = path, w
            raw.append([best] if best else [])
        else:
            raw.append([path for path, _w in runs])
    return expand_paths(raw, graph, config, paired)


def _evidence_at(g: NodeGraph) -> dict[int, Counter]:
    ev: dict[int, Counter] = {}
    for p, w in zip(g.paths, g.path_weight_list()):
        for i in range(1, len(p) - 1):
            a, v, b = p[i - 1], p[i], p[i + 1]
            ev.setdefault(v, Counter())[(a, b)] += w
    return ev


def multibridge(g: NodeGraph, config: AssemblyConfig, max_rounds: int = 16) -> int:
    """Run MB resolution rounds in place; returns number of nodes split."""
    total_split = 0
    for _ in range(max_rounds):
        g.condense()
        ev = _evidence_at(g)
        targets: list[tuple[int, Counter]] = []
        for v in g.x_nodes():
            pairs = ev.get(v)
            if not pairs:
                continue
            ins = {a for (a, _b) in pairs}
            outs = {b for (_a, b) in pairs}
            if ins == set(g.nodes[v].inc) and outs == set(g.nodes[v].out):
                targets.append((v, pairs))
        if not targets:
            break
        split_map: dict[int, dict[tuple[int, int], int]] = {}
        for v, pairs in targets:
            node = g.nodes[v]
            total_ev = sum(pairs.values())
            copies: dict[tuple[int, int], int] = {}
            for (a, b), cnt in sorted(pairs.items()):
                nid = g.add_node(
                    node.seq, node.abundance * cnt / total_ev, node.klen
                )
                copies[(a, b)] = nid
            split_map[v] = copies
        # wire copies; neighbor endpoints may themselves be split nodes —
        # but a neighbor of an X-node has (indeg<=1 or outdeg<=1) only if
        # it is not itself fully-bridged-X; two adjacent split X-nodes are
        # handled by path rerouting below plus edge wiring via paths.
        for v, copies in split_map.items():
            for (a, b), nid in copies.items():
                if a not in split_map:
                    g.add_edge(a, nid)
                if b not in split_map:
                    g.add_edge(nid, b)
        # reroute read paths and wire split-split adjacencies from paths
        new_paths: list[list[int]] = []
        new_weights: list[int] = []
        for p, pw in zip(g.paths, g.path_weight_list()):
            q: list[int] = []
            ok = True
            for i, x in enumerate(p):
                if x in split_map:
                    a = p[i - 1] if i > 0 else None
                    b = p[i + 1] if i + 1 < len(p) else None
                    copies = split_map[x]
                    if a is not None and b is not None:
                        key_a = _resolved_endpoint(split_map, p, i - 1)
                        key_b = _resolved_endpoint(split_map, p, i + 1)
                        nid = copies.get((key_a, key_b))
                        if nid is None:
                            ok = False
                            break
                        q.append(nid)
                    else:
                        # read starts/ends at the split node: unique match?
                        if a is None and b is not None:
                            cands = sorted(
                                {n for (pa, pb), n in copies.items() if pb == _resolved_endpoint(split_map, p, i + 1)}
                            )
                        elif b is None and a is not None:
                            cands = sorted(
                                {n for (pa, pb), n in copies.items() if pa == _resolved_endpoint(split_map, p, i - 1)}
                            )
                        else:  # single-node path
                            cands = []
                        if len(cands) == 1:
                            q.append(cands[0])
                        else:
                            break  # truncate (ambiguous)
                else:
                    q.append(x)
            if ok and q:
                new_paths.append(q)
                new_weights.append(pw)
        g.set_paths(new_paths, new_weights)
        # wire consecutive copies appearing in rerouted paths (covers the
        # adjacent-split-node case)
        for p in g.paths:
            for i in range(len(p) - 1):
                g.add_edge(p[i], p[i + 1])
        # retire the split originals
        for v in split_map:
            g.remove_node(v)
        total_split += len(split_map)
    g.condense()
    return total_split


def _resolved_endpoint(
    split_map: dict[int, dict[tuple[int, int], int]], p: list[int], i: int
) -> int:
    """Original-id endpoint for evidence keys: evidence pairs are keyed by
    pre-split neighbor ids, so a neighbor that is itself being split still
    matches by its original id."""
    return p[i]
