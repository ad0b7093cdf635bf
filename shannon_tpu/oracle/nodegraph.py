"""Mutable assembly graph shared by oracle multibridging and sparse flow
(the per-component structure the reference's run_MB_SF operates on;
SURVEY.md §4.3).

Nodes carry a base string, a k-mer-count-weighted abundance, and
adjacency; reads are symbolic node-id paths threaded once against the
condensed graph and rerouted through node splits (so no re-threading
against mutated sequences is ever needed — splits only refine paths).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from shannon_tpu.oracle.graph import ContigGraph


@dataclass
class Node:
    seq: str
    abundance: float
    klen: int  # number of member k-mers == len(seq) - k + 1
    out: list[int] = field(default_factory=list)
    inc: list[int] = field(default_factory=list)
    alive: bool = True


@dataclass
class NodeGraph:
    k: int
    nodes: list[Node]
    paths: list[list[int]]  # UNIQUE evidence paths (node-id sequences)
    # multiplicity of each unique path (reads yielding the same node path
    # collapse into one weighted entry, so per-path host loops scale with
    # graph complexity, not read count; weighted evidence counts equal
    # the per-read multiset exactly)
    path_weights: list[int] = field(default_factory=list)

    @classmethod
    def from_contig_graph(
        cls,
        g: ContigGraph,
        paths: list[list[int]] | None = None,
        weights: list[int] | None = None,
    ) -> "NodeGraph":
        nodes = [
            Node(
                seq=c.seq,
                abundance=c.abundance,
                klen=len(c.seq) - g.k + 1,  # == #member k-mers
                out=list(g.out_edges[i]),
                inc=list(g.in_edges[i]),
            )
            for i, c in enumerate(g.contigs)
        ]
        out = cls(k=g.k, nodes=nodes, paths=[])
        out.set_paths(paths or [], weights)
        return out

    def set_paths(
        self, paths: list[list[int]], weights: list[int] | None = None
    ) -> None:
        """Replace the evidence paths, merging duplicates into weights.
        First-occurrence order is kept, so downstream iteration order
        (edge insertion, evidence accumulation) matches the un-deduped
        per-read sequence exactly."""
        if weights is None:
            weights = [1] * len(paths)
        agg: dict[tuple[int, ...], int] = {}
        for p, w in zip(paths, weights):
            key = tuple(p)
            agg[key] = agg.get(key, 0) + w
        self.paths = [list(kk) for kk in agg]
        self.path_weights = list(agg.values())

    def path_weight_list(self) -> list[int]:
        """Weights aligned with self.paths (ones when a caller assigned
        self.paths directly)."""
        if len(self.path_weights) != len(self.paths):
            self.path_weights = [1] * len(self.paths)
        return self.path_weights

    # ------------------------------------------------------------------
    def add_node(self, seq: str, abundance: float, klen: int) -> int:
        self.nodes.append(Node(seq=seq, abundance=abundance, klen=klen))
        return len(self.nodes) - 1

    def add_edge(self, u: int, v: int) -> None:
        if v not in self.nodes[u].out:
            self.nodes[u].out.append(v)
        if u not in self.nodes[v].inc:
            self.nodes[v].inc.append(u)

    def remove_node(self, v: int) -> None:
        nv = self.nodes[v]
        for u in nv.inc:
            if u != v:
                self.nodes[u].out = [x for x in self.nodes[u].out if x != v]
        for w in nv.out:
            if w != v:
                self.nodes[w].inc = [x for x in self.nodes[w].inc if x != v]
        nv.out, nv.inc, nv.alive = [], [], False

    def x_nodes(self) -> list[int]:
        """Unresolved repeat nodes: indeg > 1 and outdeg > 1 (SURVEY.md
        §4.3 'X-node')."""
        return [
            i
            for i, n in enumerate(self.nodes)
            if n.alive and len(n.inc) > 1 and len(n.out) > 1
        ]

    # ------------------------------------------------------------------
    def condense(self) -> None:
        """Merge every chain u -> v with outdeg(u)==1, indeg(v)==1,
        u != v, concatenating sequences with the (k-1)-overlap dropped and
        k-mer-count-weighting abundances.  Read paths are remapped.
        Deterministic: chains are walked from their lowest-id head."""
        n0 = len(self.nodes)

        def mergeable(u: int, v: int) -> bool:
            return (
                u != v
                and len(self.nodes[u].out) == 1
                and len(self.nodes[v].inc) == 1
            )

        head_of: dict[int, int] = {}
        chains: list[list[int]] = []
        # heads: alive nodes whose unique predecessor (if any) is not
        # merge-linked to them
        for v in range(n0):
            if not self.nodes[v].alive:
                continue
            inc = self.nodes[v].inc
            if len(inc) == 1 and mergeable(inc[0], v):
                continue
            chain = [v]
            x = v
            while True:
                out = self.nodes[x].out
                if len(out) != 1:
                    break
                y = out[0]
                if not mergeable(x, y) or y in head_of or y == chain[0]:
                    break
                chain.append(y)
                head_of[y] = v
                x = y
            head_of[v] = v
            chains.append(chain)
        # isolated cycles where every link is mergeable: every node has a
        # merge-linked predecessor, so none was picked as head; walk from
        # the lowest id.
        for v in range(n0):
            if self.nodes[v].alive and v not in head_of:
                chain = [v]
                head_of[v] = v
                x = v
                while True:
                    y = self.nodes[x].out[0]
                    if y in head_of:
                        break
                    chain.append(y)
                    head_of[y] = v
                    x = y
                chains.append(chain)

        k1 = self.k - 1
        remap: dict[int, int] = {}
        for chain in chains:
            h = chain[0]
            if len(chain) > 1:
                seq = self.nodes[h].seq + "".join(
                    self.nodes[x].seq[k1:] for x in chain[1:]
                )
                wsum = sum(self.nodes[x].abundance * self.nodes[x].klen for x in chain)
                klen = sum(self.nodes[x].klen for x in chain)
                tail = chain[-1]
                new_out = list(self.nodes[tail].out)
                nh = self.nodes[h]
                nh.seq, nh.abundance, nh.klen = seq, wsum / klen, klen
                nh.out = new_out
                for x in chain[1:]:
                    self.nodes[x].alive = False
                    self.nodes[x].out, self.nodes[x].inc = [], []
            for x in chain:
                remap[x] = h
        # rebuild inc/out with remapped ids
        for v in range(len(self.nodes)):
            nv = self.nodes[v]
            if nv.alive:
                nv.out = sorted({remap.get(w, w) for w in nv.out})
        for v in range(len(self.nodes)):
            self.nodes[v].inc = []
        for v in range(len(self.nodes)):
            for w in self.nodes[v].out:
                self.nodes[w].inc.append(v)
        for v in range(len(self.nodes)):
            self.nodes[v].inc.sort()
        # remap read paths, collapsing consecutive duplicates; paths made
        # equal by the remap merge their weights
        new_paths: list[list[int]] = []
        for p in self.paths:
            q: list[int] = []
            for x in p:
                h = remap.get(x, x)
                if not q or q[-1] != h:
                    q.append(h)
            new_paths.append(q)
        self.set_paths(new_paths, self.path_weight_list())

    # ------------------------------------------------------------------
    def alive_ids(self) -> list[int]:
        return [i for i, n in enumerate(self.nodes) if n.alive]

    def components(self) -> list[list[int]]:
        """Weakly-connected components over alive nodes."""
        ids = self.alive_ids()
        parent = {i: i for i in ids}

        def find(a: int) -> int:
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for u in ids:
            for v in self.nodes[u].out:
                ra, rb = find(u), find(v)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        groups: dict[int, list[int]] = {}
        for u in ids:
            groups.setdefault(find(u), []).append(u)
        return [groups[r] for r in sorted(groups)]
