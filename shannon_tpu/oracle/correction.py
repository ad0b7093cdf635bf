"""Oracle error correction — the reference's abundance filter + iterative
extension correction (SURVEY.md §3.1 extension_correction, §4.2).

Spec (binding for the TPU pipeline):

  1. **Abundance filter**: drop k-mers with count < min_abundance.

  2. **Sibling-ratio branch pruning**, iterated to fixpoint (or
     correction_rounds):  work on the *canonical orientation* of each
     alive k-mer x (its packed value; for strand-specific input, the
     as-counted orientation).  Define
       right-siblings(x) = alive k-mers of the form prefix_{k-1}(x)·b,
       left-siblings(x)  = alive k-mers of the form b·suffix_{k-1}(x),
     where membership is tested up to canonicalization.  x is pruned in a
     round if
       count(x) < sibling_ratio * max(count over right-siblings(x)) OR
       count(x) < sibling_ratio * max(count over left-siblings(x)),
     with the comparison evaluated in IEEE float32 (the device compute
     precision — fixing the precision makes oracle/device parity exact at
     threshold boundaries).
     (x is its own sibling on both sides, so a lone branch never prunes.)
     All prunes within a round are decided against the round's *starting*
     alive set (jacobi-style, not gauss-seidel) — this makes the result
     order-independent and therefore reproducible on device.

     Rationale: sequencing errors create low-abundance alternative branches
     at dBG forks; the relative threshold removes them while keeping
     legitimate low-expression isoforms whose branches are not dominated.
     This is the role the reference's weak-extension trimming plays
     (exact reference algorithm unverifiable — SURVEY.md §0; this spec is
     the project's contract).

  3. **Tip clipping** (`clip_tips`), iterated with condensation: branch
     pruning removes the fork k-mer of a sequencing-error path but leaves
     the rest dangling (its interior k-mers are their own only siblings).
     On the condensed graph, such remnants are short dead-end or isolated
     contigs.  Per round, remove simultaneously every contig c with
     klen(c) <= tip_klen_effective that is
       * isolated (no in- and no out-edges) and shorter than
         min_transcript_length, or
       * dead on one side, and dominated at its attachment junction:
         abundance(c) < sibling_ratio * max(abundance of competing
         contigs entering the same neighbors), or
       * a **popped bubble**: indeg == outdeg == 1 with in-neighbor u
         and out-neighbor w, dominated by a parallel branch:
         abundance(c) < sibling_ratio * max(abundance of x != c with
         u -> x -> w).  (A sequencing error mid-read creates a parallel
         path reconnecting at both ends — invisible to tip rules.)
     All comparisons in float32.  Re-condense and repeat until fixpoint
     or correction_rounds.
"""

from __future__ import annotations

import numpy as np

from shannon_tpu.config import AssemblyConfig
from shannon_tpu.oracle.counting import canon_kmer, revcomp_kmer


def _alive_count(counts: dict[int, int], v: int, k: int, strand_specific: bool) -> int:
    key = v if strand_specific else canon_kmer(v, k)
    return counts.get(key, 0)


def correct_kmers(
    counts: dict[int, int], config: AssemblyConfig
) -> dict[int, int]:
    """Return the corrected (k-mer -> count) table per the spec above."""
    k = config.k
    ss = config.strand_specific
    alive = {
        v: c for v, c in counts.items() if c >= config.min_abundance
    }
    if config.sibling_ratio <= 0.0:
        return alive

    mask = (1 << (2 * k)) - 1
    hi_shift = 2 * (k - 1)

    for _ in range(config.correction_rounds):
        pruned: list[int] = []
        for v, c in alive.items():
            # right siblings: prefix_{k-1}(v) . b
            base = v & ~0x3
            rmax = 0
            for b in range(4):
                rmax = max(rmax, _alive_count(alive, base | b, k, ss))
            # left siblings: b . suffix_{k-1}(v)
            suf = (v << 2) & mask
            suf >>= 2  # == v & (mask >> 2), bottom 2(k-1) bits
            lmax = 0
            for b in range(4):
                lmax = max(lmax, _alive_count(alive, (b << hi_shift) | suf, k, ss))
            ratio = np.float32(config.sibling_ratio)
            if np.float32(c) < ratio * np.float32(rmax) or np.float32(
                c
            ) < ratio * np.float32(lmax):
                pruned.append(v)
        if not pruned:
            break
        for v in pruned:
            del alive[v]
    return alive


def clip_tips(alive: dict[int, int], config: AssemblyConfig) -> dict[int, int]:
    """Iterated condensed-graph tip clipping per the spec (step 3)."""
    from shannon_tpu.oracle.counting import canon_kmer
    from shannon_tpu.oracle.graph import build_contigs

    tip_klen = config.tip_klen_effective
    if tip_klen < 0:
        return alive
    err_klen = config.error_klen_effective
    err_ratio = np.float32(config.error_branch_ratio)

    def dom_ratio(n_kmers: int) -> np.float32:
        # k-mer-scale branches (one substitution error's footprint) are
        # held to the stricter error_branch_ratio; longer branches (real
        # isoform structure) keep the lax sibling_ratio
        if config.error_branch_ratio > 0.0 and n_kmers <= err_klen:
            return err_ratio
        return np.float32(config.sibling_ratio)

    alive = dict(alive)
    for _ in range(config.correction_rounds):
        g = build_contigs(alive, config)
        doomed: list[int] = []
        for cid, c in enumerate(g.contigs):
            if len(c.kmers) > tip_klen:
                continue
            has_in = len(g.in_edges[cid]) > 0
            has_out = len(g.out_edges[cid]) > 0
            if not has_in and not has_out:
                if len(c.seq) < config.min_transcript_length:
                    doomed.append(cid)
                continue
            if has_in and has_out:
                # bubble rule: parallel branch u -> c -> w dominated by a
                # sibling branch u -> x -> w
                if len(g.in_edges[cid]) == 1 and len(g.out_edges[cid]) == 1:
                    u = g.in_edges[cid][0]
                    w = g.out_edges[cid][0]
                    comp = 0.0
                    for x in g.out_edges[u]:
                        if x != cid and x in g.in_edges[w]:
                            comp = max(comp, g.contigs[x].abundance)
                    if np.float32(c.abundance) < dom_ratio(
                        len(c.kmers)
                    ) * np.float32(comp):
                        doomed.append(cid)
                continue
            # dead on exactly one side: find competitors at the junction
            comp = 0.0
            if not has_in:  # attached on the right
                for d in g.out_edges[cid]:
                    for e in g.in_edges[d]:
                        if e != cid:
                            comp = max(comp, g.contigs[e].abundance)
            else:  # attached on the left
                for d in g.in_edges[cid]:
                    for e in g.out_edges[d]:
                        if e != cid:
                            comp = max(comp, g.contigs[e].abundance)
            # float32 comparison — device compute precision (parity)
            if np.float32(c.abundance) < dom_ratio(
                len(c.kmers)
            ) * np.float32(comp):
                doomed.append(cid)
        if not doomed:
            break
        for cid in doomed:
            for v in g.contigs[cid].kmers:
                key = v if config.strand_specific else canon_kmer(v, config.k)
                alive.pop(key, None)
    return alive
