"""Tip clipping (oracle spec: shannon_tpu/oracle/correction.py step 3)
— remove short dead-end/isolated/bubble contigs dominated at their
attachment junction, then drop their k-mers from the spectrum.

Division of labor (same rationale as ops/partition): the per-k-mer
heavy lifting — condensation into contigs and the final spectrum
compaction — runs on device (sort/probe kernels over millions of
lanes), while the clip-and-re-merge FIXPOINT iteration runs on host at
CONTIG granularity (tens of thousands of nodes).  The previous design
re-ran the full device condensation every round: 8 rounds x ~25s of
k-mer-scale rebuilds = 200s of steady-state execution per 250k-read
assembly (measured), against milliseconds of contig-scale host work
for the identical result.  Equivalence: removing whole contigs and
re-condensing the k-mer graph merges exactly the contig chains the
removal exposes, and the merged contig's abundance equals
float32(sum of member count_sums) / float32(sum of klens) — the
oracle's formula over member k-mers, computed bit-identically from the
exact integer count sums the device emits (ContigArrays.count_sum).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shannon_tpu.ops.condense import ContigArrays, build_contig_arrays
from shannon_tpu.ops.correction import _compact
from shannon_tpu.ops.count import Spectrum
from shannon_tpu.ops.kmers import SENTINEL
from shannon_tpu.ops.spectrum import lookup_hilo


def _adjacency_lists(out_e: np.ndarray, n: int) -> list[list[int]]:
    """[4, n] edge array -> per-contig sorted unique successor lists,
    as one vectorized unique + split (the per-contig Python set loop
    was 1.65s of host time at 315k contigs, measured)."""
    mask = out_e >= 0
    src = np.broadcast_to(np.arange(n, dtype=np.int64), out_e.shape)[mask]
    dst = out_e[mask].astype(np.int64)
    if len(src) == 0:
        return [[] for _ in range(n)]
    pairs = np.unique(src * n + dst)
    psrc, pdst = pairs // n, pairs % n
    counts = np.bincount(psrc, minlength=n)
    return [
        seg.tolist()
        for seg in np.split(pdst, np.cumsum(counts)[:-1])
    ]


def _host_clip_rounds(
    klen: np.ndarray,
    csum: np.ndarray,
    out_adj: list[list[int]],
    config,
) -> np.ndarray:
    """Iterated contig-level tip clipping: returns a bool mask over the
    ORIGINAL contigs (True = remove its k-mers).  Mirrors oracle
    clip_tips exactly: per round, doom short isolated / dominated
    dead-end / popped-bubble contigs (float32 comparisons), then merge
    the chains the removals expose (klen and count sums add), repeat to
    fixpoint or correction_rounds."""
    tip_klen = config.tip_klen_effective
    ratio = np.float32(config.sibling_ratio)
    err_klen = config.error_klen_effective
    err_ratio = np.float32(config.error_branch_ratio)
    min_len = config.min_transcript_length
    n = len(klen)
    members: dict[int, list[int]] = {i: [i] for i in range(n)}
    kl = {i: int(klen[i]) for i in range(n)}
    cs = {i: int(csum[i]) for i in range(n)}
    out: dict[int, list[int]] = {i: list(out_adj[i]) for i in range(n)}
    inc: dict[int, list[int]] = {i: [] for i in range(n)}
    for u, tgts in out.items():
        for v in tgts:
            inc[v].append(u)
    doomed_mask = np.zeros(n, bool)

    # precomputed decision arrays (updated on merge): the per-call
    # np.float32 constructions were the hottest line of the scan at 1M+
    # contigs (measured 2.5s/1.3M calls)
    abv = np.float32(csum) / np.float32(klen)  # float32 abundance
    if err_ratio > 0.0:
        rv = np.where(klen <= err_klen, err_ratio, ratio).astype(np.float32)
    else:
        rv = np.full(n, ratio, np.float32)
    k1 = config.k - 1

    def _doom_check(c: int) -> bool:
        """Jacobi doom decision for contig c (pure — reads current
        state, mutates nothing); semantics identical to oracle
        clip_tips round logic."""
        if kl[c] > tip_klen:
            return False
        inc_c, out_c = inc[c], out[c]
        has_in = len(inc_c) > 0
        has_out = len(out_c) > 0
        if not has_in and not has_out:
            return kl[c] + k1 < min_len
        comp = np.float32(0.0)
        if has_in and has_out:
            if len(inc_c) == 1 and len(out_c) == 1:
                u, w = inc_c[0], out_c[0]
                inc_w = inc[w]
                for x in out[u]:
                    if x != c and x in inc_w and abv[x] > comp:
                        comp = abv[x]
                return abv[c] < rv[c] * comp
            return False
        if not has_in:  # attached on the right
            for d in out_c:
                for e in inc[d]:
                    if e != c and abv[e] > comp:
                        comp = abv[e]
        else:  # attached on the left
            for d in inc_c:
                for e in out[d]:
                    if e != c and abv[e] > comp:
                        comp = abv[e]
        return abv[c] < rv[c] * comp

    # Incremental fixpoint: round 1 scans every contig; later rounds
    # scan only contigs within 2 undirected hops of a change (a doom
    # decision reads own attrs, neighbor adjacency, and 2-hop sibling
    # abundances — nothing further).  Merge scans likewise start only
    # where a removal dropped a degree.  Decision code is byte-for-byte
    # the full-scan logic, so the mask is identical (doom rounds are
    # jacobi; removals commute; chain merges are confluent — summed
    # attrs and final topology do not depend on merge order).  The
    # full-rescan version measured 37.5s at 3M contigs.
    changed: set[int] = set()
    for rnd in range(config.correction_rounds):
        if rnd == 0:
            cand = out
        else:
            cand_set: set[int] = set()
            for x in changed:
                if x not in out:
                    continue
                cand_set.add(x)
                for y in (*out[x], *inc[x]):
                    cand_set.add(y)
                    cand_set.update(out[y])
                    cand_set.update(inc[y])
            cand = [c for c in cand_set if c in out]
        changed = set()
        doomed = [c for c in cand if _doom_check(c)]
        if not doomed:
            break
        merge_seeds: set[int] = set()
        for c in doomed:
            doomed_mask[members[c]] = True
            for u in inc[c]:
                if u != c:
                    out[u] = [x for x in out[u] if x != c]
                    changed.add(u)
                    merge_seeds.add(u)
            for w in out[c]:
                if w != c:
                    inc[w] = [x for x in inc[w] if x != c]
                    changed.add(w)
                    merge_seeds.add(w)
                    merge_seeds.update(inc[w])
            del out[c], inc[c], kl[c], cs[c], members[c]
        # merge exposed chains: u -> v with outdeg(u)==1, indeg(v)==1,
        # u != v (repeat at u until it stops absorbing; cycles merge
        # down to a self-loop, matching the oracle's single-contig
        # cycle with self-edge).  A single seeded pass with retry-at-u
        # reaches the same fixpoint as the original repeat-until-stable
        # full scan: merging never changes any other node's degrees, so
        # the mergeable-edge set only ever shrinks, and new
        # opportunities arise only where a removal dropped a degree
        # (merge_seeds) or at the absorber itself.  Round 1 seeds every
        # node to also catch any mergeable edge present in the input.
        if rnd == 0:
            merge_seeds.update(out)
        for u in sorted(merge_seeds):
            while u in out and len(out[u]) == 1:
                v = out[u][0]
                if v == u or v not in inc or len(inc[v]) != 1:
                    break
                kl[u] += kl[v]
                cs[u] += cs[v]
                members[u].extend(members[v])
                out[u] = [x if x != v else u for x in out[v]]
                for w in out[u]:
                    inc[w] = [x if x != v else u for x in inc[w]]
                del out[v], inc[v], kl[v], cs[v], members[v]
                abv[u] = np.float32(cs[u]) / np.float32(kl[u])
                rv[u] = (
                    err_ratio
                    if err_ratio > 0.0 and kl[u] <= err_klen
                    else ratio
                )
                changed.add(u)
    return doomed_mask


@jax.jit
def _drop_contigs(
    spec: Spectrum, ca: ContigArrays, doomed_c: jnp.ndarray
) -> Spectrum:
    """Remove the k-mers of doomed contigs from the spectrum (one
    device program: entry -> contig lookup + compaction sort)."""
    C2 = ca.node_hi.shape[0]
    idx, hit = lookup_hilo(ca.node_hi, ca.node_lo, spec.hi, spec.lo)
    cid_of_entry = jnp.where(hit, ca.node_cid[idx], -1)
    entry_doomed = (cid_of_entry >= 0) & doomed_c[
        jnp.clip(cid_of_entry, 0, C2 - 1)
    ]
    pad = (spec.hi == SENTINEL) & (spec.lo == SENTINEL)
    return _compact(spec, ~entry_doomed & ~pad)


def clip_tips_spectrum(
    spec: Spectrum, config, canonical: bool = True, notes: dict | None = None
) -> Spectrum:
    """Iterated tip clipping to fixpoint, matching oracle clip_tips:
    one device condensation + host contig-level rounds + one device
    compaction.  `notes`, if given, receives the substage wall times
    (condense/fetch/rounds/drop) for the pipeline's StageTimer."""
    import time as _time

    tip_klen = config.tip_klen_effective
    if tip_klen < 0:
        return spec
    t0 = _time.perf_counter()
    ca = build_contig_arrays(spec, config.k, canonical)
    n = int(ca.n_contigs)
    t1 = _time.perf_counter()
    if n == 0:
        return spec
    klen = np.asarray(ca.klen[:n])
    csum = np.asarray(ca.count_sum[:n])
    out_adj = _adjacency_lists(np.asarray(ca.out_edges[:, :n]), n)
    t2 = _time.perf_counter()
    doomed = _host_clip_rounds(klen, csum, out_adj, config)
    t3 = _time.perf_counter()
    if notes is not None:
        notes.update(
            tc_condense_s=round(t1 - t0, 2),
            tc_fetch_s=round(t2 - t1, 2),
            tc_rounds_s=round(t3 - t2, 2),
            tc_contigs=n,
        )
    if not doomed.any():
        return spec
    doomed_pad = np.zeros(ca.node_hi.shape[0], bool)
    doomed_pad[:n] = doomed
    out = _drop_contigs(spec, ca, jnp.asarray(doomed_pad))
    if notes is not None:
        notes["tc_drop_s"] = round(_time.perf_counter() - t3, 2)
    return out
