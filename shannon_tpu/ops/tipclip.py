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

    def ab(c: int) -> np.float32:
        return np.float32(cs[c]) / np.float32(kl[c])

    def dom_ratio(c: int) -> np.float32:
        # mirrors oracle clip_tips dom_ratio: single-error-footprint
        # branches are held to the stricter error_branch_ratio
        if err_ratio > 0.0 and kl[c] <= err_klen:
            return err_ratio
        return ratio

    for _ in range(config.correction_rounds):
        doomed: list[int] = []
        for c in out:
            if kl[c] > tip_klen:
                continue
            has_in = len(inc[c]) > 0
            has_out = len(out[c]) > 0
            if not has_in and not has_out:
                if kl[c] + config.k - 1 < min_len:
                    doomed.append(c)
                continue
            if has_in and has_out:
                if len(inc[c]) == 1 and len(out[c]) == 1:
                    u, w = inc[c][0], out[c][0]
                    comp = np.float32(0.0)
                    for x in out[u]:
                        if x != c and x in inc[w]:
                            comp = max(comp, ab(x))
                    if ab(c) < dom_ratio(c) * comp:
                        doomed.append(c)
                continue
            comp = np.float32(0.0)
            if not has_in:  # attached on the right
                for d in out[c]:
                    for e in inc[d]:
                        if e != c:
                            comp = max(comp, ab(e))
            else:  # attached on the left
                for d in inc[c]:
                    for e in out[d]:
                        if e != c:
                            comp = max(comp, ab(e))
            if ab(c) < dom_ratio(c) * comp:
                doomed.append(c)
        if not doomed:
            break
        for c in doomed:
            doomed_mask[members[c]] = True
            for u in inc[c]:
                if u != c:
                    out[u] = [x for x in out[u] if x != c]
            for w in out[c]:
                if w != c:
                    inc[w] = [x for x in inc[w] if x != c]
            del out[c], inc[c], kl[c], cs[c], members[c]
        # merge exposed chains: u -> v with outdeg(u)==1, indeg(v)==1,
        # u != v (repeat until none; cycles merge down to a self-loop,
        # matching the oracle's single-contig cycle with self-edge)
        merged = True
        while merged:
            merged = False
            for u in list(out):
                if u not in out or len(out[u]) != 1:
                    continue
                v = out[u][0]
                if v == u or len(inc[v]) != 1:
                    continue
                # merge v into u
                kl[u] += kl[v]
                cs[u] += cs[v]
                members[u].extend(members[v])
                out[u] = [x if x != v else u for x in out[v]]
                # rewire v's successors' in-lists
                for w in out[u]:
                    inc[w] = [x if x != v else u for x in inc[w]]
                del out[v], inc[v], kl[v], cs[v], members[v]
                merged = True
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
    spec: Spectrum, config, canonical: bool = True
) -> Spectrum:
    """Iterated tip clipping to fixpoint, matching oracle clip_tips:
    one device condensation + host contig-level rounds + one device
    compaction."""
    tip_klen = config.tip_klen_effective
    if tip_klen < 0:
        return spec
    ca = build_contig_arrays(spec, config.k, canonical)
    n = int(ca.n_contigs)
    if n == 0:
        return spec
    klen = np.asarray(ca.klen[:n])
    csum = np.asarray(ca.count_sum[:n])
    out_adj = _adjacency_lists(np.asarray(ca.out_edges[:, :n]), n)
    doomed = _host_clip_rounds(klen, csum, out_adj, config)
    if not doomed.any():
        return spec
    doomed_pad = np.zeros(ca.node_hi.shape[0], bool)
    doomed_pad[:n] = doomed
    return _drop_contigs(spec, ca, jnp.asarray(doomed_pad))
