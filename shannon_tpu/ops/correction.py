"""Device error correction: abundance filter + iterated sibling-ratio
branch pruning over the sorted spectrum (reference stage 2's per-k-mer
dict probes — SURVEY.md §4.2 hot loop #2 — as batched binary-search
probes; oracle spec in shannon_tpu/oracle/correction.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from shannon_tpu.ops.count import Spectrum
from shannon_tpu.ops.kmers import SENTINEL
from shannon_tpu.ops.spectrum import sibling_maxes


@jax.jit
def _compact(spec: Spectrum, keep: jnp.ndarray) -> Spectrum:
    """Drop entries where keep is False; table stays sorted (dropped
    lanes become SENTINEL and sort to the back)."""
    hi = jnp.where(keep, spec.hi, SENTINEL)
    lo = jnp.where(keep, spec.lo, SENTINEL)
    cnt = jnp.where(keep, spec.count, 0)
    hi, lo, cnt = jax.lax.sort((hi, lo, cnt), num_keys=2)
    real = ~((hi == SENTINEL) & (lo == SENTINEL))
    return Spectrum(hi=hi, lo=lo, count=cnt, n=real.sum(dtype=jnp.int32))


@partial(jax.jit, static_argnames=("min_abundance",))
def abundance_filter(spec: Spectrum, min_abundance: int) -> Spectrum:
    """Drop k-mers with count < min_abundance (oracle correction step 1)."""
    pad = (spec.hi == SENTINEL) & (spec.lo == SENTINEL)
    return _compact(spec, (spec.count >= min_abundance) & ~pad)


@partial(jax.jit, static_argnames=("k", "canonical"))
def sibling_prune_round(
    spec: Spectrum, k: int, sibling_ratio: jnp.ndarray, canonical: bool = True
) -> Spectrum:
    """One jacobi round of sibling-ratio branch pruning (oracle step 2):
    prune x iff float32(count(x)) < ratio * float32(max sibling count)
    on either side."""
    r_sib_max, l_sib_max = sibling_maxes(spec, k, canonical)
    c = spec.count.astype(jnp.float32)
    ratio = sibling_ratio.astype(jnp.float32)
    doomed = (c < ratio * r_sib_max.astype(jnp.float32)) | (
        c < ratio * l_sib_max.astype(jnp.float32)
    )
    pad = (spec.hi == SENTINEL) & (spec.lo == SENTINEL)
    return _compact(spec, ~doomed & ~pad)


@partial(
    jax.jit,
    static_argnames=("k", "min_abundance", "max_rounds", "canonical"),
)
def _correct_fused(
    spec: Spectrum,
    k: int,
    min_abundance: int,
    sibling_ratio: jnp.ndarray,
    max_rounds: int,
    canonical: bool,
) -> Spectrum:
    """All correction rounds in ONE device program.

    The sibling probe TARGETS never change across rounds (pruning
    removes entries; the old per-round path re-joined the shrinking
    table every round — 8C-query sort-merge joins plus a compaction
    sort plus a host sync PER ROUND, ~15s of the 1M front half).  Here
    the 8 sibling indices are resolved once, pruning zeroes counts in
    place (a zero-count sibling contributes exactly what an absent one
    does to the max, and a zero-count entry can never be doomed again),
    rounds run as pure gathers under an early-exit while_loop, and ONE
    final compaction sort rebuilds the table.  Decision semantics are
    identical to the per-round path (jacobi float32 ratio tests) —
    pinned by the oracle parity suite."""
    from shannon_tpu.ops.spectrum import lookup_hilo
    from shannon_tpu.ops.kmers import canonical_hilo

    hi, lo = spec.hi, spec.lo
    C = spec.capacity
    hi_mask = jnp.uint32((1 << (2 * k - 32)) - 1 if 2 * k > 32 else 0)
    lo_mask = jnp.uint32(0xFFFFFFFF if 2 * k >= 32 else (1 << (2 * k)) - 1)
    hs = 2 * (k - 1)
    probes_h, probes_l = [], []
    for b in range(4):
        bb = jnp.uint32(b)
        # right sibling: prefix·b
        probes_h.append(hi)
        probes_l.append((lo & ~jnp.uint32(3)) | bb)
        # left sibling: b·suffix
        sh = hi & (hi_mask >> 2) if 2 * k > 32 else hi
        sl = lo if 2 * k > 32 else lo & (lo_mask >> 2)
        if hs >= 32:
            lsh = sh | (bb << (hs - 32))
            lsl = sl
        else:
            lsh = sh
            lsl = sl | (bb << hs)
        probes_h.append(lsh)
        probes_l.append(lsl)
    ph = jnp.stack(probes_h, axis=0)  # [8, C]: (rsib, lsib) x 4
    pl = jnp.stack(probes_l, axis=0)
    if canonical:
        ph, pl = canonical_hilo(ph, pl, k)
    idx, hit = lookup_hilo(hi, lo, ph.reshape(-1), pl.reshape(-1))
    idx = jnp.clip(idx.reshape(8, C), 0, C - 1)
    hit = hit.reshape(8, C)

    pad = (hi == SENTINEL) & (lo == SENTINEL)
    counts0 = jnp.where(
        pad | (spec.count < min_abundance), 0, spec.count
    )
    ratio = sibling_ratio.astype(jnp.float32)

    def cond(st):
        r, _counts, changed = st
        return changed & (r < max_rounds)

    def body(st):
        r, counts, _ = st
        pc = jnp.where(hit, counts[idx], 0)  # [8, C] gathers
        rmax = jnp.max(pc[0::2], axis=0).astype(jnp.float32)
        lmax = jnp.max(pc[1::2], axis=0).astype(jnp.float32)
        cf = counts.astype(jnp.float32)
        doomed = (counts > 0) & ((cf < ratio * rmax) | (cf < ratio * lmax))
        return r + 1, jnp.where(doomed, 0, counts), doomed.any()

    _, counts, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), counts0, jnp.bool_(True))
    )
    return _compact(spec, counts > 0)


def correct_spectrum(
    spec: Spectrum,
    k: int,
    min_abundance: int,
    sibling_ratio: float,
    correction_rounds: int,
    canonical: bool = True,
) -> Spectrum:
    """Full correction: abundance filter then pruning rounds to fixpoint
    (one fused device program — see _correct_fused)."""
    if sibling_ratio <= 0.0:
        return abundance_filter(spec, min_abundance)
    return _correct_fused(
        spec,
        k,
        min_abundance,
        jnp.float32(sibling_ratio),
        correction_rounds,
        canonical,
    )
