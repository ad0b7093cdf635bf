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


def correct_spectrum(
    spec: Spectrum,
    k: int,
    min_abundance: int,
    sibling_ratio: float,
    correction_rounds: int,
    canonical: bool = True,
) -> Spectrum:
    """Full correction: abundance filter then pruning rounds to fixpoint
    (host loop over jitted rounds; round count is small and data-
    dependent, so this stays off-device — SURVEY.md §8)."""
    spec = abundance_filter(spec, min_abundance)
    if sibling_ratio <= 0.0:
        return spec
    ratio = jnp.float32(sibling_ratio)
    prev_n = int(spec.n)
    for _ in range(correction_rounds):
        spec = sibling_prune_round(spec, k, ratio, canonical)
        n = int(spec.n)
        if n == prev_n:
            break
        prev_n = n
    return spec
