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


@partial(jax.jit, static_argnames=("max_count",))
def count_histogram(spec: Spectrum, max_count: int = 64) -> jnp.ndarray:
    """[max_count + 1] int32 histogram of entry counts: h[c] = # real
    entries with count == c (counts > max_count clamp into the top bin;
    h[0] is forced to 0 — pads don't count).  Feeds the auto
    min_abundance chooser (oracle.correction.choose_min_abundance).

    Sort + binary-search boundaries, NOT a scatter-add: a scatter of
    ~12M colliding updates into 1k bins is the degenerate-contention
    case of the hardware's slowest primitive (docs/DESIGN.md), while
    one single-key sort is ~15ms at this scale and the 1k boundary
    searches are trivial."""
    pad = (spec.hi == SENTINEL) & (spec.lo == SENTINEL)
    c = jnp.where(pad, 0, jnp.clip(spec.count, 0, max_count))
    (c_sorted,) = jax.lax.sort((c,), num_keys=1)
    bounds = jnp.searchsorted(
        c_sorted, jnp.arange(max_count + 2, dtype=jnp.int32)
    ).astype(jnp.int32)
    h = bounds[1:] - bounds[:-1]
    return h.at[0].set(0)


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
    static_argnames=(
        "k", "min_abundance", "max_rounds", "canonical", "error_rate",
    ),
)
def _correct_fused(
    spec: Spectrum,
    k: int,
    min_abundance: int,
    sibling_ratio: jnp.ndarray,
    max_rounds: int,
    canonical: bool,
    error_rate: float = 0.0,
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
    rescue = min_abundance > 1  # static: the 8-probe program is
    # unchanged when no filter is engaged (shallow/clean data)
    sib_h, sib_l = [], []
    ext_h, ext_l = [], []
    for b in range(4):
        bb = jnp.uint32(b)
        # right sibling: prefix·b
        sib_h.append(hi)
        sib_l.append((lo & ~jnp.uint32(3)) | bb)
        # left sibling: b·suffix
        sh = hi & (hi_mask >> 2) if 2 * k > 32 else hi
        sl = lo if 2 * k > 32 else lo & (lo_mask >> 2)
        if hs >= 32:
            lsh = sh | (bb << (hs - 32))
            lsl = sl
        else:
            lsh = sh
            lsl = sl | (bb << hs)
        sib_h.append(lsh)
        sib_l.append(lsl)
        if rescue:
            # right extension: ((v << 2) | b) masked
            ext_h.append(((hi << 2) | (lo >> 30)) & hi_mask)
            ext_l.append(((lo << 2) | bb) & lo_mask)
            # left extension: (v >> 2) | (b << 2(k-1))
            lh = hi >> 2
            ll = (lo >> 2) | (hi << 30)
            if hs >= 32:
                lh = lh | (bb << (hs - 32))
            else:
                ll = (ll & jnp.uint32((1 << hs) - 1)) | (bb << hs)
            ext_h.append(lh)
            ext_l.append(ll)

    def _resolve(phs, pls):
        # one join per 8-probe set — NOT one 16-probe join: the join
        # sort's transient HBM scales with (table + query) lanes, and a
        # single 16C-query join at the raw 1M-read table (~200M lanes)
        # crashed the TPU worker; two sequential 8C joins keep the peak
        # at the r4-proven size
        ph = jnp.stack(phs, axis=0)
        pl = jnp.stack(pls, axis=0)
        if canonical:
            ph, pl = canonical_hilo(ph, pl, k)
        i_, h_ = lookup_hilo(hi, lo, ph.reshape(-1), pl.reshape(-1))
        return (
            jnp.clip(i_.reshape(8, C), 0, C - 1),
            h_.reshape(8, C),
        )

    sidx, shit = _resolve(sib_h, sib_l)  # [8, C]: (rsib, lsib) x 4
    if rescue:
        # hard scheduling dependency: the two joins are data-independent
        # and XLA overlaps them, which doubles the transient-HBM peak
        # right back to the crashing 16-probe level — barrier the
        # extension probes on the sibling join's output so the joins
        # run strictly one after the other
        (ext_h, ext_l), _ = jax.lax.optimization_barrier(
            ((ext_h, ext_l), shit)
        )
        eidx, ehit = _resolve(ext_h, ext_l)  # [8, C]: (rext, lext) x 4

    pad = (hi == SENTINEL) & (lo == SENTINEL)
    raw = jnp.where(pad, 0, spec.count)
    counts0 = jnp.where(raw < min_abundance, 0, raw)

    if rescue:
        # dead-end rescue rounds (oracle spec:
        # oracle.correction.dead_end_rescue): a dropped k-mer revives
        # iff it extends an alive k-mer that is otherwise dead on that
        # side — some left-extension alive AND all right-siblings dead
        # (x's right-sibling group IS that parent's right-extension
        # set), or the mirror.  Jacobi rounds, capped at 3k.
        def rcond(st):
            r, _counts, changed = st
            return changed & (r < 3 * k)

        def rbody(st):
            r, counts, _ = st
            pa_s = shit & (counts[sidx] > 0)  # [8, C] alive gathers
            pa_e = ehit & (counts[eidx] > 0)
            rsib_dead = ~jnp.any(pa_s[0::2], axis=0)
            lsib_dead = ~jnp.any(pa_s[1::2], axis=0)
            rext_any = jnp.any(pa_e[0::2], axis=0)
            lext_any = jnp.any(pa_e[1::2], axis=0)
            resc = (
                (raw > 0)
                & (counts == 0)
                & ((lext_any & rsib_dead) | (rext_any & lsib_dead))
            )
            return r + 1, jnp.where(resc, raw, counts), resc.any()

        _, counts0, _ = jax.lax.while_loop(
            rcond, rbody, (jnp.int32(0), counts0, jnp.bool_(True))
        )

    ratio = sibling_ratio.astype(jnp.float32)
    eps3 = jnp.float32(error_rate) / jnp.float32(3.0)
    use_cap = error_rate > 0  # static

    def _cap(F):
        # oracle.correction.error_cap, identical float32 arithmetic
        lam = eps3 * F
        return jnp.maximum(
            jnp.float32(3.0),
            lam + jnp.float32(4.0) * jnp.sqrt(lam) + jnp.float32(1.0),
        )

    def cond(st):
        r, _counts, changed = st
        return changed & (r < max_rounds)

    def body(st):
        r, counts, _ = st
        pc = jnp.where(shit, counts[sidx], 0)  # [8, C] gathers
        rmax = jnp.max(pc[0::2], axis=0).astype(jnp.float32)
        lmax = jnp.max(pc[1::2], axis=0).astype(jnp.float32)
        cf = counts.astype(jnp.float32)
        dr = cf < ratio * rmax
        dl = cf < ratio * lmax
        if use_cap:
            # absolute error-model cap: ratio domination alone must not
            # delete minor isoform branches (error_cap rationale)
            dr = dr & (cf <= _cap(rmax))
            dl = dl & (cf <= _cap(lmax))
        doomed = (counts > 0) & (dr | dl)
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
    error_rate: float = 0.0,
) -> Spectrum:
    """Full correction: abundance filter (+ dead-end rescue when the
    filter is engaged) then pruning rounds to fixpoint, with the
    absolute error-model cap on domination prunes (one fused device
    program — see _correct_fused)."""
    if sibling_ratio <= 0.0:
        return abundance_filter(spec, min_abundance)
    return _correct_fused(
        spec,
        k,
        min_abundance,
        jnp.float32(sibling_ratio),
        correction_rounds,
        canonical,
        error_rate,
    )
