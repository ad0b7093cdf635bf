"""Device k-mer counting: sort + segment-reduce into a fixed-capacity
sorted spectrum (the Jellyfish replacement — SURVEY.md §3.2 row 1,
§8 M1).

Pipeline per batch:  extract (hi, lo) windows  ->  lexicographic two-key
sort (XLA variadic sort; a Pallas radix sort drops in behind the same
interface — ops/pallas/)  ->  run-start flags  ->  scatter-add counts
->  compact unique k-mers to the front.  Everything is fixed-shape; the
number of distinct k-mers is carried as a scalar (`n`), padding lanes
hold the all-ones SENTINEL so the table stays sorted and binary-search
ready.

Oracle parity: spectrum == shannon_tpu.oracle.counting.spectrum_arrays
of count_kmers (tested in tests/test_ops.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shannon_tpu.ops.kmers import SENTINEL, extract_kmers


@jax.tree_util.register_pytree_node_class
@dataclass
class Spectrum:
    """Sorted unique-k-mer table: (hi, lo, count) arrays of static
    capacity, SENTINEL-padded past `n` entries."""

    hi: jnp.ndarray  # [C] uint32
    lo: jnp.ndarray  # [C] uint32
    count: jnp.ndarray  # [C] int32 (0 on padding)
    n: jnp.ndarray  # [] int32 — number of real entries

    @property
    def capacity(self) -> int:
        return int(self.hi.shape[0])

    def tree_flatten(self):
        return (self.hi, self.lo, self.count, self.n), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # ---- host-side conveniences (parity tests, graph handoff) --------
    def to_dict(self) -> dict[int, int]:
        n = int(self.n)
        hi = np.asarray(self.hi[:n], dtype=np.uint64)
        lo = np.asarray(self.lo[:n], dtype=np.uint64)
        cnt = np.asarray(self.count[:n])
        keys = (hi << np.uint64(32)) | lo
        return {int(k): int(c) for k, c in zip(keys, cnt)}

    def overflowed(self) -> bool:
        """True if the capacity was too small (last lane not padding)."""
        return bool(self.hi[-1] != SENTINEL)


def _sort3(hi, lo, cnt):
    return jax.lax.sort((hi, lo, cnt), num_keys=2)


def _unique_reduce(hi: jnp.ndarray, lo: jnp.ndarray, cnt: jnp.ndarray, capacity: int) -> Spectrum:
    """From lexicographically sorted (hi, lo) with per-lane counts
    (SENTINEL lanes last), build the compacted unique spectrum."""
    m = hi.shape[0]
    real = ~((hi == SENTINEL) & (lo == SENTINEL))
    prev_differs = jnp.ones(m, dtype=bool).at[1:].set(
        (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    )
    is_start = real & prev_differs
    run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # [m], -1 before first
    n_unique = jnp.where(real.any(), run_id[-1] + 1, 0)
    tgt = jnp.where(real, run_id, capacity)  # dump padding past the end
    out_cnt = jnp.zeros(capacity + 1, dtype=jnp.int32).at[tgt].add(cnt)
    out_hi = jnp.full(capacity + 1, SENTINEL, dtype=jnp.uint32)
    out_lo = jnp.full(capacity + 1, SENTINEL, dtype=jnp.uint32)
    start_tgt = jnp.where(is_start, run_id, capacity)
    out_hi = out_hi.at[start_tgt].set(hi, mode="drop")
    out_lo = out_lo.at[start_tgt].set(lo, mode="drop")
    cnt_final = jnp.where(out_hi[:capacity] == SENTINEL, 0, out_cnt[:capacity])
    return Spectrum(
        hi=out_hi[:capacity],
        lo=out_lo[:capacity],
        count=cnt_final,
        n=n_unique.astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("k", "capacity", "canonical"))
def count_spectrum(
    codes: jnp.ndarray,
    lengths: jnp.ndarray,
    k: int,
    capacity: int,
    canonical: bool = True,
) -> Spectrum:
    """Count all k-mers of a read batch into a sorted Spectrum."""
    hi, lo, valid = extract_kmers(codes, lengths, k, canonical)
    hi, lo = hi.reshape(-1), lo.reshape(-1)
    # two-operand sort only: per-lane counts are implied (1 for real
    # lanes, 0 for SENTINEL pads) — a third sort operand would add 33%
    # to the sort's data movement for nothing
    hi, lo = jax.lax.sort((hi, lo), num_keys=2)
    real = ~((hi == SENTINEL) & (lo == SENTINEL))
    return _unique_reduce(hi, lo, real.astype(jnp.int32), capacity)


@jax.jit
def merge_spectra(a: Spectrum, b: Spectrum) -> Spectrum:
    """Merge two sorted spectra (same capacity) into one: concat -> sort
    -> re-reduce.  Used batch-to-batch on one chip and shard-to-shard
    after the hash all-to-all (SURVEY.md §3.4)."""
    hi = jnp.concatenate([a.hi, b.hi])
    lo = jnp.concatenate([a.lo, b.lo])
    cnt = jnp.concatenate([a.count, b.count])
    hi, lo, cnt = _sort3(hi, lo, cnt)
    return _unique_reduce(hi, lo, cnt, a.capacity)


def spectrum_from_arrays(
    kmers: np.ndarray, counts: np.ndarray, capacity: int | None = None
) -> Spectrum:
    """Rebuild a device Spectrum from sorted uint64 key / count arrays
    (the stage-checkpoint format in pipeline.py)."""
    n = len(kmers)
    if capacity is None:
        capacity = 1 << max(int(n).bit_length(), 4)
    if capacity < n:
        raise ValueError(f"capacity {capacity} < {n} entries")
    hi = np.full(capacity, 0xFFFFFFFF, dtype=np.uint32)
    lo = np.full(capacity, 0xFFFFFFFF, dtype=np.uint32)
    cnt = np.zeros(capacity, dtype=np.int32)
    kk = np.asarray(kmers, dtype=np.uint64)
    hi[:n] = (kk >> np.uint64(32)).astype(np.uint32)
    lo[:n] = (kk & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    cnt[:n] = np.asarray(counts, dtype=np.int32)
    return Spectrum(
        hi=jnp.asarray(hi), lo=jnp.asarray(lo), count=jnp.asarray(cnt),
        n=jnp.int32(n),
    )


def count_reads_spectrum(
    batch_codes: np.ndarray,
    batch_lengths: np.ndarray,
    k: int,
    capacity: int,
    canonical: bool = True,
    batch_reads: int = 1 << 16,
) -> Spectrum:
    """Host driver: stream read batches through count_spectrum, merging
    into one spectrum (single-chip path; the sharded path lives in
    shannon_tpu/parallel)."""
    n = batch_codes.shape[0]
    total: Spectrum | None = None
    for s in range(0, n, batch_reads):
        e = min(s + batch_reads, n)
        codes = batch_codes[s:e]
        lengths = batch_lengths[s:e]
        if e - s != batch_reads:
            # pad every partial batch up to a power-of-two row count so
            # XLA programs are shape-canonical (compile-cache hits across
            # datasets; padded rows yield no valid windows)
            rows = 1 << max(e - s - 1, 1).bit_length()
            rows = min(max(rows, 16), batch_reads)
            if rows > e - s:
                pad = rows - (e - s)
                codes = np.pad(codes, ((0, pad), (0, 0)), constant_values=4)
                lengths = np.pad(lengths, (0, pad))
        part = count_spectrum(
            jnp.asarray(codes), jnp.asarray(lengths), k, capacity, canonical
        )
        total = part if total is None else merge_spectra(total, part)
    if total is None:
        total = Spectrum(
            hi=jnp.full(capacity, SENTINEL, jnp.uint32),
            lo=jnp.full(capacity, SENTINEL, jnp.uint32),
            count=jnp.zeros(capacity, jnp.int32),
            n=jnp.int32(0),
        )
    return total
