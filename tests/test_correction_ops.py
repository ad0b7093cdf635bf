"""Device correction parity vs oracle correct_kmers (SURVEY.md §5.1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from shannon_tpu.config import AssemblyConfig
from shannon_tpu.io.pack import pack_reads
from shannon_tpu.ops.correction import abundance_filter, correct_spectrum
from shannon_tpu.ops.count import count_spectrum
from shannon_tpu.ops.spectrum import lookup_counts, neighbor_counts
from shannon_tpu.ops.kmers import hilo_to_int
from shannon_tpu.oracle.correction import correct_kmers
from shannon_tpu.oracle.counting import canon_kmer, count_kmers, str_to_kmer
from shannon_tpu.sim import random_seq, sample_reads, simulate_transcripts


def _spec_of(reads, k, cap=1 << 13, canonical=True):
    b = pack_reads(reads, pad_length=max(len(s) for s in reads))
    return count_spectrum(
        jnp.asarray(b.codes), jnp.asarray(b.lengths), k, cap, canonical
    )


def test_lookup_counts(rng):
    reads = [random_seq(rng, 60) for _ in range(20)]
    k = 15
    spec = _spec_of(reads, k)
    oracle = count_kmers(reads, k)
    keys = sorted(oracle)
    qhi = jnp.array([kk >> 32 for kk in keys], dtype=jnp.uint32)
    qlo = jnp.array([kk & 0xFFFFFFFF for kk in keys], dtype=jnp.uint32)
    got = lookup_counts(spec, qhi, qlo)
    assert got.tolist() == [oracle[kk] for kk in keys]
    # absent keys -> 0
    miss = lookup_counts(
        spec,
        jnp.array([0, 123456], dtype=jnp.uint32),
        jnp.array([9999, 42], dtype=jnp.uint32),
    )
    absent = [(0 << 32) | 9999, (123456 << 32) | 42]
    expect = [oracle.get(a, 0) for a in absent]
    assert miss.tolist() == expect


@pytest.mark.parametrize("k", [13, 17, 24])
def test_neighbor_counts_match_oracle(rng, k):
    ts = simulate_transcripts(rng, n=2, length=200)
    reads = sample_reads(rng, ts, coverage=10, read_length=60, error_rate=0.02)
    spec = _spec_of(reads, k)
    oracle = count_kmers(reads, k)
    r_ext, l_ext, r_sib, l_sib = neighbor_counts(spec, k)
    n = int(spec.n)
    keys = hilo_to_int(spec.hi[:n], spec.lo[:n])
    mask = (1 << (2 * k)) - 1
    hs = 2 * (k - 1)
    for i in rng.choice(n, size=min(50, n), replace=False):
        v = int(keys[i])
        for b in range(4):
            r = canon_kmer(((v << 2) | b) & mask, k)
            assert int(r_ext[b, i]) == oracle.get(r, 0), (i, b, "rext")
            l = canon_kmer((v >> 2) | (b << hs), k)
            assert int(l_ext[b, i]) == oracle.get(l, 0), (i, b, "lext")
        rs = max(oracle.get(canon_kmer((v & ~3) | b, k), 0) for b in range(4))
        ls = max(
            oracle.get(canon_kmer((b << hs) | (v & (mask >> 2)), k), 0)
            for b in range(4)
        )
        assert int(r_sib[i]) == rs
        assert int(l_sib[i]) == ls


def test_abundance_filter_parity(rng):
    reads = [random_seq(rng, 50) for _ in range(40)] * 2
    k = 13
    spec = abundance_filter(_spec_of(reads, k), 2)
    oracle = {v: c for v, c in count_kmers(reads, k).items() if c >= 2}
    assert spec.to_dict() == oracle


@pytest.mark.parametrize("k", [15, 24])
@pytest.mark.parametrize("canonical", [True, False])
def test_correct_spectrum_parity(rng, k, canonical):
    ts = simulate_transcripts(rng, n=3, length=250)
    reads = sample_reads(
        rng, ts, coverage=25, read_length=70, error_rate=0.01,
        both_strands=canonical,
    )
    cfg = AssemblyConfig(
        k=k, sibling_ratio=0.1, min_abundance=1, strand_specific=not canonical
    )
    spec = _spec_of(reads, k, canonical=canonical)
    got = correct_spectrum(
        spec, k, cfg.min_abundance, cfg.sibling_ratio, cfg.correction_rounds,
        canonical,
    )
    oracle = correct_kmers(
        count_kmers(reads, k, strand_specific=not canonical), cfg
    )
    assert got.to_dict() == oracle
