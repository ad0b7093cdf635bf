"""Device-op parity tests vs the oracle (SURVEY.md §5.1: k-mer spectrum
equality is the first golden parity gate)."""

import numpy as np
import pytest

import jax.numpy as jnp

from shannon_tpu.config import AssemblyConfig
from shannon_tpu.io.pack import pack_reads
from shannon_tpu.ops.count import count_reads_spectrum, count_spectrum, merge_spectra
from shannon_tpu.ops.kmers import extract_kmers, hilo_to_int, revcomp_hilo
from shannon_tpu.oracle.counting import (
    count_kmers,
    revcomp_kmer,
    spectrum_arrays,
    str_to_kmer,
)
from shannon_tpu.sim import random_seq, sample_reads, simulate_transcripts


def _split_hilo(v: int) -> tuple[int, int]:
    return (v >> 32) & 0xFFFFFFFF, v & 0xFFFFFFFF


@pytest.mark.parametrize("k", [5, 15, 16, 17, 24, 31])
def test_revcomp_hilo_matches_oracle(rng, k):
    vals = [int(x) for x in rng.integers(0, 1 << min(2 * k, 63), size=64)]
    vals = [v & ((1 << (2 * k)) - 1) for v in vals]
    hi = jnp.array([_split_hilo(v)[0] for v in vals], dtype=jnp.uint32)
    lo = jnp.array([_split_hilo(v)[1] for v in vals], dtype=jnp.uint32)
    rhi, rlo = revcomp_hilo(hi, lo, k)
    got = hilo_to_int(rhi, rlo)
    expect = np.array([revcomp_kmer(v, k) for v in vals], dtype=np.uint64)
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("k", [11, 16, 24, 31])
@pytest.mark.parametrize("canonical", [True, False])
def test_extract_kmers_matches_oracle(rng, k, canonical):
    seqs = [random_seq(rng, int(n)) for n in rng.integers(k, 90, size=40)]
    seqs[0] = seqs[0][:10] + "N" + seqs[0][11:]  # invalid base
    seqs.append("A" * (k - 1))  # too short: no windows
    b = pack_reads(seqs, pad_length=96)
    hi, lo, valid = extract_kmers(
        jnp.asarray(b.codes), jnp.asarray(b.lengths), k, canonical
    )
    got = sorted(hilo_to_int(hi, lo)[np.asarray(valid)].tolist())
    # oracle per-window list (with multiplicity):
    from shannon_tpu.oracle.counting import _seq_kmers, _seq_kmers_canonical
    from shannon_tpu.io.dna import encode_seq

    exp = []
    for s in seqs:
        f = _seq_kmers_canonical(encode_seq(s), k) if canonical else _seq_kmers(
            encode_seq(s), k
        )
        exp.extend(int(x) for x in f)
    assert got == sorted(exp)


@pytest.mark.parametrize("k", [13, 24])
def test_count_spectrum_matches_oracle(rng, k):
    ts = simulate_transcripts(rng, n=3, length=300)
    reads = sample_reads(rng, ts, coverage=15, read_length=64, error_rate=0.01)
    b = pack_reads(reads, pad_length=64)
    spec = count_spectrum(
        jnp.asarray(b.codes), jnp.asarray(b.lengths), k, capacity=1 << 13
    )
    assert not spec.overflowed()
    oracle_counts = count_kmers(reads, k)
    assert spec.to_dict() == oracle_counts
    # sortedness + padding invariants
    n = int(spec.n)
    kk, cc = spectrum_arrays(oracle_counts)
    np.testing.assert_array_equal(hilo_to_int(spec.hi[:n], spec.lo[:n]), kk)
    np.testing.assert_array_equal(np.asarray(spec.count[:n]), cc)
    assert (np.asarray(spec.count[n:]) == 0).all()


def test_count_spectrum_strand_specific(rng):
    reads = [random_seq(rng, 50) for _ in range(20)]
    b = pack_reads(reads, pad_length=64)
    spec = count_spectrum(
        jnp.asarray(b.codes), jnp.asarray(b.lengths), 15, 1 << 12, canonical=False
    )
    assert spec.to_dict() == count_kmers(reads, 15, strand_specific=True)


def test_merge_spectra_matches_joint_count(rng):
    r1 = [random_seq(rng, 60) for _ in range(30)]
    r2 = [random_seq(rng, 60) for _ in range(30)] + r1[:5]
    k, cap = 17, 1 << 12
    b1, b2 = pack_reads(r1, 64), pack_reads(r2, 64)
    s1 = count_spectrum(jnp.asarray(b1.codes), jnp.asarray(b1.lengths), k, cap)
    s2 = count_spectrum(jnp.asarray(b2.codes), jnp.asarray(b2.lengths), k, cap)
    merged = merge_spectra(s1, s2)
    assert merged.to_dict() == count_kmers(r1 + r2, k)


def test_count_reads_spectrum_batched(rng):
    reads = [random_seq(rng, 70) for _ in range(100)]
    b = pack_reads(reads, pad_length=70)
    spec = count_reads_spectrum(
        b.codes, b.lengths, k=19, capacity=1 << 13, batch_reads=32
    )
    assert spec.to_dict() == count_kmers(reads, 19)


def test_spectrum_overflow_detected(rng):
    reads = [random_seq(rng, 70) for _ in range(50)]
    b = pack_reads(reads, pad_length=70)
    spec = count_spectrum(jnp.asarray(b.codes), jnp.asarray(b.lengths), 19, 64)
    assert spec.overflowed()


def test_empty_batch():
    b = pack_reads(["ACG"], pad_length=32)  # shorter than k -> no windows
    spec = count_spectrum(jnp.asarray(b.codes), jnp.asarray(b.lengths), 9, 128)
    assert int(spec.n) == 0
    assert spec.to_dict() == {}


def test_merge_spectra_sized_grows_past_batch_capacity(rng):
    """The sized batch-to-batch merge lets the global table exceed the
    per-batch capacity without overflow (and without the 2*capacity
    merge-sort shape)."""
    from shannon_tpu.ops.count import merge_spectra_sized

    r1 = [random_seq(rng, 60) for _ in range(40)]
    r2 = [random_seq(rng, 60) for _ in range(40)]
    k, cap = 17, 1 << 11
    b1, b2 = pack_reads(r1, 64), pack_reads(r2, 64)
    s1 = count_spectrum(jnp.asarray(b1.codes), jnp.asarray(b1.lengths), k, cap)
    s2 = count_spectrum(jnp.asarray(b2.codes), jnp.asarray(b2.lengths), k, cap)
    assert not s1.overflowed() and not s2.overflowed()
    merged = merge_spectra_sized(s1, s2)
    assert merged.capacity >= int(merged.n)
    assert not merged.overflowed()
    assert merged.to_dict() == count_kmers(r1 + r2, k)


def test_count_reads_spectrum_growth_via_speculative_redo(rng):
    """The lagged async overflow scheme (round 4): when the GLOBAL
    table outgrows the per-batch capacity, the speculative fixed-shape
    merge is redone as a sized merge one batch late — the final
    spectrum must still match the oracle exactly."""
    reads = [random_seq(rng, 70) for _ in range(64)]
    b = pack_reads(reads, pad_length=70)
    # per 16-read batch: ~750 distinct < 1024 cap; total ~2900 > cap
    spec = count_reads_spectrum(
        b.codes, b.lengths, k=19, capacity=1024, batch_reads=16
    )
    assert spec.capacity > 1024  # the growth path actually engaged
    assert spec.to_dict() == count_kmers(reads, 19)


def test_count_reads_spectrum_batch_overflow_raises(rng):
    """Per-batch capacity overflow must raise, not be silently absorbed
    by the growing merge."""
    reads = [random_seq(rng, 70) for _ in range(64)]
    b = pack_reads(reads, pad_length=70)
    with pytest.raises(RuntimeError, match="distinct k-mers"):
        count_reads_spectrum(b.codes, b.lengths, k=19, capacity=64, batch_reads=32)
