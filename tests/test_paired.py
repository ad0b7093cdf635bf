"""Paired-end capability tests (BASELINE config 2; SURVEY.md §6 'long
context' = insert-size bridging)."""

import numpy as np
import pytest

from shannon_tpu.config import AssemblyConfig
from shannon_tpu.io.dna import revcomp_str
from shannon_tpu.pipeline import assemble, normalize_mate2
from shannon_tpu.sim import sample_paired_reads, simulate_transcripts
from shannon_tpu.sim import random_seq


def test_normalize_mate2():
    reads = ["ACGT", "AACC", "GGGG", "TTAA"]
    out = normalize_mate2(reads)
    assert out == ["ACGT", "GGTT", "GGGG", "TTAA"]


def test_paired_assembly_simple(rng):
    t = simulate_transcripts(rng, n=2, length=400)
    reads = sample_paired_reads(rng, t, coverage=40, read_length=70,
                                insert_size=200)
    cfg = AssemblyConfig(k=21, kmer_capacity=1 << 15)
    for backend in ("oracle", "device"):
        res = assemble(reads, cfg, backend=backend, paired=True)
        expect = {min(x, revcomp_str(x)) for x in t}
        assert expect <= res.canonical_set(), backend


def test_pair_bridging_resolves_long_repeat(rng):
    # repeat LONGER than the read (so no single read spans it) but
    # shorter than the insert: only mate-pair joining can separate
    # A-R-B from C-R-D.
    a, b, c, d = simulate_transcripts(rng, n=4, length=300)
    r = random_seq(rng, 120)  # read_length 80 < 120 < insert 260
    t1, t2 = a + r + b, c + r + d
    reads = sample_paired_reads(
        rng, [t1, t2], coverage=50, read_length=80, insert_size=260
    )
    cfg = AssemblyConfig(k=21, kmer_capacity=1 << 15)
    res = assemble(reads, cfg, backend="oracle", paired=True)
    expect = {min(x, revcomp_str(x)) for x in (t1, t2)}
    got = res.canonical_set()
    assert expect <= got
    # chimeras (A-R-D / C-R-B) must NOT be produced
    ch1 = a + r + d
    ch2 = c + r + b
    assert min(ch1, revcomp_str(ch1)) not in got
    assert min(ch2, revcomp_str(ch2)) not in got


def test_paired_backend_parity(rng):
    t = simulate_transcripts(rng, n=2, length=350)
    reads = sample_paired_reads(rng, t, coverage=30, read_length=70,
                                insert_size=220)
    cfg = AssemblyConfig(k=21, kmer_capacity=1 << 15)
    dev = assemble(reads, cfg, backend="device", paired=True)
    orc = assemble(reads, cfg, backend="oracle", paired=True)
    assert [x.seq for x in dev.transcripts] == [x.seq for x in orc.transcripts]


def test_unpaired_flag_ignores_joining(rng):
    t = simulate_transcripts(rng, n=1, length=300)
    reads = sample_paired_reads(rng, t, coverage=30, read_length=70,
                                insert_size=200)
    cfg = AssemblyConfig(k=21, use_pairs=False, kmer_capacity=1 << 15)
    res = assemble(reads, cfg, backend="oracle", paired=True)
    assert {min(x, revcomp_str(x)) for x in t} <= res.canonical_set()
