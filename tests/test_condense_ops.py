"""Device condensation parity vs oracle build_contigs (SURVEY.md §5.1:
contig-set equality gate)."""

import numpy as np
import pytest

import jax.numpy as jnp

from shannon_tpu.config import AssemblyConfig
from shannon_tpu.io.pack import pack_reads
from shannon_tpu.ops.condense import build_contig_arrays, to_contig_graph
from shannon_tpu.ops.count import count_spectrum
from shannon_tpu.oracle.correction import correct_kmers
from shannon_tpu.oracle.counting import count_kmers
from shannon_tpu.oracle.graph import build_contigs
from shannon_tpu.sim import random_seq, sample_reads, simulate_isoforms, simulate_transcripts


def _device_graph(reads, cfg, cap=1 << 13):
    b = pack_reads(reads, pad_length=max(len(s) for s in reads))
    spec = count_spectrum(
        jnp.asarray(b.codes), jnp.asarray(b.lengths), cfg.k, cap,
        canonical=not cfg.strand_specific,
    )
    ca = build_contig_arrays(spec, cfg.k, canonical=not cfg.strand_specific)
    return to_contig_graph(ca, cfg.k, cfg, with_kmers=True)


def _oracle_graph(reads, cfg):
    counts = count_kmers(reads, cfg.k, cfg.strand_specific)
    return build_contigs(counts, cfg)


def _graph_signature(g):
    """Order-independent signature: contigs + edges by sequence."""
    seqs = [c.seq for c in g.contigs]
    contig_sig = sorted((c.seq, round(c.abundance, 3)) for c in g.contigs)
    edge_sig = sorted(
        (seqs[u], seqs[v]) for u in range(g.n) for v in g.out_edges[u]
    )
    rc_sig = sorted((seqs[i], seqs[g.rc_pair[i]]) for i in range(g.n))
    return contig_sig, edge_sig, rc_sig


CASES = {
    "single": lambda rng: simulate_transcripts(rng, n=1, length=300),
    "multi": lambda rng: simulate_transcripts(rng, n=3, length=250),
    "isoforms": lambda rng: simulate_isoforms(rng, exon_length=120),
    "repeat": lambda rng: (
        lambda a, b, c, d, r: [a + r + b, c + r + d]
    )(*simulate_transcripts(rng, n=4, length=150), random_seq(rng, 60)),
    "cycle": lambda rng: [
        (lambda s: s * 4)(random_seq(rng, 50))  # tandem repeat -> dBG cycle
    ],
    "homopolymer": lambda rng: ["A" * 120],  # self-loop k-mer
}


@pytest.mark.parametrize("case", sorted(CASES))
@pytest.mark.parametrize("k", [15, 24])
def test_condense_parity(rng, case, k):
    ts = CASES[case](rng)
    reads = sample_reads(rng, ts, coverage=12, read_length=70, both_strands=False)
    if not reads:  # transcripts shorter than read length
        reads = ts
    cfg = AssemblyConfig(k=k)
    dev = _device_graph(reads, cfg)
    orc = _oracle_graph(reads, cfg)
    assert _graph_signature(dev) == _graph_signature(orc)


def test_condense_parity_strand_specific(rng):
    ts = simulate_transcripts(rng, n=2, length=200)
    reads = sample_reads(rng, ts, coverage=10, read_length=60, both_strands=False)
    cfg = AssemblyConfig(k=17, strand_specific=True)
    dev = _device_graph(reads, cfg)
    orc = _oracle_graph(reads, cfg)
    assert _graph_signature(dev) == _graph_signature(orc)


def test_condense_contig_of_kmer_map(rng):
    ts = simulate_transcripts(rng, n=2, length=200)
    reads = sample_reads(rng, ts, coverage=10, read_length=60)
    cfg = AssemblyConfig(k=21)
    dev = _device_graph(reads, cfg)
    orc = _oracle_graph(reads, cfg)
    dev_map = dev._contig_of_kmer
    orc_map = orc._contig_of_kmer
    assert set(dev_map) == set(orc_map)
    # offsets must agree via sequence identity of the containing contig
    for v in list(orc_map)[:200]:
        oc, oo = orc_map[v]
        dc, do = dev_map[v]
        assert orc.contigs[oc].seq == dev.contigs[dc].seq
        assert oo == do


def test_condense_after_correction_parity(rng):
    ts = simulate_transcripts(rng, n=2, length=250)
    reads = sample_reads(rng, ts, coverage=30, read_length=70, error_rate=0.01)
    cfg = AssemblyConfig(k=21)
    from shannon_tpu.ops.correction import correct_spectrum

    b = pack_reads(reads, pad_length=70)
    spec = count_spectrum(jnp.asarray(b.codes), jnp.asarray(b.lengths), cfg.k, 1 << 14)
    spec = correct_spectrum(
        spec, cfg.k, cfg.min_abundance, cfg.sibling_ratio,
        cfg.correction_rounds, error_rate=cfg.error_rate,
    )
    ca = build_contig_arrays(spec, cfg.k)
    dev = to_contig_graph(ca, cfg.k, cfg)
    orc = build_contigs(correct_kmers(count_kmers(reads, cfg.k), cfg), cfg)
    assert _graph_signature(dev) == _graph_signature(orc)
