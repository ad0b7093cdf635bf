"""Oracle (reference-semantics) tests — SURVEY.md §5: property tests with
synthetic transcriptomes, known-answer cases for MB and SF."""

import numpy as np
import pytest

from shannon_tpu.config import AssemblyConfig
from shannon_tpu.io.dna import revcomp_str
from shannon_tpu.oracle.assemble import assemble_oracle
from shannon_tpu.oracle.counting import (
    canon_kmer,
    count_kmers,
    count_kmers_pure_python,
    kmer_to_str,
    revcomp_kmer,
    spectrum_arrays,
    str_to_kmer,
)
from shannon_tpu.oracle.correction import clip_tips, correct_kmers
from shannon_tpu.oracle.graph import build_contigs
from shannon_tpu.sim import (
    sample_reads,
    simulate_isoforms,
    simulate_transcripts,
)


# ---------------------------------------------------------------- counting
def test_kmer_pack_roundtrip():
    s = "ACGTACGTAGGTCCAATTGGCCAA"
    v = str_to_kmer(s)
    assert kmer_to_str(v, len(s)) == s


def test_revcomp_kmer_matches_string():
    s = "ACGTAGGTCCAA"
    assert kmer_to_str(revcomp_kmer(str_to_kmer(s), len(s)), len(s)) == revcomp_str(s)


def test_count_simple():
    # k=3 over ACGTA: ACG, CGT, GTA; canonical: ACG min(ACG,CGT=?)..
    counts = count_kmers(["ACGTA"], k=3)
    def c(s):
        return canon_kmer(str_to_kmer(s), 3)
    assert counts == {c("ACG"): 2, c("GTA"): 1}
    # ACG canonical == CGT canonical (revcomp(ACG)=CGT) so they merge


def test_count_strand_specific():
    counts = count_kmers(["ACGTA"], k=3, strand_specific=True)
    assert counts == {str_to_kmer("ACG"): 1, str_to_kmer("CGT"): 1, str_to_kmer("GTA"): 1}


def test_count_skips_invalid():
    counts = count_kmers(["ACGNTAC"], k=3)
    # valid windows: ACG and TAC (windows containing N excluded)
    assert counts == {
        canon_kmer(str_to_kmer("ACG"), 3): 1,
        canon_kmer(str_to_kmer("TAC"), 3): 1,
    }


def test_count_rc_collapse(rng):
    t = "".join("ACGT"[i] for i in rng.integers(0, 4, size=100))
    c1 = count_kmers([t], k=11)
    c2 = count_kmers([revcomp_str(t)], k=11)
    assert c1 == c2


def test_pure_python_counter_matches(rng):
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, size=60)) for _ in range(30)]
    seqs.append("ACGNNACGTACGTACGGGTA")  # invalid bases
    assert count_kmers(seqs, 13) == count_kmers_pure_python(seqs, 13)
    assert count_kmers(seqs, 13, True) == count_kmers_pure_python(seqs, 13, True)


def test_spectrum_arrays_sorted():
    counts = {5: 2, 1: 7, 9: 1}
    k, c = spectrum_arrays(counts)
    assert k.tolist() == [1, 5, 9]
    assert c.tolist() == [7, 2, 1]


# -------------------------------------------------------------- correction
def test_abundance_filter():
    cfg = AssemblyConfig(k=3, min_abundance=2, sibling_ratio=0.0)
    counts = {1: 1, 2: 2, 3: 5}
    assert correct_kmers(counts, cfg) == {2: 2, 3: 5}


def test_sibling_pruning_removes_error_branch():
    # True path: many copies of a sequence; error branch: single read with
    # one substitution creates low-count sibling k-mers at a fork.
    true = "ACGTAGGTCCAATTGGCCAATACG"
    err = true[:10] + ("A" if true[10] != "A" else "C") + true[11:]
    reads = [true] * 50 + [err]
    cfg = AssemblyConfig(k=11, min_abundance=1, sibling_ratio=0.1)
    counts = count_kmers(reads, cfg.k)
    alive = correct_kmers(counts, cfg)
    true_kmers = set(count_kmers([true], cfg.k))
    # branch pruning alone keeps every true k-mer and removes the error
    # fork k-mers; tip clipping then removes the dangling remainder
    assert true_kmers <= set(alive)
    alive = clip_tips(alive, cfg)
    assert true_kmers <= set(alive)
    assert set(alive) == true_kmers


def test_sibling_pruning_keeps_low_expression_isoform():
    rng = np.random.default_rng(7)
    iso1, iso2 = simulate_isoforms(rng, exon_length=80)
    cfg = AssemblyConfig(k=15, sibling_ratio=0.1)
    # 5x expression difference — above ratio, both survive
    counts = count_kmers([iso1] * 50 + [iso2] * 10, cfg.k)
    alive = correct_kmers(counts, cfg)
    assert set(count_kmers([iso2], cfg.k)) <= set(alive)


# -------------------------------------------------------------- condensing
def test_single_transcript_one_contig(rng):
    t = simulate_transcripts(rng, n=1, length=300)[0]
    cfg = AssemblyConfig(k=21)
    alive = correct_kmers(count_kmers([t], cfg.k), cfg)
    g = build_contigs(alive, cfg)
    # one contig per orientation, sequences are t and revcomp(t)
    seqs = {c.seq for c in g.contigs}
    assert seqs == {t, revcomp_str(t)}
    assert all(len(g.out_edges[i]) == 0 for i in range(g.n))


def test_contig_rc_pairing(rng):
    t = simulate_transcripts(rng, n=1, length=200)[0]
    cfg = AssemblyConfig(k=21)
    g = build_contigs(count_kmers([t], cfg.k), cfg)
    assert g.n == 2
    assert g.rc_pair == [1, 0]
    assert g.contigs[1].seq == revcomp_str(g.contigs[0].seq)


def test_isoform_graph_structure(rng):
    iso1, iso2 = simulate_isoforms(rng, exon_length=100)
    cfg = AssemblyConfig(k=21)
    g = build_contigs(count_kmers([iso1, iso2], cfg.k), cfg)
    # per orientation: shared first exon (out-deg 2), two middles, shared
    # last exon (in-deg 2) => 8 contigs total, 1 weak component... the two
    # orientations are disconnected => 2 components
    assert g.n == 8
    comps = g.components()
    assert len(comps) == 2
    outdegs = sorted(len(e) for e in g.out_edges)
    assert outdegs == [0, 0, 1, 1, 1, 1, 2, 2]


def test_strand_specific_graph(rng):
    t = simulate_transcripts(rng, n=1, length=150)[0]
    cfg = AssemblyConfig(k=21, strand_specific=True)
    g = build_contigs(count_kmers([t], cfg.k, True), cfg)
    assert [c.seq for c in g.contigs] == [t]


# ------------------------------------------------------------- end-to-end
def test_assemble_single_transcript(rng):
    t = simulate_transcripts(rng, n=1, length=400)[0]
    reads = sample_reads(rng, [t], coverage=40, read_length=60)
    res = assemble_oracle(reads, AssemblyConfig(k=21))
    assert res.canonical_set() == {min(t, revcomp_str(t))}


def test_assemble_multiple_transcripts(rng):
    ts = simulate_transcripts(rng, n=4, length=350)
    reads = sample_reads(rng, ts, coverage=40, read_length=70)
    res = assemble_oracle(reads, AssemblyConfig(k=23))
    expect = {min(t, revcomp_str(t)) for t in ts}
    assert res.canonical_set() == expect
    assert res.stats["n_components"] >= 4


def test_assemble_with_errors(rng):
    t = simulate_transcripts(rng, n=2, length=400)
    reads = sample_reads(rng, t, coverage=60, read_length=70, error_rate=0.005)
    res = assemble_oracle(reads, AssemblyConfig(k=21, sibling_ratio=0.2))
    expect = {min(x, revcomp_str(x)) for x in t}
    assert expect <= res.canonical_set()


def test_multibridge_resolves_repeat(rng):
    # Known-answer MB case (SURVEY.md §5.2): two transcripts sharing a
    # middle repeat shorter than the read length: reads span the repeat
    # and must separate A-R-B from C-R-D (no chimeric A-R-D / C-R-B).
    a, b, c, d = (simulate_transcripts(rng, n=4, length=220))
    r = simulate_transcripts(rng, n=1, length=40)[0]  # repeat < read len
    t1, t2 = a + r + b, c + r + d
    reads = sample_reads(rng, [t1, t2], coverage=60, read_length=70)
    res = assemble_oracle(reads, AssemblyConfig(k=21))
    expect = {min(t, revcomp_str(t)) for t in (t1, t2)}
    assert res.canonical_set() == expect


def test_isoforms_shared_flanking_exons(rng):
    # Isoforms sharing first/last exons: no X-node arises (fan-out then
    # fan-in); path enumeration alone must recover both.
    iso1, iso2 = simulate_isoforms(rng, exon_length=260)
    reads = sample_reads(
        rng, [iso1, iso2], abundances=[4.0, 1.0], coverage=30, read_length=70
    )
    res = assemble_oracle(reads, AssemblyConfig(k=21))
    expect = {min(t, revcomp_str(t)) for t in (iso1, iso2)}
    assert res.canonical_set() == expect


def test_sparse_flow_splits_shared_segment(rng):
    # Known-answer SF case (SURVEY.md §5.2): a shared middle segment
    # LONGER than the read — the X-node cannot be read-bridged, so MB
    # leaves it and sparse flow must decompose it by its well-separated
    # abundances (4x vs 1x), without emitting chimeras.
    from shannon_tpu.sim import random_seq

    a, b, c, d = simulate_transcripts(rng, n=4, length=250)
    r = random_seq(rng, 120)  # read_length 70 < 120
    t1, t2 = a + r + b, c + r + d
    reads = sample_reads(
        rng, [t1, t2], abundances=[4.0, 1.0], coverage=30, read_length=70
    )
    res = assemble_oracle(reads, AssemblyConfig(k=21))
    expect = {min(t, revcomp_str(t)) for t in (t1, t2)}
    got = res.canonical_set()
    assert expect <= got
    assert res.stats["n_sf_splits"] > 0
    ch1, ch2 = a + r + d, c + r + b
    assert min(ch1, revcomp_str(ch1)) not in got
    assert min(ch2, revcomp_str(ch2)) not in got


def test_min_transcript_length_filter(rng):
    t = simulate_transcripts(rng, n=1, length=150)[0]  # < 200
    reads = sample_reads(rng, [t], coverage=40, read_length=60)
    res = assemble_oracle(reads, AssemblyConfig(k=21))
    assert res.canonical_set() == set()
    res2 = assemble_oracle(reads, AssemblyConfig(k=21, min_transcript_length=100))
    assert res2.canonical_set() == {min(t, revcomp_str(t))}


def test_assembly_deterministic(rng):
    ts = simulate_transcripts(rng, n=3, length=300)
    reads = sample_reads(rng, ts, coverage=30, read_length=65)
    cfg = AssemblyConfig(k=21)
    r1 = assemble_oracle(reads, cfg)
    r2 = assemble_oracle(list(reads), cfg)
    assert [t.seq for t in r1.transcripts] == [t.seq for t in r2.transcripts]
