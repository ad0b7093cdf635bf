"""Device tip-clipping parity vs oracle clip_tips (SURVEY.md §5.1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from shannon_tpu.config import AssemblyConfig
from shannon_tpu.io.pack import pack_reads
from shannon_tpu.ops.correction import correct_spectrum
from shannon_tpu.ops.count import count_spectrum
from shannon_tpu.ops.tipclip import clip_tips_spectrum
from shannon_tpu.oracle.correction import clip_tips, correct_kmers
from shannon_tpu.oracle.counting import count_kmers
from shannon_tpu.sim import sample_reads, simulate_isoforms, simulate_transcripts


def _device_alive(reads, cfg, cap=1 << 16):
    canonical = not cfg.strand_specific
    b = pack_reads(reads, pad_length=max(len(s) for s in reads))
    spec = count_spectrum(
        jnp.asarray(b.codes), jnp.asarray(b.lengths), cfg.k, cap, canonical
    )
    assert not spec.overflowed(), "test capacity too small"
    spec = correct_spectrum(
        spec, cfg.k, cfg.min_abundance, cfg.sibling_ratio,
        cfg.correction_rounds, canonical,
    )
    spec = clip_tips_spectrum(spec, cfg, canonical)
    return spec.to_dict()


def _oracle_alive(reads, cfg):
    alive = correct_kmers(count_kmers(reads, cfg.k, cfg.strand_specific), cfg)
    return clip_tips(alive, cfg)


@pytest.mark.parametrize("error_rate", [0.0, 0.01, 0.03])
def test_tipclip_parity(rng, error_rate):
    ts = simulate_transcripts(rng, n=2, length=280) + simulate_isoforms(
        rng, exon_length=130
    )
    reads = sample_reads(
        rng, ts, abundances=[1, 4, 2, 1], coverage=30, read_length=70,
        error_rate=error_rate,
    )
    cfg = AssemblyConfig(k=21)
    assert _device_alive(reads, cfg) == _oracle_alive(reads, cfg)


def test_tipclip_removes_error_debris(rng):
    t = simulate_transcripts(rng, n=1, length=300)[0]
    reads = sample_reads(rng, [t], coverage=50, read_length=70, error_rate=0.02)
    cfg = AssemblyConfig(k=21)
    got = _device_alive(reads, cfg)
    true_kmers = set(count_kmers([t], cfg.k))
    assert true_kmers <= set(got)
    # correction + tip clipping removes the bulk of the ~6k raw error
    # k-mers; survivors are bubble-shaped error paths (reconnect at both
    # ends), which tip rules cannot see — bubble popping is a separate
    # stage (future); require >85% debris removal here
    raw = set(count_kmers(reads, cfg.k))
    assert len(set(got) - true_kmers) < 0.15 * len(raw - true_kmers)


def test_tipclip_strand_specific_parity(rng):
    ts = simulate_transcripts(rng, n=2, length=220)
    reads = sample_reads(
        rng, ts, coverage=25, read_length=60, error_rate=0.01, both_strands=False
    )
    cfg = AssemblyConfig(k=19, strand_specific=True)
    assert _device_alive(reads, cfg) == _oracle_alive(reads, cfg)


def test_tipclip_disabled(rng):
    ts = simulate_transcripts(rng, n=1, length=200)
    reads = sample_reads(rng, ts, coverage=20, read_length=60, error_rate=0.01)
    cfg = AssemblyConfig(k=19, tip_klen=-1)
    dev = _device_alive(reads, cfg)
    orc = _oracle_alive(reads, cfg)
    assert dev == orc  # both no-ops beyond correction


def test_error_branch_ratio_pops_low_coverage_bubble(rng):
    """A single-substitution bubble at coverage 4 survives the lax
    sibling_ratio (1 >= 0.1*4) but is popped by error_branch_ratio
    (1 < 0.5*4); a long low branch (real isoform structure) at the same
    abundance ratio is protected by the k+2 length gate."""
    t = simulate_transcripts(rng, n=1, length=400)[0]
    # error-free reads at ~4x, plus ONE read with a mid-read error
    reads = sample_reads(rng, [t], coverage=4, read_length=80,
                         error_rate=0.0)
    bad = t[100:180]
    bad = bad[:40] + ("A" if bad[40] != "A" else "C") + bad[41:]
    reads.append(bad)
    cfg = AssemblyConfig(k=21)
    true_kmers = set(count_kmers([t], cfg.k))
    got = set(_device_alive(reads, cfg))
    assert got == true_kmers  # error bubble fully popped
    assert got == set(_oracle_alive(reads, cfg))  # parity
    # with the stricter rule disabled the bubble survives
    cfg_off = AssemblyConfig(k=21, error_branch_ratio=0.0)
    assert set(_device_alive(reads, cfg_off)) > true_kmers


def test_error_branch_ratio_spares_long_isoform_branch(rng):
    """Two isoforms at 8:1 abundance sharing flanking exons: the rare
    isoform's alternative exon is a LONG parallel branch — the k+2
    length gate must keep error_branch_ratio away from it even though
    its abundance ratio (1/8 < 0.5) would doom a short branch."""
    iso = simulate_isoforms(rng, exon_length=120)
    reads = sample_reads(rng, iso, abundances=[8, 1], coverage=8,
                         read_length=70, error_rate=0.0)
    cfg = AssemblyConfig(k=21)
    got = set(_device_alive(reads, cfg))
    for t in iso:
        assert set(count_kmers([t], cfg.k)) <= got
    assert got == set(_oracle_alive(reads, cfg))
