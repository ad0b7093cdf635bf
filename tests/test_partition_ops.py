"""Device partitioning (GPMETIS replacement) parity vs oracle weak
components."""

import numpy as np
import pytest

import jax.numpy as jnp

from shannon_tpu.config import AssemblyConfig
from shannon_tpu.io.pack import pack_reads
from shannon_tpu.ops.condense import build_contig_arrays, to_contig_graph
from shannon_tpu.ops.count import count_spectrum
from shannon_tpu.ops.partition import (
    bucket_components,
    components_to_lists,
    connected_components,
)
from shannon_tpu.sim import random_seq, sample_reads, simulate_isoforms, simulate_transcripts


def _arrays_and_graph(rng, ts, cfg):
    reads = sample_reads(rng, ts, coverage=15, read_length=70)
    b = pack_reads(reads, pad_length=70)
    spec = count_spectrum(
        jnp.asarray(b.codes), jnp.asarray(b.lengths), cfg.k, 1 << 15
    )
    ca = build_contig_arrays(spec, cfg.k)
    return ca, to_contig_graph(ca, cfg.k, cfg)


def test_components_parity(rng):
    ts = simulate_transcripts(rng, n=5, length=300) + simulate_isoforms(
        rng, exon_length=140
    )
    cfg = AssemblyConfig(k=21)
    ca, g = _arrays_and_graph(rng, ts, cfg)
    labels = connected_components(ca)
    dev = components_to_lists(np.asarray(labels), int(ca.n_contigs))
    assert dev == g.components()
    # 7 transcripts x 2 orientations, isoform pair shares components
    assert len(dev) == 2 * 5 + 2


def test_components_repeat_link(rng):
    # a shared repeat links two transcripts into one component
    a, b_, c, d = simulate_transcripts(rng, n=4, length=160)
    r = random_seq(rng, 50)
    cfg = AssemblyConfig(k=21)
    ca, g = _arrays_and_graph(rng, [a + r + b_, c + r + d], cfg)
    labels = connected_components(ca)
    dev = components_to_lists(np.asarray(labels), int(ca.n_contigs))
    assert dev == g.components()
    assert len(dev) == 2  # one per orientation


def test_bucket_components():
    buckets = bucket_components([1, 3, 3, 9, 70, 2, 16])
    assert buckets[1] == [0]
    assert buckets[4] == [1, 2]
    assert buckets[16] == [3, 6]
    assert buckets[2] == [5]
    assert buckets[0] == [4]  # oversized


def test_assemble_components_matches_whole_graph(rng):
    """Bucket-scheduled per-component assembly (the live pipeline path)
    must produce the identical transcript multiset as whole-graph
    MB+SF+enumeration, with matching split counts."""
    from shannon_tpu.oracle.assemble import (
        dedupe_and_filter,
        enumerate_transcripts,
    )
    from shannon_tpu.oracle.multibridge import multibridge, thread_reads
    from shannon_tpu.oracle.nodegraph import NodeGraph
    from shannon_tpu.oracle.sparseflow import sparse_flow
    from shannon_tpu.io.dna import encode_seq
    from shannon_tpu.parallel.components import (
        assemble_components,
        device_components,
    )

    ts = simulate_transcripts(rng, n=6, length=300) + simulate_isoforms(
        rng, exon_length=140
    )
    cfg = AssemblyConfig(k=21)
    reads = sample_reads(rng, ts, coverage=12, read_length=70)
    ca, g = _arrays_and_graph(rng, ts, cfg)
    comps = device_components(ca)
    assert comps == g.components()

    read_codes = [encode_seq(s) for s in reads]
    # build with_kmers graph for oracle threading
    gk = to_contig_graph(ca, cfg.k, cfg, with_kmers=True)
    paths, weights = thread_reads(read_codes, gk, cfg)

    g1 = NodeGraph.from_contig_graph(gk, paths, weights)
    n_mb1 = multibridge(g1, cfg)
    n_sf1 = sparse_flow(g1, cfg)
    t1, tr1 = enumerate_transcripts(g1, cfg)

    g2 = NodeGraph.from_contig_graph(gk, paths, weights)
    t2, n_mb2, n_sf2, tr2, _phase = assemble_components(g2, comps, cfg)

    assert n_mb1 == n_mb2 and n_sf1 == n_sf2 and tr1 == tr2
    assert sorted((t.seq, round(t.abundance, 4)) for t in t1) == sorted(
        (t.seq, round(t.abundance, 4)) for t in t2
    )
    f1 = dedupe_and_filter(t1, cfg)
    f2 = dedupe_and_filter(t2, cfg)
    assert [(t.seq, t.abundance) for t in f1] == [
        (t.seq, t.abundance) for t in f2
    ]
