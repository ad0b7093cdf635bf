"""Profile the front half at bench scale: where do tipclip_s /
condense_s / threading kernel_s actually go?  Prints one timing line
per probe.  Usage: python scripts/prof_front.py [n_reads]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from shannon_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from shannon_tpu.config import AssemblyConfig
from shannon_tpu.io.pack import pack_reads
from shannon_tpu.ops.condense import (
    _cycle_fix,
    _label_stage,
    _links_stage,
    _nodes_stage,
    _reduce_stage,
    build_contig_arrays,
    contig_sequences,
    to_contig_graph,
)
from shannon_tpu.ops.correction import correct_spectrum
from shannon_tpu.ops.count import count_reads_spectrum, shrink_spectrum
from shannon_tpu.ops.thread import thread_reads_device

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
READ_LEN = 100


def t(label, fn, *args, n=1, sync=None, **kw):
    # warm
    out = fn(*args, **kw)
    if sync is not None:
        sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
        if sync is not None:
            sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:42s} {dt*1e3:10.1f} ms")
    return out


def main():
    rng = np.random.default_rng(11)
    from shannon_tpu.sim import sample_reads, simulate_transcripts

    n_tr, tlen = 500, 1500
    cov = N_READS * READ_LEN / (n_tr * tlen)
    abund = np.exp(rng.normal(0, 1, n_tr))
    ts = simulate_transcripts(rng, n=n_tr, length=tlen)
    reads = sample_reads(
        rng, ts, abundances=(abund / abund.mean()).tolist(), coverage=cov,
        read_length=READ_LEN, error_rate=0.01,
    )
    print(f"reads: {len(reads)}")
    cfg = AssemblyConfig()
    batch = pack_reads(reads, pad_length=cfg.read_pad_length)

    t0 = time.perf_counter()
    spec = count_reads_spectrum(
        batch.codes, batch.lengths, cfg.k, cfg.kmer_capacity,
        batch_reads=cfg.batch_reads,
    )
    spec.hi.block_until_ready()
    print(f"{'count':42s} {(time.perf_counter()-t0)*1e3:10.1f} ms")
    spec = shrink_spectrum(spec)
    print(f"spectrum n={int(spec.n)} cap={spec.capacity}")

    spec = t(
        "correct", correct_spectrum, spec, cfg.k, cfg.min_abundance,
        cfg.sibling_ratio, cfg.correction_rounds,
        sync=lambda s: s.hi.block_until_ready(),
    )
    print(f"corrected n={int(spec.n)} cap={spec.capacity}")

    # --- condensation stage split ---------------------------------------
    nodes = t(
        "condense A nodes_stage", _nodes_stage, spec, cfg.k, True,
        sync=lambda o: o[0].block_until_ready(),
    )
    node_hi, node_lo, node_count, n_nodes = nodes
    links = t(
        "condense B links_stage", _links_stage, node_hi, node_lo, cfg.k,
        sync=lambda o: o[0].block_until_ready(),
    )
    next_link, prev_link, rec_lane, firstP, p_cnt = links
    lbl = t(
        "condense C1 label_stage", _label_stage, prev_link,
        sync=lambda o: o[0].block_until_ready(),
    )
    ptr, dist, has_cycle = lbl
    print(f"has_cycle: {bool(has_cycle)}")
    if bool(has_cycle):
        prev2 = t(
            "condense C1b cycle_fix", _cycle_fix, prev_link,
            sync=lambda o: o.block_until_ready(),
        )
        ptr, dist, _ = _label_stage(prev2)
    else:
        prev2 = prev_link
    ca = t(
        "condense C2 reduce_stage", _reduce_stage,
        node_hi, node_lo, node_count, n_nodes,
        prev2, ptr, dist, rec_lane, firstP, p_cnt, cfg.k, True,
        sync=lambda o: o.out_edges.block_until_ready(),
    )
    print(f"contigs: {int(ca.n_contigs)}  nodes cap: {node_hi.shape[0]}")

    # --- tipclip split ---------------------------------------------------
    from shannon_tpu.ops.tipclip import (
        _drop_contigs,
        _host_clip_rounds,
        clip_tips_spectrum,
    )

    n = int(ca.n_contigs)
    klen = np.asarray(ca.klen[:n])
    csum = np.asarray(ca.count_sum[:n])
    t0 = time.perf_counter()
    out_e = np.asarray(ca.out_edges[:, :n])
    out_adj = [
        sorted({int(x) for x in out_e[:, c] if x >= 0}) for c in range(n)
    ]
    print(f"{'tipclip: out_adj host build':42s} {(time.perf_counter()-t0)*1e3:10.1f} ms")
    t0 = time.perf_counter()
    doomed = _host_clip_rounds(klen, csum, out_adj, cfg).doomed
    print(f"{'tipclip: host clip rounds':42s} {(time.perf_counter()-t0)*1e3:10.1f} ms")
    doomed_pad = np.zeros(ca.node_hi.shape[0], bool)
    doomed_pad[:n] = doomed
    spec2 = t(
        "tipclip: drop_contigs", _drop_contigs, spec, ca,
        jnp.asarray(doomed_pad),
        sync=lambda s: s.hi.block_until_ready(),
    )
    spec2 = shrink_spectrum(spec2)
    print(f"clipped n={int(spec2.n)} cap={spec2.capacity}")

    ca2 = t(
        "condense x2 (post-clip, full)", build_contig_arrays, spec2, cfg.k,
        sync=lambda o: o.out_edges.block_until_ready(),
    )

    # --- materialize ------------------------------------------------------
    seqs = t("materialize: contig_sequences", contig_sequences, ca2, cfg.k)
    g = t("materialize: to_contig_graph", to_contig_graph, ca2, cfg.k, cfg)

    # --- threading: kernel vs transfer -----------------------------------
    bs = cfg.batch_reads
    codes = jnp.asarray(batch.codes[:bs])
    lengths = jnp.asarray(batch.lengths[:bs])

    def kern():
        out = thread_reads_device(codes, lengths, ca2, cfg.k)
        jax.block_until_ready(out)
        return out

    outs = t("thread kernel (device only)", kern, n=3)

    def xfer():
        return [np.asarray(o) for o in outs]

    t("thread transfer to host (full width)", xfer, n=3)
    ev_cid = outs[0]
    nbytes = sum(o.size * o.dtype.itemsize for o in outs)
    print(f"transfer volume: {nbytes/1e6:.1f} MB per batch")


if __name__ == "__main__":
    main()
