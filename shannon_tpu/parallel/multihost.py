"""Multi-host initialization (SURVEY.md §8 M5, BASELINE config 5).

One call sets up `jax.distributed` when launched under a multi-host
coordinator (JAX_COORDINATOR_ADDRESS / TPU pod env); it is a no-op in a
single-process session, so every entry point can call it
unconditionally.  Read sharding across hosts composes with the in-slice
mesh: each host feeds its local shard of the interleaved read files
into the same `count_spectrum_sharded` all-to-all (the global mesh axis
spans all chips of all hosts — ICI within a slice, DCN across).
"""

from __future__ import annotations

import os


def init_distributed() -> bool:
    """Initialize jax.distributed if a coordinator is configured.
    Returns True when running multi-process.

    Order matters: `jax.distributed.initialize` must run BEFORE the
    first backend query (`jax.process_count()` initializes the backend),
    so the coordinator env is checked first.  Idempotent: a second call
    in an already-initialized process is a no-op.  Exercised by
    scripts/multihost_smoke.py (2-process CPU launch) and its pytest."""
    import jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr and not _distributed_initialized():
        if os.environ.get("JAX_PLATFORMS", "") == "cpu":
            # CPU multi-process collectives need gloo (TPU uses ICI/DCN)
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    return jax.process_count() > 1


def _distributed_initialized() -> bool:
    import jax

    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None:
        return bool(is_init())
    from jax._src import distributed  # jax without the public probe

    return distributed.global_state.client is not None


def host_byte_range(path: str | os.PathLike) -> tuple[int, int]:
    """This host's byte range of an (uncompressed) input file: equal
    byte split of [0, file_size) over processes.  Combined with
    native.pack_file_range's record-ownership contract (a record
    belongs to the range holding its header byte), each host parses
    ~1/N of the file and every record lands on exactly one host —
    replacing the parse-everything-then-slice ingest (SURVEY.md §8 M5;
    at the 100M-read workload ceiling the old scheme repeated hours of
    parsing on every host)."""
    import jax

    size = os.path.getsize(path)
    p, n = jax.process_index(), jax.process_count()
    return p * size // n, (p + 1) * size // n


def allgather_ragged(a):
    """All-gather a per-process ragged array (axis 0 may differ per
    process) into the process-rank-order concatenation, replicated on
    every process: gather lengths, pad to the max, gather data, trim."""
    import numpy as np
    from jax.experimental import multihost_utils

    a = np.asarray(a)
    ns = multihost_utils.process_allgather(
        np.array([a.shape[0]], np.int64)
    ).ravel()
    m = int(ns.max())
    pad = np.zeros((m,) + a.shape[1:], a.dtype)
    pad[: a.shape[0]] = a
    g = multihost_utils.process_allgather(pad)
    return np.concatenate(
        [g[p, : int(ns[p])] for p in range(len(ns))], axis=0
    )


def gather_evidence(flat, offs, weights):
    """Gather per-host threading evidence (flat node ids, row offsets,
    weights — ops/thread.runs_to_flat_paths format) into the global
    evidence set, replicated on every process (VERDICT r3 item 2: the
    back half previously ran on local evidence only, so each host wrote
    a different, incomplete transcripts.fasta).

    Rank-order concatenation reproduces the single-process evidence
    order exactly: hosts own contiguous, ascending byte ranges of the
    input, so host-rank order IS global read order — first-occurrence
    path dedup (NodeGraph.set_paths_flat) and every downstream
    tie-break see the same sequence as a single-process run."""
    import jax

    if jax.process_count() == 1:
        return flat, offs, weights
    import numpy as np

    lens = np.diff(np.asarray(offs, np.int64))
    g_flat = allgather_ragged(np.asarray(flat, np.int64))
    g_lens = allgather_ragged(lens)
    g_w = allgather_ragged(np.asarray(weights, np.int64))
    offs2 = np.zeros(len(g_lens) + 1, np.int64)
    np.cumsum(g_lens, out=offs2[1:])
    return g_flat, offs2, g_w


def localize_spectrum(spec):
    """Replicated-global Spectrum (out of the multi-process sharded
    count) -> process-local arrays, so the downstream per-host stages
    (correction probes, tip clip, condensation, threading lookups) run
    as plain local jits without touching the global mesh.  Every
    process holds the identical value, so the local recomputation of
    the graph is deterministic and redundant by design."""
    import jax.numpy as jnp
    import numpy as np

    from shannon_tpu.ops.count import Spectrum

    return Spectrum(
        hi=jnp.asarray(np.asarray(spec.hi)),
        lo=jnp.asarray(np.asarray(spec.lo)),
        count=jnp.asarray(np.asarray(spec.count)),
        n=jnp.int32(int(spec.n)),
    )


def count_reads_spectrum_multihost(
    batch_codes,
    batch_lengths,
    k: int,
    capacity: int,
    mesh,
    canonical: bool = True,
    batch_reads: int = 1 << 16,
):
    """Multi-PROCESS batched counting driver: each process feeds its
    local read slice; batches are padded to a uniform per-host row
    count, assembled into global arrays over the cross-host mesh
    (jax.make_array_from_process_local_data), and counted with the
    packed sharded program (hash all_to_all rides ICI/DCN).  Mirrors
    parallel.distributed.count_reads_spectrum_sharded, including the
    2-bit packed uploads and the one-batch-lagged async overflow
    resolution.  Returns (replicated global Spectrum, overflowed).

    The invalid-base mask is ALWAYS built here (even for clean
    batches): program structure must agree across processes, and a
    per-batch has-N negotiation would cost an allgather per batch.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from shannon_tpu.io.pack import invalid_mask_words, pack_words
    from shannon_tpu.ops.count import (
        SENTINEL,
        Spectrum,
        _overflow_flag,
        merge_spectra_fixed,
        merge_spectra_sized,
    )
    from shannon_tpu.parallel.distributed import (
        count_spectrum_sharded_packed,
    )
    from shannon_tpu.parallel.mesh import READS_AXIS

    n_local = batch_codes.shape[0]
    L = int(batch_codes.shape[1])
    ns = multihost_utils.process_allgather(
        np.array([n_local], np.int64)
    ).ravel()
    n_batches = max(1, -(-int(ns.max()) // batch_reads))
    sh_rows = NamedSharding(mesh, P(READS_AXIS, None))
    sh_vec = NamedSharding(mesh, P(READS_AXIS))

    total: Spectrum | None = None
    overflowed = False
    pending: tuple | None = None

    def _resolve() -> None:
        nonlocal total, overflowed, pending
        if pending is None:
            return
        prev_total, part, ovf, mflag = pending
        pending = None
        overflowed |= bool(ovf)
        if mflag is not None and bool(mflag):
            total = merge_spectra_sized(prev_total, part)

    for b in range(n_batches):
        s = min(b * batch_reads, n_local)
        e = min(s + batch_reads, n_local)
        codes = batch_codes[s:e]
        lengths = np.asarray(batch_lengths[s:e], np.int32)
        pad = batch_reads - codes.shape[0]
        if pad:
            codes = np.pad(codes, ((0, pad), (0, 0)), constant_values=4)
            lengths = np.pad(lengths, (0, pad))
        words = pack_words(codes)
        mask = invalid_mask_words(codes, lengths, force=True)
        gw = jax.make_array_from_process_local_data(sh_rows, words)
        gl = jax.make_array_from_process_local_data(sh_vec, lengths)
        gm = jax.make_array_from_process_local_data(sh_rows, mask)
        part, ovf = count_spectrum_sharded_packed(
            gw, gl, k, capacity, mesh, canonical, length=L, mask=gm
        )
        ovf.copy_to_host_async()
        _resolve()
        if total is None:
            total = part
            pending = (None, part, ovf, None)
        elif total.capacity == part.capacity:
            merged = merge_spectra_fixed(total, part)
            mflag = _overflow_flag(merged.hi)
            mflag.copy_to_host_async()
            pending = (total, part, ovf, mflag)
            total = merged
        else:
            pending = (None, part, ovf, None)
            total = merge_spectra_sized(total, part)
    _resolve()
    if total is None:
        total = Spectrum(
            hi=jnp.full(capacity, SENTINEL, jnp.uint32),
            lo=jnp.full(capacity, SENTINEL, jnp.uint32),
            count=jnp.zeros(capacity, jnp.int32),
            n=jnp.int32(0),
        )
    return total, overflowed


def host_read_slice(n_records: int) -> slice:
    """The record range this host should ingest: contiguous slice of the
    input file(s), pair-aligned (even boundaries) so mates stay on one
    host."""
    import jax

    p, n = jax.process_index(), jax.process_count()
    per = -(-n_records // n)
    per += per % 2  # pair alignment
    start = min(p * per, n_records)
    stop = min(start + per, n_records)
    return slice(start, stop)
