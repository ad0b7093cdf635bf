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
