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
    Returns True when running multi-process."""
    import jax

    if jax.process_count() > 1:
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        return jax.process_count() > 1
    return False


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
