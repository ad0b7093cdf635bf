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
