"""Device read threading (reference hot loop #3/#4a — SURVEY.md §4.1):
map every read to its contig path with batched binary searches + run
scans, replacing the per-read Python dict walk.

Spec (matches oracle thread_read):
  * window j of a read 'hits' iff its oriented k-mer is an alive node;
  * consecutive hit windows are automatically consistent (an alive
    k-mer's successor within its contig is its unique graph successor),
    so the read's usable stretch is its LONGEST RUN of hit windows
    (ties -> earliest);
  * the path is the sequence of contigs visited within that run
    (a contig is appended when the run starts or when the window's
    contig offset is 0, i.e. a boundary crossing; revisits in cycles
    append again).

Output: paths [n_reads, W] int32 contig ids, -1 padded; path lengths.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shannon_tpu.ops.condense import ContigArrays
from shannon_tpu.ops.kmers import extract_kmers
from shannon_tpu.ops.spectrum import lower_bound_hilo


@partial(jax.jit, static_argnames=("k",))
def thread_reads_device(
    codes: jnp.ndarray,  # [N, L] uint8
    lengths: jnp.ndarray,  # [N]
    ca: ContigArrays,
    k: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (paths [N, W] int32 cid or -1, path_len [N] int32)."""
    N, L = codes.shape
    W = L - k + 1
    hi, lo, valid = extract_kmers(codes, lengths, k, canonical=False)
    idx, hit = lower_bound_hilo(
        ca.node_hi, ca.node_lo, hi.reshape(-1), lo.reshape(-1)
    )
    idx = idx.reshape(N, W)
    hit = (hit.reshape(N, W)) & valid
    cid = jnp.where(hit, ca.node_cid[idx], -1)
    off = jnp.where(hit, ca.node_off[idx], -1)

    # --- longest run of hits per read (ties -> earliest) ---------------
    # run id per window: new run starts where hit & (~prev_hit)
    prev_hit = jnp.pad(hit[:, :-1], ((0, 0), (1, 0)), constant_values=False)
    run_start = hit & ~prev_hit
    run_id = jnp.cumsum(run_start.astype(jnp.int32), axis=1) - 1  # per read
    run_id = jnp.where(hit, run_id, -1)
    # run lengths via scatter-add per (read, run)
    max_runs = (W + 1) // 2 + 1
    tgt = jnp.where(hit, jnp.clip(run_id, 0, max_runs - 1), max_runs)
    run_len = jnp.zeros((N, max_runs + 1), jnp.int32)
    run_len = run_len.at[
        jnp.arange(N, dtype=jnp.int32)[:, None].repeat(W, 1), tgt
    ].add(1)[:, :max_runs]
    best_run = jnp.argmax(run_len, axis=1).astype(jnp.int32)  # earliest max
    in_best = hit & (run_id == best_run[:, None])

    # --- contig path within the best run -------------------------------
    is_event = in_best & (run_start | (off == 0))
    pos = jnp.cumsum(is_event.astype(jnp.int32), axis=1) - 1
    tgt_p = jnp.where(is_event, pos, W)
    paths = jnp.full((N, W + 1), -1, jnp.int32)
    paths = paths.at[
        jnp.arange(N, dtype=jnp.int32)[:, None].repeat(W, 1), tgt_p
    ].set(cid)[:, :W]
    path_len = is_event.sum(axis=1).astype(jnp.int32)
    return paths, path_len


def paths_to_lists(paths: np.ndarray, path_len: np.ndarray) -> list[list[int]]:
    """Host conversion to raw per-read path lists, aligned with the
    batch rows ([] = unthreadable read); feed to oracle
    multibridge.expand_paths for pair joining + RC-twin expansion."""
    paths = np.asarray(paths)
    path_len = np.asarray(path_len)
    return [
        paths[i, : int(path_len[i])].tolist() for i in range(paths.shape[0])
    ]
