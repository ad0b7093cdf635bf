"""Device read threading (reference hot loop #3/#4a — SURVEY.md §4.1):
map every read to its contig-path runs with batched binary searches +
run scans, replacing the per-read Python dict walk.

Spec (matches oracle thread_read_runs):
  * window j of a read 'hits' iff its oriented k-mer is an alive node;
  * consecutive hit windows are automatically consistent (an alive
    k-mer's successor within its contig is its unique graph successor),
    so a 'run' is a maximal stretch of hit windows;
  * within a run, a contig is recorded when the run starts or when the
    window's contig offset is 0 (boundary crossing; cycle revisits
    record again);
  * ALL runs are returned (read rescue — the host chooses all-runs or
    longest-run per config.rescue_reads).

Outputs (fixed shapes): event contig ids + event run ids [N, W],
event count [N], and per-run geometry [N, R]: first/last window index
in the read (p0, p1) and the contig offsets of those windows (o0, o1).
The geometry feeds insert-size-constrained pair joining (SURVEY.md §6
'long context'): fragment length implied by a candidate mate join is
computed from (p, o) anchors, so geometrically impossible joins are
rejected and multi-node gaps licensed by the insert distribution are
bridged (oracle/multibridge.join_pair_runs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shannon_tpu.ops.condense import ContigArrays
from shannon_tpu.ops.kmers import extract_kmers, extract_kmers_packed
from shannon_tpu.ops.spectrum import lookup_hilo


@partial(jax.jit, static_argnames=("k",))
def thread_reads_device(
    codes: jnp.ndarray,  # [N, L] uint8
    lengths: jnp.ndarray,  # [N]
    ca: ContigArrays,
    k: int,
):
    """Returns (ev_cid [N, W], ev_run [N, W], n_events [N],
    run_p0, run_p1, run_o0, run_o1 — each [N, R], -1-padded)."""
    hi, lo, valid = extract_kmers(codes, lengths, k, canonical=False)
    return _thread_windows(hi, lo, valid, ca)


@partial(jax.jit, static_argnames=("k", "length"))
def thread_reads_device_packed(
    words: jnp.ndarray,  # [N, ceil(L/16)] uint32 (io.pack.pack_words)
    lengths: jnp.ndarray,
    ca: ContigArrays,
    k: int,
    length: int | None = None,
    mask: jnp.ndarray | None = None,
):
    """thread_reads_device over the 2-bit transfer format — identical
    output; 3.6x fewer upload bytes on the ~30-40MB/s tunnel (VERDICT
    r3 item 1: the threading driver pipelined downloads but uploaded
    raw uint8, paying the full byte tax a second time after counting)."""
    hi, lo, valid = extract_kmers_packed(
        words, lengths, k, canonical=False, length=length, mask=mask
    )
    return _thread_windows(hi, lo, valid, ca)


def _thread_windows(hi, lo, valid, ca: ContigArrays):
    """Shared threading body on extracted window k-mers."""
    N, W = hi.shape
    idx, hit = lookup_hilo(
        ca.node_hi, ca.node_lo, hi.reshape(-1), lo.reshape(-1)
    )
    idx = idx.reshape(N, W)
    hit = (hit.reshape(N, W)) & valid
    cid = jnp.where(hit, ca.node_cid[idx], -1)
    off = jnp.where(hit, ca.node_off[idx], -1)

    prev_hit = jnp.pad(hit[:, :-1], ((0, 0), (1, 0)), constant_values=False)
    next_hit = jnp.pad(hit[:, 1:], ((0, 0), (0, 1)), constant_values=False)
    run_start = hit & ~prev_hit
    run_end = hit & ~next_hit
    run_id = jnp.cumsum(run_start.astype(jnp.int32), axis=1) - 1
    run_id = jnp.where(hit, run_id, -1)

    # Per-row compaction via FLAT sorts with (row, flagged-col) packed
    # into one uint32 key — scatters are ~10x slower than sorts on this
    # hardware (ops/count._unique_reduce), and batched row-wise sorts
    # ([B, m] along the last axis) are far slower than one flat sort of
    # the same lanes (docs/DESIGN.md, measured).  Column bits size to
    # the window count (8 bits at the classic 128-base pad, 9 at a
    # 150bp library's 160-base pad, ...), so any (batch, read-length)
    # with row_bits + col_bits + 1 <= 32 packs — at the default
    # batch_reads = 2^16 that allows reads up to ~32k bases.
    col_bits = max((W - 1).bit_length(), 1) + 1  # +1 for the flag bit
    row_bits = max((N - 1).bit_length(), 1)
    if row_bits + col_bits > 32:
        raise ValueError(
            f"threading key overflow: batch of {N} reads x {W} windows "
            "needs >32 key bits; lower batch_reads or read_pad_length"
        )
    col = jax.lax.broadcasted_iota(jnp.uint32, (N, W), 1)
    row = jax.lax.broadcasted_iota(jnp.uint32, (N, W), 0)
    base = row << jnp.uint32(col_bits)
    FLAG = jnp.uint32(1 << (col_bits - 1))

    def row_compact(flag: jnp.ndarray, payloads: tuple) -> tuple:
        key = base | jnp.where(flag, col, col | FLAG)
        flat = jax.lax.sort(
            (key.reshape(-1), *(p.reshape(-1) for p in payloads)),
            num_keys=1,
        )
        return tuple(p.reshape(N, W) for p in flat[1:])

    is_event = hit & (run_start | (off == 0))
    ev_cid, ev_run = row_compact(is_event, (cid, run_id))
    n_events = is_event.sum(axis=1).astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (N, W), 1)
    ev_cid = jnp.where(idx < n_events[:, None], ev_cid, -1)
    ev_run = jnp.where(idx < n_events[:, None], ev_run, -1)

    # per-run geometry: compact run starts and run ends per row; run r
    # spans columns [start_r, end_r] (contiguous hits); the contig
    # offsets of those two anchor windows ride the same sorts
    max_runs = (W + 1) // 2 + 1
    s_pos, s_off = row_compact(run_start, (idx, off))
    e_pos, e_off = row_compact(run_end, (idx, off))
    n_runs = run_start.sum(axis=1).astype(jnp.int32)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (N, max_runs), 1)
    valid_r = ridx < n_runs[:, None]
    run_p0 = jnp.where(valid_r, s_pos[:, :max_runs], -1)
    run_p1 = jnp.where(valid_r, e_pos[:, :max_runs], -1)
    run_o0 = jnp.where(valid_r, s_off[:, :max_runs], -1)
    run_o1 = jnp.where(valid_r, e_off[:, :max_runs], -1)
    return ev_cid, ev_run, n_events, run_p0, run_p1, run_o0, run_o1


@partial(jax.jit, static_argnames=("w", "r"))
def pack_thread_outputs(
    ev_cid: jnp.ndarray,
    ev_run: jnp.ndarray,
    n_events: jnp.ndarray,
    run_p0: jnp.ndarray,
    run_p1: jnp.ndarray,
    run_o0: jnp.ndarray,
    run_o1: jnp.ndarray,
    lengths: jnp.ndarray,
    w: int,
    r: int,
) -> jnp.ndarray:
    """Pack the threading outputs into ONE [N, w+2r+3 + (w+2r+1)//2]
    int32 buffer for a single device->host transfer, trimmed to w event
    and r run columns and with 16-bit fields bitcast-packed in pairs.

    The tunnel to this TPU moves ~30 MB/s with ~100 ms per-transfer
    latency (measured): the old 7-download/batch full-width handoff was
    ~4s per 65k-read batch, ~95% of threading 'kernel' wall.  Trimmed +
    packed it is one ~26 MB download.

    Column layout (int32): ev_cid[w] | o0[r] | o1[r] | n_events |
    length | n_runs | packed int16 pairs of (ev_run[w] | p0[r] | p1[r]),
    zero-padded to an even int16 count.  Overflow (a read with more
    than w events or r runs) is detected HOST-side from the n_events /
    n_runs columns — no extra scalar sync — and the caller re-packs
    that batch at full width."""
    N, W = ev_cid.shape
    R = run_p0.shape[1]
    w = min(w, W)
    r = min(r, R)
    n_runs = (run_p0 != -1).sum(axis=1).astype(jnp.int32)
    buf16 = jnp.concatenate(
        [
            ev_run[:, :w].astype(jnp.int16),
            run_p0[:, :r].astype(jnp.int16),
            run_p1[:, :r].astype(jnp.int16),
        ],
        axis=1,
    )
    if buf16.shape[1] % 2:
        buf16 = jnp.pad(buf16, ((0, 0), (0, 1)))
    pairs = jax.lax.bitcast_convert_type(
        buf16.reshape(N, -1, 2), jnp.int32
    )
    return jnp.concatenate(
        [
            ev_cid[:, :w],
            run_o0[:, :r],
            run_o1[:, :r],
            n_events[:, None].astype(jnp.int32),
            lengths[:, None].astype(jnp.int32),
            n_runs[:, None],
            pairs,
        ],
        axis=1,
    )


def unpack_thread_buffer(
    buf: np.ndarray, w: int, r: int
) -> dict[str, np.ndarray]:
    """Host-side split of pack_thread_outputs' buffer back into named
    arrays (16-bit fields widened to int32)."""
    buf = np.asarray(buf)
    c = 0
    out: dict[str, np.ndarray] = {}
    out["ev_cid"] = buf[:, c : c + w]; c += w
    out["run_o0"] = buf[:, c : c + r]; c += r
    out["run_o1"] = buf[:, c : c + r]; c += r
    out["n_events"] = buf[:, c]; c += 1
    out["lengths"] = buf[:, c]; c += 1
    out["n_runs"] = buf[:, c]; c += 1
    # ascontiguousarray: arrays fetched from the TPU runtime can carry
    # a layout whose int16 view numpy rejects
    halves = (
        np.ascontiguousarray(buf[:, c:]).view(np.int16).reshape(len(buf), -1)
    )
    out["ev_run"] = halves[:, :w].astype(np.int32)
    out["run_p0"] = halves[:, w : w + r].astype(np.int32)
    out["run_p1"] = halves[:, w + r : w + 2 * r].astype(np.int32)
    return out


def runs_to_flat_paths(
    ev_cid: np.ndarray,
    ev_run: np.ndarray,
    n_events: np.ndarray,
    run_p0: np.ndarray,
    run_p1: np.ndarray,
    rc_pair: np.ndarray | None,
    rescue: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized single-end evidence construction: device threading
    rows -> flat path arrays (flat node ids, row offsets, unit weights),
    with each path followed by its reverse-complement twin when rc_pair
    is given — the array equivalent of paths_to_lists + expand_paths
    for the unpaired mode (VERDICT r2 item 5: the per-row Python loop
    was coverage-dependent and read-scale).  Emission order matches
    expand_paths exactly: read-major, runs in read order, forward then
    RC; duplicate paths merge downstream in NodeGraph._dedup_rows."""
    N, w = ev_cid.shape
    col = np.arange(w, dtype=np.int32)[None, :]
    valid = col < n_events[:, None]
    if not rescue:
        windows = np.where(run_p0 != -1, run_p1 - run_p0, -1)
        best = windows.argmax(axis=1).astype(np.int32)  # ties: earliest
        valid &= ev_run == best[:, None]
    if not valid.any():
        z = np.empty(0, np.int64)
        return z, np.zeros(1, np.int64), z
    prev_run = np.empty_like(ev_run)
    prev_run[:, 0] = -2
    prev_run[:, 1:] = ev_run[:, :-1]
    start2d = valid & ((col == 0) | (ev_run != prev_run))
    flat = ev_cid[valid].astype(np.int64)
    starts = start2d[valid]
    path_id = np.cumsum(starts) - 1
    lens = np.bincount(path_id).astype(np.int64)
    n_paths = len(lens)
    offs = np.zeros(n_paths + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    if rc_pair is None:
        return flat, offs, np.ones(n_paths, np.int64)
    total = len(flat)
    lens2 = np.repeat(lens, 2)
    offs2 = np.zeros(2 * n_paths + 1, np.int64)
    np.cumsum(lens2, out=offs2[1:])
    out = np.empty(2 * total, np.int64)
    within = np.arange(total, dtype=np.int64) - offs[path_id]
    out[offs2[2 * path_id] + within] = flat
    rev = flat[offs[path_id] + lens[path_id] - 1 - within]
    out[offs2[2 * path_id + 1] + within] = np.asarray(rc_pair, np.int64)[rev]
    return out, offs2, np.ones(2 * n_paths, np.int64)


def paths_to_lists(
    ev_cid: np.ndarray,
    ev_run: np.ndarray,
    n_events: np.ndarray,
    run_p0: np.ndarray,
    run_p1: np.ndarray,
    run_o0: np.ndarray,
    run_o1: np.ndarray,
    rescue: bool = True,
) -> list[list]:
    """Host conversion to per-read Run lists (aligned with batch rows;
    [] = unthreadable read): [[Run0, Run1, ...], ...] with each Run
    carrying (path, p0, p1, o0, o1) — see oracle.multibridge.Run.
    rescue=False keeps only each read's longest run (by window count
    p1 - p0 + 1, ties -> earliest)."""
    from shannon_tpu.oracle.multibridge import Run

    ev_cid = np.asarray(ev_cid)
    ev_run = np.asarray(ev_run)
    n_events = np.asarray(n_events)
    run_p0 = np.asarray(run_p0)
    run_p1 = np.asarray(run_p1)
    run_o0 = np.asarray(run_o0)
    run_o1 = np.asarray(run_o1)
    out: list[list] = []
    for i in range(ev_cid.shape[0]):
        n = int(n_events[i])
        if n == 0:
            out.append([])
            continue
        cids = ev_cid[i, :n]
        rids = ev_run[i, :n]
        # split events into runs at run-id changes
        cuts = np.nonzero(np.diff(rids))[0] + 1
        paths = [seg.tolist() for seg in np.split(cids, cuts)]
        run_ids = [int(rids[0])] + [int(rids[c]) for c in cuts]
        runs = [
            Run(
                path=paths[t],
                p0=int(run_p0[i, r]),
                p1=int(run_p1[i, r]),
                o0=int(run_o0[i, r]),
                o1=int(run_o1[i, r]),
            )
            for t, r in enumerate(run_ids)
        ]
        if rescue:
            out.append(runs)
        else:
            best = max(
                range(len(runs)),
                key=lambda t: (runs[t].p1 - runs[t].p0, -t),
            )
            out.append([runs[best]])
    return out
