"""Device graph partitioning — the GPMETIS replacement (SURVEY.md §3.2
row 2): weakly-connected components of the contig graph by min-label
propagation + pointer jumping (iterated segment ops, no host round
trip).

The reference cuts the contig graph into ~equal pieces with METIS so a
process pool can chew them in parallel; independent assembly is only
*sound* per weakly-connected component, so the rebuild partitions into
exact components and treats load balance as a scheduling concern:
`bucket_components` groups components into padded size classes for
batched device processing (SURVEY.md §3.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shannon_tpu.ops.condense import ContigArrays


@jax.jit
def connected_components(ca: ContigArrays) -> jnp.ndarray:
    """Component label per contig lane: the minimum contig id reachable
    (undirected).  -1 on non-contig lanes."""
    C2 = ca.out_edges.shape[1]  # edges are [4, C2] base-first
    cid_iota = jax.lax.broadcasted_iota(jnp.int32, (C2, 1), 0)[:, 0]
    real = cid_iota < ca.n_contigs

    e_tgt = ca.out_edges  # [4, C2] base-first layout
    e_valid = (e_tgt >= 0) & real[None, :]
    e_src = jnp.broadcast_to(cid_iota[None, :], e_tgt.shape)
    src_f = jnp.where(e_valid, e_src, C2).reshape(-1)
    tgt_f = jnp.where(e_valid, e_tgt, C2).reshape(-1)

    label = jnp.where(real, cid_iota, jnp.int32(C2))
    n_rounds = max(C2.bit_length(), 1) + 2

    def body(_, label):
        lsrc = label[jnp.clip(src_f, 0, C2 - 1)]
        ltgt = label[jnp.clip(tgt_f, 0, C2 - 1)]
        # relax across edges, both directions
        label = label.at[src_f].min(
            jnp.where(src_f < C2, ltgt, C2), mode="drop"
        )
        label = label.at[tgt_f].min(
            jnp.where(tgt_f < C2, lsrc, C2), mode="drop"
        )
        # pointer-jump: labels are contig ids, chase them
        label = jnp.minimum(label, label[jnp.clip(label, 0, C2 - 1)])
        return label

    label = jax.lax.fori_loop(0, n_rounds, body, label)
    return jnp.where(real, label, -1)


def components_to_lists(labels: np.ndarray, n_contigs: int) -> list[list[int]]:
    """Host: component label array -> oracle-format component lists
    (sorted ids, ordered by minimum member = label)."""
    labels = np.asarray(labels[:n_contigs])
    order = np.argsort(labels, kind="stable")
    out: list[list[int]] = []
    prev = None
    for cid in order:
        l = labels[cid]
        if l != prev:
            out.append([])
            prev = l
        out[-1].append(int(cid))
    return out


def bucket_components(
    sizes: list[int], bucket_edges: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64)
) -> dict[int, list[int]]:
    """Group component indices into padded size classes (components of
    size <= edge go in bucket `edge`); oversized ones land in bucket 0
    (processed individually)."""
    buckets: dict[int, list[int]] = {}
    for i, s in enumerate(sizes):
        for e in bucket_edges:
            if s <= e:
                buckets.setdefault(e, []).append(i)
                break
        else:
            buckets.setdefault(0, []).append(i)
    return buckets
