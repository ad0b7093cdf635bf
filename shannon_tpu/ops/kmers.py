"""Two-word k-mer primitives + windowed extraction (device).

Oracle parity target: shannon_tpu.oracle.counting (binding spec there).
A k-mer value is 2k bits, carried as (hi, lo) uint32 where lo = bits
[0, 32), hi = bits [32, 2k).  k <= 31 on device so the all-ones sentinel
(used for invalid/padding lanes) can never collide with a real k-mer.

Extraction is carry-free: base i of a window contributes code << 2(k-1-i)
with a *static* shift, so the whole [reads, windows] plane is k fused
vector ops — no scan, no data-dependent control flow (XLA-friendly;
SURVEY.md §8).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalars, NOT jnp: a module-level jnp scalar initializes the XLA
# backend at import time, which breaks jax.distributed.initialize in
# multi-process launches (it must run before any backend query); inside
# jit a numpy scalar is the same uint32 constant
SENTINEL = np.uint32(0xFFFFFFFF)

_M2 = np.uint32(0x33333333)
_M4 = np.uint32(0x0F0F0F0F)
_M8 = np.uint32(0x00FF00FF)


def _rev2_32(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the sixteen 2-bit groups within each uint32 lane."""
    x = ((x & _M2) << 2) | ((x >> 2) & _M2)
    x = ((x & _M4) << 4) | ((x >> 4) & _M4)
    x = ((x & _M8) << 8) | ((x >> 8) & _M8)
    return (x << 16) | (x >> 16)


def _masks(k: int) -> tuple[int, int]:
    """(hi_mask, lo_mask) of used bits for a k-mer."""
    bits = 2 * k
    lo_mask = 0xFFFFFFFF if bits >= 32 else (1 << bits) - 1
    hi_mask = (1 << (bits - 32)) - 1 if bits > 32 else 0
    return hi_mask, lo_mask


def revcomp_hilo(hi: jnp.ndarray, lo: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reverse complement in packed two-word space (matches oracle
    revcomp_kmer).  rc(v) = reverse-2bit-groups(~v) >> (64 - 2k)."""
    hi_mask, lo_mask = _masks(k)
    ch = (~hi) & jnp.uint32(hi_mask)
    cl = (~lo) & jnp.uint32(lo_mask)
    r_hi = _rev2_32(cl)  # 64-bit 2-bit-group reversal swaps the words
    r_lo = _rev2_32(ch)
    s = 64 - 2 * k  # static
    if s == 0:
        return r_hi, r_lo
    if s < 32:
        out_lo = (r_lo >> s) | (r_hi << (32 - s))
        out_hi = r_hi >> s
    else:
        out_lo = r_hi >> (s - 32)
        out_hi = jnp.zeros_like(r_hi)
    return out_hi, out_lo


def canonical_hilo(
    hi: jnp.ndarray, lo: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """min(v, rc(v)) lexicographic on (hi, lo)."""
    rhi, rlo = revcomp_hilo(hi, lo, k)
    take_fwd = (hi < rhi) | ((hi == rhi) & (lo <= rlo))
    return jnp.where(take_fwd, hi, rhi), jnp.where(take_fwd, lo, rlo)


def _windows_from_c32(
    c32: jnp.ndarray,  # [n, L] uint32 base codes
    bad: jnp.ndarray | None,  # [n, L] bool invalid-position mask, or None
    lengths: jnp.ndarray,
    k: int,
    canonical: bool,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared window assembly behind extract_kmers / extract_kmers_packed:
    k static shifted ORs build (hi, lo) for every window, validity from
    the per-position invalid mask (None = every position 0..3) plus the
    window-fits-in-read check."""
    n, L = c32.shape
    W = L - k + 1
    if W <= 0:
        raise ValueError(f"pad_length {L} < k {k}")
    hi = jnp.zeros((n, W), dtype=jnp.uint32)
    lo = jnp.zeros((n, W), dtype=jnp.uint32)
    valid = jnp.ones((n, W), dtype=bool)
    for i in range(k):  # static unroll: k fused vector ops
        ci = c32[:, i : i + W]
        if bad is not None:
            valid &= ~bad[:, i : i + W]
        s = 2 * (k - 1 - i)
        if s >= 32:
            hi = hi | ((ci & 3) << (s - 32))
        else:
            lo = lo | ((ci & 3) << s)
    # window must fit inside the read
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, W), 1)
    valid &= idx + k <= lengths[:, None]
    if canonical:
        hi, lo = canonical_hilo(hi, lo, k)
    hi = jnp.where(valid, hi, SENTINEL)
    lo = jnp.where(valid, lo, SENTINEL)
    return hi, lo, valid


@partial(jax.jit, static_argnames=("k", "canonical"))
def extract_kmers(
    codes: jnp.ndarray,  # [n, L] uint8 base codes (>=4 invalid)
    lengths: jnp.ndarray,  # [n] int32
    k: int,
    canonical: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All windows' k-mers: returns (hi, lo, valid), each [n, L-k+1].

    Invalid windows (containing a non-ACGT code or extending past the
    read length) have (hi, lo) = SENTINEL and valid = False.
    """
    c32 = codes.astype(jnp.uint32)
    return _windows_from_c32(c32, c32 >= 4, lengths, k, canonical)


def unpack_words_device(words: jnp.ndarray, length: int) -> jnp.ndarray:
    """[n, ceil(L/16)] uint32 packed words -> [n, L] uint32 codes 0..3
    (io.pack.pack_words layout).  16 static shifts; XLA fuses the
    unpack into whatever consumes the codes, so the packed upload costs
    no extra memory pass on device."""
    n, Ww = words.shape
    shifts = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
    c = (words[:, :, None] >> shifts) & jnp.uint32(3)
    return c.reshape(n, Ww * 16)[:, :length]


def unpack_mask_device(mask: jnp.ndarray, length: int) -> jnp.ndarray:
    """[n, ceil(L/32)] uint32 bit mask -> [n, L] bool (io.pack
    .invalid_mask_words layout)."""
    n, Wm = mask.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    b = (mask[:, :, None] >> shifts) & jnp.uint32(1)
    return b.reshape(n, Wm * 32)[:, :length].astype(bool)


@partial(jax.jit, static_argnames=("k", "canonical", "length"))
def extract_kmers_packed(
    words: jnp.ndarray,  # [n, ceil(L/16)] uint32 packed codes
    lengths: jnp.ndarray,  # [n] int32
    k: int,
    canonical: bool = True,
    length: int | None = None,
    mask: jnp.ndarray | None = None,  # [n, ceil(L/32)] uint32 or None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """extract_kmers over the 2-bit transfer format (io.pack.pack_words)
    — bit-identical output to extract_kmers on the uint8 codes the words
    were packed from.  mask=None asserts the batch has no mid-read
    invalid bases (the host driver checks via invalid_mask_words); with
    a mask, windows touching a masked position are invalidated exactly
    like the uint8 path's `code >= 4` check."""
    if length is None:
        length = 16 * words.shape[1]
    c32 = unpack_words_device(words, length)
    bad = None if mask is None else unpack_mask_device(mask, length)
    return _windows_from_c32(c32, bad, lengths, k, canonical)


def hilo_to_int(hi, lo) -> "jnp.ndarray":
    """Host-side helper: combine to python-int-compatible uint64 (numpy)."""
    import numpy as np

    return (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        lo, dtype=np.uint64
    )
