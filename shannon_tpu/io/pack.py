"""Read batching/packing: host-side container crossing to the device.

The reference streams reads as text lines; the rebuild's device kernels need
fixed-shape arrays (SURVEY.md §8 hard part 2).  A ``ReadBatch`` is a padded
``[n, pad_length] uint8`` code matrix plus per-read lengths.  For transfer
efficiency a 2-bit-packed ``uint32`` word view (16 bases/word) is available;
the k-mer kernels accept either.

Padding convention: positions >= length hold ``BASE_INVALID`` so any k-mer
window touching padding is masked out by validity logic rather than shape
logic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

import numpy as np

from shannon_tpu.io.dna import BASE_INVALID, decode_seq, encode_seq


@dataclass
class ReadBatch:
    codes: np.ndarray  # [n, pad_length] uint8, BASE_INVALID-padded
    lengths: np.ndarray  # [n] int32
    paired: bool = False  # mate of read 2i is read 2i+1

    @property
    def n_reads(self) -> int:
        return int(self.codes.shape[0])

    @property
    def pad_length(self) -> int:
        return int(self.codes.shape[1])

    @property
    def total_bases(self) -> int:
        return int(self.lengths.sum())

    def sequences(self) -> list[str]:
        return [
            decode_seq(self.codes[i, : self.lengths[i]]) for i in range(self.n_reads)
        ]

    def packed_words(self) -> np.ndarray:
        """2-bit pack to [n, ceil(pad_length/16)] uint32, 16 bases/word,
        base j of a word in bits [2j, 2j+2) (little-endian in base index).
        Invalid bases pack as 0 — consumers must use `lengths` + the uint8
        view for validity; the packed view is a bandwidth optimization."""
        return pack_words(self.codes)

    def pad_to(self, n_reads: int) -> "ReadBatch":
        """Zero-length-pad the batch to exactly n_reads rows (static shapes
        for jit; padded rows produce no valid k-mers)."""
        if n_reads < self.n_reads:
            raise ValueError(f"cannot shrink batch {self.n_reads} -> {n_reads}")
        if n_reads == self.n_reads:
            return self
        codes = np.full((n_reads, self.pad_length), BASE_INVALID, dtype=np.uint8)
        codes[: self.n_reads] = self.codes
        lengths = np.zeros(n_reads, dtype=np.int32)
        lengths[: self.n_reads] = self.lengths
        return ReadBatch(codes=codes, lengths=lengths, paired=self.paired)


def pack_words(codes: np.ndarray) -> np.ndarray:
    """2-bit pack [n, L] uint8 codes to [n, ceil(L/16)] uint32 words,
    16 bases/word, base j of a word in bits [2j, 2j+2).  Invalid bases
    (code >= 4: mid-read N or padding) pack as 0; consumers recover
    validity from `lengths` plus invalid_mask_words when a batch has
    mid-read invalid bases.

    This is THE host->device transfer format of the hot path (SURVEY.md
    §8 M1 "2-bit-packed read batches"): the tunnel to this TPU moves
    ~30-40 MB/s, and the 100bp counting batch is 6.55MB as uint8 vs
    1.83MB packed — a 3.6x cut on the dominant cost of counting AND
    threading (BENCH_r03: 166ms/65k-read batch, of which ~15-40ms is
    compute)."""
    n, L = codes.shape
    W = (L + 15) // 16
    padded = np.zeros((n, W * 16), dtype=np.uint32)
    np.copyto(padded[:, :L], codes, casting="unsafe")
    padded[padded >= 4] = 0
    shifts = (2 * (np.arange(W * 16, dtype=np.uint32) % 16)).reshape(1, -1)
    return (padded << shifts).reshape(n, W, 16).sum(axis=2, dtype=np.uint32)


def invalid_mask_words(
    codes: np.ndarray, lengths: np.ndarray, force: bool = False
) -> np.ndarray | None:
    """Bit-packed mid-read-invalid mask for a packed batch: bit (j % 32)
    of word j // 32 is set where codes[i, j] >= 4 AND j < lengths[i]
    (an N inside the read — the only validity information pack_words
    loses; tail padding is recovered from `lengths` alone).  Returns
    None when the batch has no mid-read invalid bases (the overwhelming
    common case), so the mask upload and its separate device program
    are only paid when real N's exist.  force=True always returns the
    mask (multi-process callers need uniform program structure across
    hosts)."""
    n, L = codes.shape
    inread = np.arange(L, dtype=np.int32)[None, :] < np.asarray(
        lengths, np.int32
    )[:, None]
    bad = (codes >= 4) & inread
    if not force and not bad.any():
        return None
    W = (L + 31) // 32
    padded = np.zeros((n, W * 32), dtype=np.uint32)
    padded[:, :L] = bad
    shifts = (np.arange(W * 32, dtype=np.uint32) % 32).reshape(1, -1)
    return (padded << shifts).reshape(n, W, 32).sum(axis=2, dtype=np.uint32)


def auto_pad_length(max_len: int) -> int:
    """Pad grid for pad_length=0 (auto): the smallest multiple of 32
    >= max_len, floored at 96.  The coarse grid keeps the set of
    compiled device shapes dataset-independent (76-96bp libraries share
    the 96 pad, 100-128bp the classic 128, 129-160bp — incl. the
    dominant 150bp Illumina shape — 160), so auto mode never silently
    truncates and never mints a fresh XLA program per read length."""
    return max(96, 32 * ((max_len + 31) // 32))


def pack_reads(
    seqs: Iterable[str] | Sequence[str],
    pad_length: int = 0,
    paired: bool = False,
) -> ReadBatch:
    """Encode + pad a list of sequences into a ReadBatch.

    pad_length=0 (auto): sized to the longest read on the 32-base grid
    (auto_pad_length) — no truncation ever.  Explicit pad_length:
    longer reads are truncated (callers surface the count; see
    pipeline stats); shorter reads are BASE_INVALID-padded.
    """
    seq_list = list(seqs)
    n = len(seq_list)
    if pad_length == 0:
        pad_length = auto_pad_length(
            max((len(s) for s in seq_list), default=1)
        )
    codes = np.full((n, pad_length), BASE_INVALID, dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    for i, s in enumerate(seq_list):
        enc = encode_seq(s)[:pad_length]
        codes[i, : len(enc)] = enc
        lengths[i] = len(enc)
    return ReadBatch(codes=codes, lengths=lengths, paired=paired)
