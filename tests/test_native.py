"""Native C++ ingest: parity with the Python parser + speed sanity."""

import time

import numpy as np
import pytest

from shannon_tpu.io.fastx import write_fasta
from shannon_tpu.io.pack import pack_reads
from shannon_tpu.native import load, pack_file
from shannon_tpu.sim import random_seq


@pytest.fixture(scope="module")
def lib():
    lib = load()
    if lib is None:
        pytest.skip("native library unavailable (no compiler?)")
    return lib


def _py_batch(path, pad):
    from shannon_tpu.io.fastx import read_fastx

    return pack_reads([s for _, s in read_fastx(path)], pad)


def _assert_batches_equal(a, b):
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_array_equal(a.lengths, b.lengths)


def test_native_fasta_parity(rng, tmp_path, lib):
    seqs = [random_seq(rng, int(n)) for n in rng.integers(10, 150, size=50)]
    seqs[3] = seqs[3][:5] + "NnXx" + seqs[3][5:]  # invalid chars
    p = tmp_path / "r.fasta"
    write_fasta(p, [(f"r{i} desc", s) for i, s in enumerate(seqs)], width=37)
    _assert_batches_equal(pack_file(p, 128), _py_batch(p, 128))


def test_native_fastq_parity(rng, tmp_path, lib):
    seqs = [random_seq(rng, 100) for _ in range(40)]
    p = tmp_path / "r.fastq"
    with open(p, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
    _assert_batches_equal(pack_file(p, 128), _py_batch(p, 128))


def test_native_truncation(rng, tmp_path, lib):
    p = tmp_path / "r.fasta"
    write_fasta(p, [("long", random_seq(rng, 300))])
    b = pack_file(p, 64)
    assert b.lengths.tolist() == [64]
    _assert_batches_equal(b, _py_batch(p, 64))


def test_native_gzip_falls_back(rng, tmp_path):
    import gzip

    p = tmp_path / "r.fa.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(">a\nACGTACGT\n")
    b = pack_file(p, 16)
    assert b.sequences() == ["ACGTACGT"]


def test_native_missing_file(tmp_path):
    with pytest.raises(Exception):
        pack_file(tmp_path / "nope.fasta", 64)


def test_native_speedup(rng, tmp_path, lib):
    seqs = [random_seq(rng, 100) for _ in range(20000)]
    p = tmp_path / "big.fastq"
    with open(p, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
    t0 = time.perf_counter()
    nb = pack_file(p, 128)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    pb = _py_batch(p, 128)
    t_python = time.perf_counter() - t0
    _assert_batches_equal(nb, pb)
    assert t_native < t_python, (t_native, t_python)
