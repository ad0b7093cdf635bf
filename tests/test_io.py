"""I/O + encoding layer tests (reference L1; SURVEY.md §2)."""

import numpy as np

from shannon_tpu.io import (
    decode_seq,
    encode_seq,
    pack_reads,
    read_fasta,
    read_fastq,
    read_fastx,
    revcomp_str,
    write_fasta,
)
from shannon_tpu.io.dna import BASE_INVALID
from shannon_tpu.io.fastx import interleave_pairs


def test_encode_decode_roundtrip():
    s = "ACGTNacgtn"
    codes = encode_seq(s)
    assert codes.tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert decode_seq(codes) == "ACGTNACGTN"


def test_revcomp():
    assert revcomp_str("ACGT") == "ACGT"
    assert revcomp_str("AACC") == "GGTT"
    assert revcomp_str("ANT") == "ANT"
    s = "ACGTTGCATTAG"
    assert revcomp_str(revcomp_str(s)) == s


def test_fasta_roundtrip(tmp_path):
    recs = [("t1 desc", "ACGT" * 50), ("t2", "TTTTGGGG")]
    p = tmp_path / "x.fasta"
    assert write_fasta(p, recs, width=37) == 2
    back = list(read_fasta(p))
    assert back == recs
    assert list(read_fastx(p)) == recs


def test_fastq_parse(tmp_path):
    p = tmp_path / "x.fastq"
    p.write_text("@r1\nACGT\n+\nIIII\n@r2 x\nGGCC\n+r2\n!!!!\n")
    recs = list(read_fastq(p))
    assert recs == [("r1", "ACGT"), ("r2 x", "GGCC")]
    assert list(read_fastx(p)) == recs


def test_gzip_fasta(tmp_path):
    import gzip

    p = tmp_path / "x.fa.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(">a\nACGTAC\n")
    assert list(read_fastx(p)) == [("a", "ACGTAC")]


def test_interleave_pairs(tmp_path):
    l, r = tmp_path / "l.fa", tmp_path / "r.fa"
    write_fasta(l, [("a/1", "AAAA"), ("b/1", "CCCC")])
    write_fasta(r, [("a/2", "GGGG"), ("b/2", "TTTT")])
    recs = list(interleave_pairs(l, r))
    assert [s for _, s in recs] == ["AAAA", "GGGG", "CCCC", "TTTT"]


def test_pack_reads_padding():
    b = pack_reads(["ACGT", "AC", "ACGTACGTA"], pad_length=8)
    assert b.codes.shape == (3, 8)
    assert b.lengths.tolist() == [4, 2, 8]  # third truncated to pad
    assert (b.codes[0, 4:] == BASE_INVALID).all()
    assert b.sequences() == ["ACGT", "AC", "ACGTACGT"]


def test_pack_words():
    b = pack_reads(["ACGTACGTACGTACGTAC"], pad_length=32)
    w = b.packed_words()
    assert w.shape == (1, 2)
    # base j in bits [2j, 2j+2): A,C,G,T,... = 0,1,2,3 repeating
    expect0 = sum(((j % 4) << (2 * j)) for j in range(16))
    assert int(w[0, 0]) == expect0
    expect1 = sum(((j % 4) << (2 * j)) for j in range(2))  # only 'AC' left
    assert int(w[0, 1]) == expect1


def test_pad_to():
    b = pack_reads(["ACGT"], pad_length=8).pad_to(5)
    assert b.n_reads == 5
    assert b.lengths.tolist() == [4, 0, 0, 0, 0]
    assert (b.codes[1:] == BASE_INVALID).all()


def test_revcomp_code_rows_matches_per_read(rng):
    """The vectorized ragged RC (the single mate-2 normalizer) must be
    row-for-row identical to the scalar revcomp_codes."""
    from shannon_tpu.io.dna import BASE_INVALID, revcomp_code_rows, revcomp_codes

    n, pad = 64, 37
    lengths = rng.integers(0, pad + 1, size=n).astype(np.int32)
    codes = np.full((n, pad), BASE_INVALID, dtype=np.uint8)
    for i, li in enumerate(lengths):
        codes[i, :li] = rng.integers(0, 5, size=li)  # includes invalid bases
    rc = revcomp_code_rows(codes, lengths)
    for i, li in enumerate(lengths):
        assert (rc[i, :li] == revcomp_codes(codes[i, :li])).all()
        assert (rc[i, li:] == BASE_INVALID).all()


def test_normalize_mate2_matches_string_rc():
    from shannon_tpu.io.dna import revcomp_str
    from shannon_tpu.pipeline import normalize_mate2

    reads = ["ACGTACGT", "TTGCA", "GATTACA", "CCNGTT"]
    out = normalize_mate2(reads)
    assert out[0] == reads[0] and out[2] == reads[2]
    assert out[1] == revcomp_str(reads[1])
    assert out[3] == revcomp_str(reads[3])


def test_auto_pad_length_grid():
    from shannon_tpu.io.pack import auto_pad_length, pack_reads

    assert auto_pad_length(76) == 96
    assert auto_pad_length(100) == 128
    assert auto_pad_length(150) == 160
    assert auto_pad_length(151) == 160
    assert auto_pad_length(161) == 192
    b = pack_reads(["A" * 150, "C" * 80])  # default = auto
    assert b.pad_length == 160
    assert list(b.lengths) == [150, 80]  # nothing truncated
