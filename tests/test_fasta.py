"""FASTA front-end semantics vs the reference's Chromosome pipeline."""
import numpy as np
import pytest

from meshclust_tpu.errors import FileDoesNotExistError, InvalidInputError
from meshclust_tpu.io import fasta


def test_basic_parse(make_fasta):
    path = make_fasta([("seq1 desc", "ACGT" * 10), ("seq2", "TTTT" * 10)])
    recs = fasta.read_fasta(path)
    assert len(recs) == 2
    assert recs[0].header == ">seq1 desc"
    assert recs[0].length == 40
    np.testing.assert_array_equal(recs[0].codes[:4], [0, 1, 2, 3])
    assert recs[0].segments.tolist() == [[0, 39]]


def test_crlf_and_multiline(tmp_path):
    p = tmp_path / "crlf.fasta"
    p.write_bytes(b">s1\r\nACGTACGTACGTACGTACGT\r\nACGTACGTACGTACGTACGT\r\n")
    recs = fasta.read_fasta(str(p))
    assert len(recs) == 1
    assert recs[0].length == 40


def test_lowercase_and_iupac():
    rec = fasta.encode_record(">x", b"acgt" + b"RYMKSWHBVDX" + b"ACGT" * 10)
    # R->G Y->C M->A K->T S->G W->T H->C B->T V->A D->T X->G
    np.testing.assert_array_equal(
        rec.codes[4:15], [2, 1, 0, 3, 2, 3, 1, 3, 0, 3, 2]
    )


def test_invalid_nucleotide_raises():
    with pytest.raises(InvalidInputError):
        fasta.encode_record(">x", b"ACGTQ" + b"A" * 30)


def test_n_segmentation_merge_and_drop():
    # 25 good, 5 Ns (gap < 10 merges), 25 good, 30 Ns, 10 good (dropped: < 20)
    seq = b"A" * 25 + b"N" * 5 + b"C" * 25 + b"N" * 30 + b"G" * 10
    rec = fasta.encode_record(">x", seq)
    # gap of 5 merges [0,24] + [30,54] into [0,54]; [85,94] dropped (10 < 20)
    assert rec.segments.tolist() == [[0, 54]]
    # N inside a merged segment is encoded via the codes map (N->C == 1);
    # N outside any segment keeps the literal 'N' byte
    assert rec.codes[25] == 1
    assert rec.codes[84] == fasta.N_BYTE
    # trailing G segment encoded anyway (non-segment non-N chars are encoded)
    assert rec.codes[85] == 2


def test_all_n_record_skipped(make_fasta):
    path = make_fasta([("bad", "N" * 100), ("good", "ACGT" * 30)])
    recs = fasta.read_fasta(path)
    assert len(recs) == 2          # record kept; it just has no segments
    assert recs[0].segments.shape == (0, 2)


def test_chunking():
    rec = fasta.encode_record(">x", b"A" * 2_500_000)
    # fragNum = 2 -> [0, 1e6-1], [1e6, 2.5e6-1] (last absorbs remainder)
    assert rec.segments.tolist() == [[0, 999_999], [1_000_000, 2_499_999]]


def test_kmer_valid_starts():
    seq = b"A" * 25 + b"N" * 15 + b"C" * 25
    rec = fasta.encode_record(">x", seq)
    assert rec.segments.tolist() == [[0, 24], [40, 64]]
    k = 4
    v = fasta.kmer_valid_starts(rec, k)
    assert v[: 25 - k + 1].all() and not v[25 - k + 1: 40].any()
    assert v[40: 65 - k + 1].all() and not v[65 - k + 1:].any()
    assert v.sum() == 2 * (25 - k + 1)


def test_missing_file():
    with pytest.raises(FileDoesNotExistError):
        fasta.read_fasta("/nonexistent/file.fa")


def test_chunk_boundary_is_adjacent():
    rec = fasta.encode_record(">x", b"A" * 2_000_000)
    assert rec.segments.tolist() == [[0, 999_999], [1_000_000, 1_999_999]]
    k = 5
    v = fasta.kmer_valid_starts(rec, k)
    # k-mers spanning the chunk boundary are NOT counted (ref fill_table
    # iterates per segment chunk)
    assert not v[999_996:1_000_000].any()
    assert v[1_000_000]


def test_read_fasta_plain_header_continuation(tmp_path):
    """makeChromList semantics (ChromListMaker.cpp:49-89): leading space/tab
    lines continue the header (all-whitespace skipped), original letters are
    kept (uppercased), IUPAC codes survive verbatim."""
    from meshclust_tpu.io.fasta import read_fasta_plain
    p = tmp_path / "cont.fa"
    p.write_text(">chr1 part\n\tcontinued header\n   \nacgtRYacgt\n"
                 ">chr2\nACGTNNAC\n")
    recs = read_fasta_plain(str(p))
    assert len(recs) == 2
    h1, s1 = recs[0]
    assert h1 == ">chr1 part\tcontinued header"
    assert s1 == "ACGTRYACGT"          # uppercased, IUPAC preserved
    assert recs[1] == (">chr2", "ACGTNNAC")
