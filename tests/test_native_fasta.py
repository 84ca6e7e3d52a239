"""Native C++ FASTA parser vs the numpy oracle: byte-equal outputs."""
import os

import numpy as np
import pytest

from meshclust_tpu.io import fasta as fio


def _numpy_parse(path):
    os.environ["MESHCLUST_NATIVE"] = "0"
    try:
        return fio.read_fasta(path)
    finally:
        os.environ["MESHCLUST_NATIVE"] = "1"


def _native_parse(path):
    from meshclust_tpu import native
    parsed = native.parse_fasta_native(path)
    assert parsed is not None, "native parser unavailable"
    headers, codes, rec_off, segs, seg_off = parsed
    return [
        fio.Sequence(header=h, codes=codes[rec_off[i]: rec_off[i + 1]],
                     segments=segs[seg_off[i]: seg_off[i + 1]])
        for i, h in enumerate(headers)
    ]


def _assert_equal(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra.header == rb.header
        np.testing.assert_array_equal(ra.codes, rb.codes)
        np.testing.assert_array_equal(ra.segments, rb.segments)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_bytes(text if isinstance(text, bytes) else text.encode())
    return str(p)


def test_native_available():
    from meshclust_tpu import native
    assert native.get_lib() is not None


def test_simple_and_multiline(tmp_path):
    p = _write(tmp_path, "a.fasta",
               ">r1 desc\nACGTACGTACGTACGTACGTACGT\n"
               ">r2\nacgt\nACGTACGTACGTACGTACGT\nACGT\n")
    _assert_equal(_native_parse(p), _numpy_parse(p))


def test_n_runs_merge_drop_and_outside_n(tmp_path):
    seq = ("ACGT" * 10 + "N" * 3 + "ACGT" * 8          # gap 3 < 10: merged
           + "N" * 50                                   # real break
           + "ACGTACG"                                  # 7bp: dropped
           + "N" * 30
           + "ACGT" * 20)
    p = _write(tmp_path, "n.fasta", f">n1\n{seq}\n>n2\n{'N' * 40}\n")
    _assert_equal(_native_parse(p), _numpy_parse(p))


def test_iupac_lowercase_crlf(tmp_path):
    p = _write(tmp_path, "c.fasta",
               b">w\r\nryMKswhbvdxACGT\r\nACGTACGTACGTACGT\r\n")
    nat = _native_parse(p)
    # numpy fast path refuses \r files and uses streaming — still the oracle
    ref = _numpy_parse(p)
    _assert_equal(nat, ref)


def test_tiny_and_empty_records(tmp_path):
    p = _write(tmp_path, "t.fasta",
               ">tiny\nACGTAC\n>empty\n>ok\n" + "ACGT" * 30 + "\n")
    nat = _native_parse(p)
    ref = _numpy_parse(p)
    _assert_equal(nat, ref)
    assert nat[0].segments.shape[0] == 0      # <20bp: empty segment list
    assert len(nat) == 2                      # empty record skipped


def test_invalid_char_falls_back_to_numpy_error(tmp_path):
    from meshclust_tpu import native
    p = _write(tmp_path, "bad.fasta", ">b\nACGTQACGTACGTACGTACGT\n")
    assert native.parse_fasta_native(p) is None
    with pytest.raises(Exception):
        _numpy_parse(p)


def test_long_segment_chunking(tmp_path):
    rng = np.random.default_rng(0)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=2_100_000))
    p = _write(tmp_path, "big.fasta", f">big\n{seq}\n")
    _assert_equal(_native_parse(p), _numpy_parse(p))


def test_read_fasta_routes_native(tmp_path):
    p = _write(tmp_path, "r.fasta", ">x\n" + "ACGT" * 30 + "\n")
    recs = fio.read_fasta(p)
    assert len(recs) == 1 and recs[0].length == 120
