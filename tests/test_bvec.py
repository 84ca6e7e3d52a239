"""BVec store emulation semantics."""
import numpy as np

from meshclust_tpu.core.bvec import BVec


def _make(lengths, bin_size=4):
    bv = BVec(np.asarray(lengths), bin_size)
    for i, ln in enumerate(lengths):
        bv.insert(i, ln)
    bv.insert_finalize()
    return bv


def test_insert_and_pop_order():
    lengths = [50, 10, 30, 20, 40, 60, 15, 25]
    bv = _make(lengths, bin_size=4)
    assert bv.size() == 8
    # pop returns the first element of the first non-empty bin — the
    # shortest lengths live in bin 0
    first = bv.pop()
    assert lengths[first] == min(lengths)


def test_get_range_inclusive_window():
    lengths = [10, 20, 30, 40, 50, 60, 70, 80]
    bv = _make(lengths, bin_size=100)  # single bin
    front, back = bv.get_range(25, 65)
    window = [bv.idx[r][c] for r, c in bv.iter_range(front, back)]
    wl = sorted(lengths[i] for i in window)
    # binary-search boundary slop may include one element just outside
    assert set([30, 40, 50, 60]) <= set(wl)
    assert all(20 <= x <= 70 for x in wl)


def test_mark_and_remove_available():
    lengths = [10, 20, 30, 40]
    bv = _make(lengths, bin_size=100)
    front, back = bv.get_range(0, 100)
    positions = list(bv.iter_range(front, back))
    bv.mark(*positions[1])
    bv.mark(*positions[3])
    got = bv.remove_available(front, back)
    assert len(got) == 2
    assert bv.size() == 2


def test_erase_and_empty():
    lengths = [10, 20]
    bv = _make(lengths, bin_size=100)
    bv.erase(0, 0)
    bv.erase(0, 0)
    assert bv.empty()
    assert bv.pop() is None


def test_empty_range_yields_nothing():
    lengths = [10, 20]
    bv = _make(lengths, bin_size=100)
    bv.pop()
    bv.pop()
    front, back = bv.get_range(5, 50)
    assert list(bv.iter_range(front, back)) == []


def test_multi_bin_structure():
    rng = np.random.default_rng(0)
    lengths = rng.integers(100, 1000, size=57).tolist()
    bv = _make(lengths, bin_size=10)
    assert len(bv.begin_bounds) == 6
    # all points present exactly once
    all_idx = sorted(int(i) for b in bv.idx for i in b)
    assert all_idx == list(range(57))
    # bins sorted by length internally
    for b in range(len(bv.idx)):
        assert list(bv.lens[b]) == sorted(bv.lens[b])


def _oracle_bvec(lengths, bin_size):
    bv = BVec(np.asarray(lengths), bin_size)
    for i, ln in enumerate(lengths):
        bv.insert(i, int(ln))
    bv.insert_finalize()
    return bv


def _bulk_bvec(lengths, bin_size):
    bv = BVec(np.asarray(lengths), bin_size)
    bv.bulk_insert(np.asarray(lengths))
    bv.insert_finalize()
    return bv


def test_bulk_insert_matches_per_insert_oracle():
    rng = np.random.default_rng(7)
    cases = [
        rng.integers(100, 2000, size=500),          # varied lengths
        np.full(500, 777),                          # all identical (max ties)
        np.repeat(rng.integers(100, 300, size=10), 50),  # heavy duplication
        rng.integers(100, 110, size=333),           # narrow range
    ]
    for lengths in cases:
        for bin_size in (50, 100, 1000):
            a = _oracle_bvec(lengths, bin_size)
            b = _bulk_bvec(lengths, bin_size)
            assert len(a.idx) == len(b.idx)
            for x, y in zip(a.idx, b.idx):
                assert np.array_equal(np.asarray(x), np.asarray(y))


def test_bulk_insert_python_fallback_matches(monkeypatch):
    from meshclust_tpu import native
    monkeypatch.setattr(native, "bvec_targets", lambda *a: None)
    rng = np.random.default_rng(11)
    lengths = np.repeat(rng.integers(100, 200, size=7), 40)
    a = _oracle_bvec(lengths, 60)
    b = _bulk_bvec(lengths, 60)
    for x, y in zip(a.idx, b.idx):
        assert np.array_equal(np.asarray(x), np.asarray(y))
