"""Closed-form inner_index_of (device accumulate) vs the literal host quirks.

The device window code uses:
    front = x < L[0] ? 0 : min(lower_bound(L, x), size-1)
    back  = x > L[-1] ? size-1 : (found ? upper_bound(L,x)-1
                                        : min(lower_bound(L,x), size-1))
This test checks those formulas against BVec._inner_index_of (the literal
transcription of bvec.cpp:52-120) on random sorted arrays.
"""
import numpy as np

from meshclust_tpu.core.bvec import BVec


def _bv_single_bin(lens):
    bv = BVec(np.asarray(lens, np.int64), bin_size=10 ** 9)
    for i, ln in enumerate(lens):
        bv.insert(i, int(ln))
    bv.insert_finalize()
    return bv


def closed_front(L, x):
    if x < L[0]:
        return 0
    lb = int(np.searchsorted(L, x, side="left"))
    return min(lb, len(L) - 1)


def closed_back(L, x):
    if x > L[-1]:
        return len(L) - 1
    lb = int(np.searchsorted(L, x, side="left"))
    ub = int(np.searchsorted(L, x, side="right"))
    if ub > lb:
        return ub - 1
    return min(lb, len(L) - 1)


def test_closed_forms_match_reference_quirks(rng):
    for trial in range(300):
        n = int(rng.integers(1, 40))
        lens = np.sort(rng.integers(5, 60, size=n)).astype(np.int64)
        bv = _bv_single_bin(lens.tolist())
        L = bv.lens[0]
        x = int(rng.integers(0, 70))
        _, fi = bv._inner_index_of(x, 0, True, False)
        _, bi = bv._inner_index_of(x, 0, False, True)
        assert fi == closed_front(L, x), (L.tolist(), x, fi)
        assert bi == closed_back(L, x), (L.tolist(), x, bi)
