"""Trainer pipeline units: balancing, binning, rounding, training gates."""
import math

import numpy as np
import pytest

from meshclust_tpu.core import trainer as T


def test_cxx_round():
    assert T._cxx_round(0.5) == 1
    assert T._cxx_round(1.5) == 2
    assert T._cxx_round(2.5) == 3      # C++ rounds half away from zero
    assert T._cxx_round(-0.5) == -1
    assert T._cxx_round(2.4) == 2


def test_resize_vec_identity():
    vec = [((1, 2), 0.95), ((3, 4), 0.92)]
    out = T.resize_vec(vec, 2, 0.9, 1.0, 5)
    assert out == vec


def test_resize_vec_downsample_takes_from_top_bins():
    vec = [((i, i + 100), 0.90 + 0.001 * i) for i in range(100)]
    out = T.resize_vec(vec, 10, 0.9, 1.0, 5)
    assert len(out) >= 10
    # top-bin items (identity >= 0.98) must be present
    top = [pr for pr, x in out if x >= 0.98]
    assert top


def test_resize_vec_can_overshoot_with_duplicates():
    # faithful to Trainer.cpp:231-240: while-loop refills from bin prefixes
    vec = [((i, i + 10), 0.91) for i in range(3)]   # all in one bin
    out = T.resize_vec(vec, 7, 0.9, 1.0, 5)
    assert len(out) >= 7
    keys = [pr for pr, _ in out]
    # bin prefixes are re-taken each pass: duplicates, not full coverage
    assert len(set(keys)) < len(keys)


def test_bin_data_alternation():
    vec = [((i, i + 10), 0.90 + 0.01 * (i % 10)) for i in range(40)]
    train, test = T.bin_data(vec, 0.9, 1.0)
    assert len(train) + len(test) == 40
    assert abs(len(train) - len(test)) <= 10


def test_get_bin_bounds():
    assert T._get_bin(1.5, 0.0, 1.0, 10) == 9
    assert T._get_bin(-1.0, 0.0, 1.0, 10) == 0
    assert T._get_bin(0.55, 0.0, 1.0, 10) == 5
