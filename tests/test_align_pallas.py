"""Pallas wavefront aligner (interpret mode) vs the scalar GlobAlignE oracle.

The TPU-compiled path is exercised by bench/golden runs on hardware; these
tests pin the kernel's math on any backend via the Pallas interpreter.
"""
import numpy as np
import pytest

from meshclust_tpu.ops.align_pallas import align_batch_128
from tests import ref_impl


def _codes(rng, n, n_prob=0.0):
    c = rng.integers(0, 4, size=n).astype(np.uint8)
    if n_prob:
        c[rng.random(n) < n_prob] = 78
    return c


@pytest.mark.parametrize("trial", range(3))
def test_random_pairs_match_oracle(rng, trial):
    pairs = []
    for _ in range(14):
        la = int(rng.integers(3, 80))
        lb = int(rng.integers(3, 80))
        pairs.append((_codes(rng, la, 0.05), _codes(rng, lb, 0.05)))
    ident = align_batch_128(pairs, 80, 80, interpret=True)
    for i, (a, b) in enumerate(pairs):
        _, el, em, _ = ref_impl.glob_align(a, b)
        assert abs(ident[i] - em / max(el, 1)) < 1e-12, f"pair {i}"


def test_degenerate_and_identical(rng):
    s = _codes(rng, 40)
    pairs = [(s, s), (s[:1], s[:1]), (s, s[:20])]
    ident = align_batch_128(pairs, 64, 64, interpret=True)
    assert ident[0] == 1.0
    assert ident[1] == 1.0
    for i, (a, b) in enumerate(pairs):
        _, el, em, _ = ref_impl.glob_align(a, b)
        assert abs(ident[i] - em / max(el, 1)) < 1e-12


def test_matches_xla_scan_path(rng):
    """Pallas kernel == the XLA batch_align path on the same pairs."""
    from meshclust_tpu.ops import align as A
    pairs = []
    for _ in range(10):
        la = int(rng.integers(10, 120))
        lb = int(rng.integers(10, 120))
        pairs.append((_codes(rng, la), _codes(rng, lb)))
    got = align_batch_128(pairs, 128, 128, interpret=True)
    exp = A.align_identity_batch(pairs)
    np.testing.assert_allclose(got, exp, atol=1e-12)
