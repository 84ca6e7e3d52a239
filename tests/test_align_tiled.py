"""Blockwise-tiled long-pair aligner vs the XLA-scan oracle.

Tiny tiles (H=W=128) on medium pairs force every boundary path — strip-to-
strip (top), tile-to-tile (left scratch), and corner — through multiple
tiles; results must be bit-equal to ops/align.align_identity_batch
(GlobAlignE semantics)."""
import numpy as np
import pytest

from meshclust_tpu.ops import align as A
from meshclust_tpu.ops.align_tiled import (align_long_batch,
                                           align_long_identities)


def _pairs(rng, n, lo, hi, related=True):
    out = []
    for _ in range(n):
        la = int(rng.integers(lo, hi))
        a = rng.integers(0, 4, size=la).astype(np.uint8)
        if related:
            b = a.copy()
            pos = rng.integers(0, la, size=max(1, la // 12))
            b[pos] = (b[pos] + 1 + rng.integers(0, 3, size=pos.shape)) % 4
            b = b[: int(rng.integers(la - la // 10, la))]
        else:
            b = rng.integers(0, 4, size=int(rng.integers(lo, hi))
                             ).astype(np.uint8)
        out.append((a, b))
    return out


@pytest.mark.parametrize("related", [True, False])
def test_tiled_matches_xla_multitile(rng, related):
    pairs = _pairs(rng, 9, 180, 520, related=related)
    want = A.align_identity_batch(pairs)
    alen, amatch = align_long_batch(pairs, tile_h=128, tile_w=128,
                                    interpret=True)
    got = amatch.astype(np.float64) / np.maximum(alen, 1.0)
    np.testing.assert_array_equal(got, want)


def test_tiled_single_tile_and_degenerate(rng):
    """Pairs small enough for one tile, plus a 1bp degenerate lane."""
    pairs = _pairs(rng, 3, 40, 100) + [
        (np.zeros(1, np.uint8), np.zeros(1, np.uint8))]
    want = A.align_identity_batch(pairs)
    got = align_long_identities(pairs, interpret=True)
    np.testing.assert_array_equal(got, want)


def test_tiled_rectangular_tiles(rng):
    """H != W exercises asymmetric export windows."""
    pairs = _pairs(rng, 4, 250, 400)
    want = A.align_identity_batch(pairs)
    alen, amatch = align_long_batch(pairs, tile_h=128, tile_w=256,
                                    interpret=True)
    got = amatch.astype(np.float64) / np.maximum(alen, 1.0)
    np.testing.assert_array_equal(got, want)
