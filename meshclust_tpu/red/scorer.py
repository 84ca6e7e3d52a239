"""Per-position genome scoring (reference Scorer, SURVEY R4; Scorer.cpp).

scores[p] = adjusted count of the k-mer starting at p, for p inside a
segment; the last k-1 positions of each segment repeat the previous value;
positions outside segments (N runs) stay 0. takeLog: ceil(log(v)/log(base))
for v != 0, with base 1 handled as log(1.5) and v == 1 left unchanged.
"""
from __future__ import annotations

import math

import numpy as np

from meshclust_tpu.io import fasta as fio


def score_chromosome(seq: fio.Sequence, table: np.ndarray, k: int
                     ) -> np.ndarray:
    scores = np.zeros(seq.length, np.int64)
    codes = seq.codes.astype(np.int64)
    powers = 4 ** np.arange(k - 1, -1, -1, dtype=np.int64)
    for a, b in seq.segments:
        seg = codes[a: b + 1]
        n = seg.shape[0] - k + 1
        if n > 0:
            ids = np.zeros(n, np.int64)
            for d in range(k):
                ids += seg[d: d + n] * powers[d]
            scores[a: a + n] = table[ids]
            scores[a + n: b + 1] = scores[a + n - 1]
        else:
            # segment shorter than k: reference reads the previous value
            # (scores[i-1]) cascading from before the segment (0 there)
            scores[a: b + 1] = scores[a - 1] if a > 0 else 0
    return scores


def take_log(scores: np.ndarray, seq: fio.Sequence, base: float
             ) -> np.ndarray:
    """Scorer::takeLog semantics, in place on a copy."""
    out = scores.copy()
    is_one = abs(base - 1.0) < np.finfo(float).eps
    log_base = math.log(1.5) if is_one else math.log(base)
    for a, b in seq.segments:
        v = out[a: b + 1]
        mask = v != 0
        if is_one:
            mask = mask & (v > 1)
        vv = v[mask].astype(np.float64)
        v[mask] = np.ceil(np.log(vv) / log_base).astype(np.int64)
        out[a: b + 1] = v
    return out
