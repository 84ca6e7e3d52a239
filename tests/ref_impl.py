"""Scalar numpy oracles transcribing the reference's numeric semantics.

These are slow, literal reimplementations used ONLY as test oracles:
- k-mer histogram fill (KmerHashTable + fill_table)
- DivergencePoint distances (DivergencePoint.cpp:53-81)
- the Feature raw statistics (Feature.cpp)
- GlobAlignE affine-gap identity with exact tie-breaking (GlobAlignE.cpp)
"""
from __future__ import annotations

import math

import numpy as np


def hist_oracle(codes: np.ndarray, segments: np.ndarray, k: int,
                init: int = 1) -> np.ndarray:
    """Direct per-segment k-mer counting (fill_table semantics)."""
    V = 4 ** k
    counts = np.full(V, init, dtype=np.int64)
    powers = 4 ** np.arange(k - 1, -1, -1, dtype=np.int64)
    for s, e in segments:
        for p in range(s, e - k + 2):
            window = codes[p: p + k].astype(np.int64)
            counts[int((window * powers).sum())] += 1
    return counts


def distance_oracle(p: np.ndarray, q: np.ndarray) -> int:
    """DivergencePoint::distance: uint64(10000 * (1 - f^2)),
    f = 2*sum(min)/ (mag_p + mag_q)."""
    dist = 2 * np.minimum(p, q).astype(np.int64).sum()
    mag = p.astype(np.int64).sum() + q.astype(np.int64).sum()
    frac = float(dist) / float(mag)
    return int(10000.0 * (1.0 - frac * frac))


def distance_d_oracle(p: np.ndarray, c: np.ndarray) -> float:
    """DivergencePoint::distance_d vs a double-valued mean point, with the
    reference's per-element truncation (DivergencePoint.cpp:53-65):
    dist += 2*min(p_i, (T)c_i); mag += uint64(p_i + c_i)."""
    dist = 0
    mag = 0
    for pi, ci in zip(p.tolist(), c.tolist()):
        dist += 2 * min(int(pi), int(ci))    # (T)c_i truncates toward zero
        mag += int(pi + ci)                  # uint64(double sum) truncates
    frac = dist / mag
    return 10000.0 * (1.0 - frac * frac)


# --- Feature raw statistics (Feature.cpp) ---------------------------------

def intersection(p, q, magp, magq):
    dist = 2 * int(np.minimum(p, q).astype(np.int64).sum())
    return dist / (magp + magq)


def manhattan(p, q):
    return float(np.abs(p.astype(np.int64) - q.astype(np.int64)).sum())


def length_difference(lp, lq):
    return float(abs(lp - lq))


def pearson(p, q, magp, magq):
    N = p.shape[0]
    ap = round(magp / N)
    aq = round(magq / N)
    dp = p.astype(np.int64) - ap
    dq = q.astype(np.int64) - aq
    np_ = int((dp * dp).sum())
    nq_ = int((dq * dq).sum())
    dot = int((dp * dq).sum())
    prod = float(np_ * nq_)
    return dot / math.sqrt(max(0.5, prod))


def simratio(p, q):
    p64 = p.astype(np.int64)
    q64 = q.astype(np.int64)
    dot = int((p64 * q64).sum())
    diff = p64 - q64
    norm2 = int((diff * diff).sum())
    return dot / (dot + math.sqrt(norm2))


def squaredchord(p, q):
    p64 = p.astype(np.float64)
    q64 = q.astype(np.float64)
    return float((p64 + q64 - 2 * np.sqrt(p64 * q64)).sum())


def kulczynski2(p, q, magp, magq):
    N = p.shape[0]
    ap = magp / N
    aq = magq / N
    min_sum = int(np.minimum(p, q).astype(np.int64).sum())
    coeff = N * (ap + aq) / (2 * ap * aq)
    return coeff * min_sum


def jenson_shannon(p, q, magp, magq):
    """Exact-log variant (the table at Trainer.h:17-24 approximates
    log(pp/avg); see ops/features.py for the table-equivalent)."""
    pp = p.astype(np.float64) / magp
    pq = q.astype(np.float64) / magq
    avg = 0.5 * (pp + pq)
    return float((pp * np.log(pp / avg) + pq * np.log(pq / avg)).sum()) / 2


def rree_k_r(p, q):
    def fastlog2(x):
        x = np.asarray(x, np.float32)
        vx = x.view(np.uint32).astype(np.int64)
        mx = ((vx & 0x007FFFFF) | (0x7E << 23)).astype(np.uint32)
        mxf = mx.view(np.float32).astype(np.float64)
        y = vx.astype(np.float64) * (1.0 / (1 << 23))
        return y - 124.22544637 - 1.498030302 * mxf - 1.72587999 / (
            0.3520887068 + mxf)

    N = p.shape[0]
    op = 0.0
    oq = 0.0
    for off in range(0, N, 4):
        ps = int(p[off:off + 4].astype(np.int64).sum())
        qs = int(q[off:off + 4].astype(np.int64).sum())
        ip = 0.0
        iq = 0.0
        for j in range(4):
            cp = float(p[off + j]) / ps
            cq = float(q[off + j]) / qs
            avg = 0.5 * (cp + cq)
            ip += cp * float(fastlog2(np.float32(cp / avg))) / 2
            iq += cq * float(fastlog2(np.float32(cq / avg))) / 2
        op += ip
        oq += iq
    return 0.5 * (op + oq)


# --- GlobAlignE oracle -----------------------------------------------------

def glob_align(seq1: np.ndarray, seq2: np.ndarray, match=1, mismatch=-1,
               go=2, gc=1):
    """Literal transcription of GlobAlignE::findAlignment (GlobAlignE.cpp:123-292).

    seq1/seq2: uint8 code arrays ('N'==78 bytes compare equal).
    Returns (score, align_length, total_matches, identity).
    """
    l1 = len(seq1) + 1
    l2 = len(seq2) + 1
    shorter = min(l1, l2) - 1
    len_diff = abs(l2 - l1)
    max_diff = 0
    if len_diff >= 1:
        max_diff += -go - len_diff * gc
    max_diff += mismatch * shorter - 1
    neg = max_diff

    M = np.full(l1, neg, dtype=np.int64)
    UG = np.full(l1, neg, dtype=np.int64)
    LG = np.zeros(l1, dtype=np.int64)
    Ml = np.zeros(l1, dtype=np.int64)
    Ul = np.zeros(l1, dtype=np.int64)
    Ll = np.zeros(l1, dtype=np.int64)
    Mi = np.zeros(l1, dtype=np.int64)
    Ui = np.zeros(l1, dtype=np.int64)
    Li = np.zeros(l1, dtype=np.int64)

    M[0] = 0
    UG[0] = neg
    LG[0] = neg
    for i in range(1, l1):
        LG[i] = -go - i * gc
        Ml[i] = Ul[i] = Ll[i] = i

    for j in range(1, l2):
        match_lag = M[0]
        mlen_lag = Ml[0]
        mid_lag = Mi[0]
        ug_lag = -go - (j - 1) * gc
        ul_lag = j - 1
        ui_lag = 0
        for i in range(1, l1):
            ygap_begin = M[i] - (go + gc)
            ygap_cont = UG[i] - gc
            ans = max(ygap_begin, ygap_cont)
            store1, store2, store3 = UG[i], Ul[i], Ui[i]
            UG[i] = ans
            if ans == ygap_begin:
                Ul[i] = Ml[i] + 1
                Ui[i] = Mi[i]
            else:
                Ul[i] = Ul[i] + 1

            a = seq1[i - 1]
            b = seq2[j - 1]
            s = match if a == b else mismatch
            matched = match_lag + s
            xgap_end = LG[i - 1] + s
            ygap_end = ug_lag + s
            ans = max(matched, xgap_end, ygap_end)
            match_lag = M[i]
            M[i] = ans
            temp, save = Ml[i], Mi[i]
            if ans == matched:
                Ml[i] = mlen_lag + 1
                Mi[i] = mid_lag + (1 if s == match else 0)
            elif ans == xgap_end:
                Ml[i] = Ll[i - 1] + 1
                Mi[i] = Li[i - 1] + (1 if s == match else 0)
            else:
                Ml[i] = ul_lag + 1
                Mi[i] = ui_lag + (1 if s == match else 0)
            mlen_lag, mid_lag = temp, save
            ug_lag, ul_lag, ui_lag = store1, store2, store3

        M[0] = neg
        Ml[0] = j
        Mi[0] = 0
        LG[0] = neg
        Ll[0] = j
        Li[0] = 0
        for i in range(1, l1):
            xgap_begin = M[i - 1] - (go + gc)
            xgap_cont = LG[i - 1] - gc
            ans = max(xgap_begin, xgap_cont)
            LG[i] = ans
            if ans == xgap_begin:
                Ll[i] = Ml[i - 1] + 1
                Li[i] = Mi[i - 1]
            else:
                Ll[i] = Ll[i - 1] + 1
                Li[i] = Li[i - 1]

    score = max(M[l1 - 1], LG[l1 - 1], UG[l1 - 1])
    if score == M[l1 - 1]:
        length, matches_ = Ml[l1 - 1], Mi[l1 - 1]
    elif score == LG[l1 - 1]:
        length, matches_ = Ll[l1 - 1], Li[l1 - 1]
    else:
        length, matches_ = Ul[l1 - 1], Ui[l1 - 1]
    return int(score), int(length), int(matches_), matches_ / length
