"""Pallas TPU wavefront kernel for affine-gap global alignment identity.

Same DP as ops/align.batch_align (GlobAlignE semantics, see that module's
docstring and /root/reference/src/utility/GlobAlignE.cpp:123-292), but the
entire rolling wavefront state lives in VMEM for the whole diagonal sweep —
the XLA scan keeps its loop carry in HBM, which makes the aligner
bandwidth-bound (~9 lanes x 2 diagonals x [P, R] int32 read+written per
diagonal).  Holding state on-chip turns the kernel compute-bound on the VPU.

Layout: pairs on the 128-wide lane axis, DP rows (seq1 positions) on the
sublane axis.  The per-diagonal row shift (cell (i-1, d-1)/(i-1, d-2) reads)
is a sublane roll; the reversed-seq2 diagonal gather is maintained
incrementally (one dynamic row read of seq2 per diagonal).

Lane packing: the reference carries 9 lanes (score, path-length, match-count
for each of match/upperGap/lowerGap).  Length and match-count always
propagate together under the same argmax selection, so they are packed into
one int32 as (len << 16) | matches — 6 carried lanes instead of 9.  Valid
while l1 + l2 <= 32767 (callers fall back to the XLA scan above that).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meshclust_tpu.ops.align import neg_inf_sentinel

LANES = 128
_ONE16 = 1 << 16


def _roll1(x):
    """out[i] = x[i-1] (row 0 = wraparound garbage, always masked after)."""
    return pltpu.roll(x, 1, axis=0)


def _kernel(dmin_ref, dmax_ref, a_ref, b_ref, l1_ref, l2_ref, out_ref, *,
            match: int, mismatch: int, go: int, gc: int):
    """Single-block entry: [1,1] SMEM dmin/dmax (ops/align_device.py drives
    the same body through a grid with scalar-prefetched per-block bounds)."""
    _kernel_body(dmin_ref[0, 0], dmax_ref[0, 0], a_ref, b_ref, l1_ref,
                 l2_ref, out_ref, match=match, mismatch=mismatch, go=go,
                 gc=gc)


def _kernel_body(dmin_s, dmax_s, a_ref, b_ref, l1_ref, l2_ref, out_ref, *,
                 match: int, mismatch: int, go: int, gc: int):
    Rpad, P = a_ref.shape
    i32 = jnp.int32
    l1 = l1_ref[:].astype(i32)                       # [1, P]
    l2 = l2_ref[:].astype(i32)
    neg = neg_inf_sentinel(l1, l2, mismatch, go, gc).astype(i32)
    rows = jax.lax.broadcasted_iota(i32, (Rpad, P), 0)
    A = a_ref[:].astype(i32)   # int8 blocks OK: codes are 0..3 plus 'N'=78
    # NOTE: every fori_loop carry must be initialized through a rows-dependent
    # select — pure broadcasts/constants get a Mosaic "replicated" layout that
    # cannot be unified with the computed (materialized) body values.
    cols = jax.lax.broadcasted_iota(i32, (Rpad, P), 1)
    never = (rows + cols) < 0          # materialized all-false in BOTH dims
    negf = jnp.where(never, 0, jnp.broadcast_to(neg, (Rpad, P))).astype(i32)
    zeros = jnp.where(never, 1, 0).astype(i32)

    # diagonal 0: only cell (0,0) exists: M=0, gaps = -inf, len=id=0
    M2 = jnp.where(rows == 0, 0, negf).astype(i32)
    UG2, LG2 = negf, negf
    MLI2, ULI2, LLI2 = zeros, zeros, zeros
    # diagonal 1: boundary cells (0,1) and (1,0)
    M1 = negf
    UG1 = jnp.where(rows == 0, -(go + gc), negf).astype(i32)
    LG1 = jnp.where(rows == 1, -(go + gc), negf).astype(i32)
    one16 = jnp.where(never, 0, _ONE16).astype(i32)  # len=1, id=0
    MLI1, ULI1, LLI1 = one16, one16, one16
    bdiag = jnp.where(rows == 0, b_ref[0:1, :].astype(i32), 0).astype(i32)

    cols1 = jax.lax.broadcasted_iota(i32, (1, P), 1)
    acc0 = jnp.where(cols1 < 0, 1, 0).astype(i32)
    accs0 = (acc0, acc0, acc0, acc0, acc0, acc0)

    def body(d, carry, capture: bool):
        (M2, UG2, LG2, MLI2, ULI2, LLI2,
         M1, UG1, LG1, MLI1, ULI1, LLI1, bdiag, accs) = carry

        # B_d[i] = seq2[d-1-i]: shift down, new head seq2[d-1]
        bnew = b_ref[pl.ds(d - 1, 1), :].astype(i32)
        bdiag = jnp.where(rows == 0, bnew, _roll1(bdiag))
        s_sub = jnp.where(A == bdiag, match, mismatch).astype(i32)

        # UG(i,d) from (i, d-1) — same row (GlobAlignE.cpp:175-193)
        ygap_begin = M1 - (go + gc)
        ug = jnp.maximum(ygap_begin, UG1 - gc)
        uli = jnp.where(ug == ygap_begin, MLI1, ULI1) + _ONE16

        # M(i,d) from (i-1, d-2) — priority M > LG > UG (cpp:207-241)
        M2s, LG2s, UG2s = _roll1(M2), _roll1(LG2), _roll1(UG2)
        MLI2s, LLI2s, ULI2s = _roll1(MLI2), _roll1(LLI2), _roll1(ULI2)
        matched = M2s + s_sub
        xgap_end = LG2s + s_sub
        ygap_end = UG2s + s_sub
        m = jnp.maximum(jnp.maximum(matched, xgap_end), ygap_end)
        is_m = m == matched
        is_x = (~is_m) & (m == xgap_end)
        inc = (s_sub == match).astype(i32)
        mli = (jnp.where(is_m, MLI2s, jnp.where(is_x, LLI2s, ULI2s))
               + _ONE16 + inc)

        # LG(i,d) from (i-1, d-1) (cpp:258-273)
        M1s, LG1s = _roll1(M1), _roll1(LG1)
        MLI1s, LLI1s = _roll1(MLI1), _roll1(LLI1)
        xgap_begin = M1s - (go + gc)
        lg = jnp.maximum(xgap_begin, LG1s - gc)
        lli = jnp.where(lg == xgap_begin, MLI1s, LLI1s) + _ONE16

        # boundary columns: i == 0 (top row, j = d) and i == d (left column)
        at_top = rows == 0
        at_left = rows == d
        atb = at_top | at_left
        dli = d * _ONE16                              # len=d, id=0
        m = jnp.where(atb, negf, m)
        mli = jnp.where(atb, dli, mli)
        ug = jnp.where(at_top, -go - d * gc, jnp.where(at_left, negf, ug))
        uli = jnp.where(atb, dli, uli)
        lg = jnp.where(at_left, -go - d * gc, jnp.where(at_top, negf, lg))
        lli = jnp.where(atb, dli, lli)

        if capture:
            # readout at cell (l1, l2), i.e. row l1 on diagonal l1+l2
            cap = (rows == l1) & ((l1 + l2) == d)
            (aFM, aFL, aFU, aFMli, aFLli, aFUli) = accs

            def pick(x):
                return jnp.sum(jnp.where(cap, x, 0), axis=0, keepdims=True,
                               dtype=i32)

            accs = (aFM + pick(m), aFL + pick(lg), aFU + pick(ug),
                    aFMli + pick(mli), aFLli + pick(lli), aFUli + pick(uli))

        return (M1, UG1, LG1, MLI1, ULI1, LLI1,
                m, ug, lg, mli, uli, lli, bdiag, accs)

    carry = (M2, UG2, LG2, MLI2, ULI2, LLI2,
             M1, UG1, LG1, MLI1, ULI1, LLI1, bdiag, accs0)
    dmin = jnp.maximum(dmin_s, 2)
    dmax = dmax_s
    carry = jax.lax.fori_loop(
        2, jnp.minimum(dmin, dmax + 1),
        lambda d, c: body(d, c, capture=False), carry)
    carry = jax.lax.fori_loop(
        dmin, dmax + 1, lambda d, c: body(d, c, capture=True), carry)

    (fm, flg, fug, fmli, flgli, fugli) = carry[-1]
    # final lane priority: matches > lowerGap > upperGap (cpp:278-291)
    score = jnp.maximum(jnp.maximum(fm, flg), fug)
    from_m = score == fm
    from_lg = (~from_m) & (score == flg)
    li = jnp.where(from_m, fmli, jnp.where(from_lg, flgli, fugli))
    alen = li >> 16
    amatch = li & 0xFFFF
    out_ref[:] = jnp.concatenate(
        [score, alen, amatch, jnp.zeros((5, P), i32)], axis=0)


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "go", "gc", "interpret"))
def batch_align_pallas(a_t: jnp.ndarray, b_t: jnp.ndarray, l1: jnp.ndarray,
                       l2: jnp.ndarray, dmin: jnp.ndarray, dmax: jnp.ndarray,
                       match: int = 1, mismatch: int = -1, go: int = 2,
                       gc: int = 1, interpret: bool = False):
    """Align 128 pairs. a_t [Rpad, 128] int32 with a_t[i] = seq1 code at
    row i (a_t[0] unused); b_t [BL, 128] int32 seq2 codes (BL >= dmax);
    l1/l2 [1, 128]; dmin/dmax [1, 1] (min/max of l1+l2 over REAL lanes —
    padding lanes outside [dmin, dmax] return zeros).

    Returns (score, alen, amatch) each [128] int32.
    """
    Rpad, P = a_t.shape
    kern = functools.partial(_kernel, match=match, mismatch=mismatch,
                             go=go, gc=gc)
    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, P), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dmin, dmax, a_t, b_t, l1, l2)
    return out[0], out[1], out[2]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def align_batch_128(pairs_block, ba: int, bb: int, match=1, mismatch=-1,
                    go=2, gc=1, interpret=False) -> np.ndarray:
    """Identities for <=128 (codes_a, codes_b) pairs padded to (ba, bb)."""
    n = len(pairs_block)
    Rpad = _round_up(ba + 1, 8)
    BL = _round_up(ba + bb + 2, 8)
    a_t = np.zeros((Rpad, LANES), np.int32)
    b_t = np.zeros((BL, LANES), np.int32)
    l1 = np.ones((1, LANES), np.int32)
    l2 = np.ones((1, LANES), np.int32)
    for p, (a, b) in enumerate(pairs_block):
        a_t[1: len(a) + 1, p] = a
        b_t[: len(b), p] = b
        l1[0, p] = len(a)
        l2[0, p] = len(b)
    s = l1[0, :n] + l2[0, :n]
    dmin = np.array([[int(s.min())]], np.int32)
    dmax = np.array([[int(s.max())]], np.int32)
    _, alen, amatch = batch_align_pallas(
        jnp.asarray(a_t), jnp.asarray(b_t), jnp.asarray(l1), jnp.asarray(l2),
        jnp.asarray(dmin), jnp.asarray(dmax), match=match, mismatch=mismatch,
        go=go, gc=gc, interpret=interpret)
    alen = np.asarray(alen, np.float64)[:n]
    amatch = np.asarray(amatch, np.float64)[:n]
    return amatch / np.maximum(alen, 1.0)
