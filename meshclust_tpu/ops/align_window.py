"""Row-windowed Pallas grid kernel for affine-gap global alignment.

Same DP and tie-break semantics as `ops/align_pallas._kernel_body`
(GlobAlignE, /root/reference/src/utility/GlobAlignE.cpp:123-292), but the
diagonal sweep only touches the ACTIVE row window of the wavefront instead
of the full padded row axis.

Why: the full-array sweep updates Rpad rows on every one of the l1+l2
diagonals, so a square l1 = l2 = L pair performs 2L * L element-updates for
L * L real DP cells — a guaranteed 2x waste before any per-op accounting
(measured round 4: 7.78 GCUPS, 24% of the 32 GCUPS ALU roofline at ~30 VPU
ops/cell).  On diagonal d the live rows are exactly
[max(0, d - l2), min(d, l1)]; this kernel keeps the 12 wavefront arrays
(plus the reversed-seq2 diagonal) in VMEM scratch and, per diagonal, loads/
computes/stores only a window of rows:

- a STATIC ladder of window sizes (Rpad/4, Rpad/2, 3Rpad/4, Rpad) with
  DYNAMIC per-block stage boundaries computed from SMEM scalars (dmin,
  dmax, max l1, max l2) — Mosaic needs static shapes, the bounds don't
  have to be;
- growing stages anchor the window at row 0 (the band's lower edge rises
  with d but rows below it are out-of-range cells whose garbage provably
  never propagates into live cells — see "garbage discipline" below);
- shrinking stages anchor at w0 = align8(d - l2max) - 8: the 8 support
  rows below the band absorb the sublane-roll wraparound (one garbage row
  enters at the window head per diagonal and climbs one row per diagonal;
  w0 re-aligns every 8 diagonals, so garbage never reaches a live row).

Garbage discipline (why partial windows are exact): every live cell (i, j)
reads only rows i-1 and i at diagonals d-1/d-2, all of which are live or
boundary cells; boundary cells are overwritten in-loop (rows == 0 while the
window contains row 0, rows == d when row d enters the window, which the
stage bounds guarantee happens no later than diagonal d).  Cells outside a
pair's [l1] x [l2] range compute garbage exactly as in the full-array
kernel, and nothing ever reads them before their boundary reset.

Expected effect for square pairs with a K=4 ladder: swept element-updates
drop from 2L^2 to ~1.25L^2 (1.6x), more when the row bucket Rpad overshoots
the block's true max l1 (the ladder then never opens the top stages).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meshclust_tpu.ops.align import neg_inf_sentinel
from meshclust_tpu.ops.align_pallas import LANES, _ONE16


def _roll1(x):
    """out[i] = x[i-1] (row 0 = wraparound garbage, margin-masked)."""
    return pltpu.roll(x, 1, axis=0)


def _ladder(rpad: int):
    """Ascending window sizes (multiples of 8, last == rpad)."""
    q = max(8, ((rpad // 4 + 7) // 8) * 8)
    ws = sorted({min(rpad, q), min(rpad, 2 * q), min(rpad, 3 * q), rpad})
    return ws


_BIG = 1 << 30


def _win_kernel(dmin_ref, dmax_ref, l1m_ref, l2m_ref, a_ref, b_ref, l1_ref,
                l2_ref, out_ref, aA, aBD, aM2, aUG2, aLG2, aMLI2, aULI2,
                aLLI2, aM1, aUG1, aLG1, aMLI1, aULI1, aLLI1, *,
                match: int, mismatch: int, go: int, gc: int):
    g = pl.program_id(0)
    i32 = jnp.int32
    Rpad = a_ref.shape[0]
    ladder = _ladder(Rpad)
    W0 = ladder[0]

    l1 = l1_ref[:].astype(i32)                        # [1, 128]
    l2 = l2_ref[:].astype(i32)
    neg = neg_inf_sentinel(l1, l2, mismatch, go, gc).astype(i32)

    dmin = jnp.maximum(dmin_ref[g], 2)
    D = dmax_ref[g] + 1
    l1m = l1m_ref[g]
    l2m = l2m_ref[g]

    # ---- init: diagonals 0 and 1 live in rows [0, W0) --------------------
    aA[:] = a_ref[:].astype(i32)
    rows0 = jax.lax.broadcasted_iota(i32, (W0, LANES), 0)
    negb0 = jnp.where(rows0 < 0, 0, jnp.broadcast_to(neg, (W0, LANES)))
    negb0 = negb0.astype(i32)
    zeros0 = jnp.where(rows0 < 0, 1, 0).astype(i32)
    one160 = jnp.where(rows0 < 0, 0, _ONE16).astype(i32)
    sl0 = (pl.ds(0, W0), slice(None))
    aM2[sl0] = jnp.where(rows0 == 0, 0, negb0).astype(i32)
    aUG2[sl0] = negb0
    aLG2[sl0] = negb0
    aMLI2[sl0] = zeros0
    aULI2[sl0] = zeros0
    aLLI2[sl0] = zeros0
    aM1[sl0] = negb0
    aUG1[sl0] = jnp.where(rows0 == 0, -(go + gc), negb0).astype(i32)
    aLG1[sl0] = jnp.where(rows0 == 1, -(go + gc), negb0).astype(i32)
    aMLI1[sl0] = one160
    aULI1[sl0] = one160
    aLLI1[sl0] = one160
    aBD[sl0] = jnp.where(rows0 == 0, b_ref[0:1, :].astype(i32), 0).astype(i32)
    out_ref[:] = jnp.zeros((8, LANES), i32)

    # ---- the per-diagonal step, shared by all stages ---------------------
    def step(d, *, W: int, shrink: bool, capture: bool):
        if shrink:
            # align8(d - l2max) - 8: 8 support rows under the band absorb
            # roll wraparound. Clamped so the window stays inside [0, Rpad)
            # (both bounds are multiples of 8, preserving sublane alignment;
            # when clamped, the band bottom rises 1 row/diagonal exactly as
            # fast as head garbage climbs, so the margin never erodes).
            w0 = jnp.clip(((d - l2m) >> 3 << 3) - 8, 0, Rpad - W)
            w0 = pl.multiple_of(w0, 8)
        else:
            w0 = 0
        sl = (pl.ds(w0, W), slice(None))
        rows = w0 + jax.lax.broadcasted_iota(i32, (W, LANES), 0)
        negb = jnp.broadcast_to(neg, (W, LANES)).astype(i32)
        A = aA[sl]
        M2, UG2, LG2 = aM2[sl], aUG2[sl], aLG2[sl]
        MLI2, ULI2, LLI2 = aMLI2[sl], aULI2[sl], aLLI2[sl]
        M1, UG1, LG1 = aM1[sl], aUG1[sl], aLG1[sl]
        MLI1, ULI1, LLI1 = aMLI1[sl], aULI1[sl], aLLI1[sl]
        bdw = aBD[sl]

        # B_d[i] = seq2[d-1-i]: shift down; row 0 (only in w0=0 stages)
        # takes the new head seq2[d-1]
        if shrink:
            bdiag = _roll1(bdw)
        else:
            bnew = b_ref[pl.ds(d - 1, 1), :].astype(i32)
            bdiag = jnp.where(rows == 0, bnew, _roll1(bdw)).astype(i32)
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

        # boundaries: i == 0 (top row, j = d) and i == d (left column).
        # Shrink stages never contain row 0 (w0 >= 8): at diagonals that
        # far past l2max the top-row cell is out of range for every pair,
        # so the at_top writes are dropped entirely.
        at_left = rows == d
        dli = d * _ONE16                              # len=d, id=0
        if shrink:
            m = jnp.where(at_left, negb, m)
            mli = jnp.where(at_left, dli, mli)
            ug = jnp.where(at_left, negb, ug)
            uli = jnp.where(at_left, dli, uli)
            lg = jnp.where(at_left, -go - d * gc, lg)
            lli = jnp.where(at_left, dli, lli)
        else:
            at_top = rows == 0
            atb = at_top | at_left
            m = jnp.where(atb, negb, m)
            mli = jnp.where(atb, dli, mli)
            ug = jnp.where(at_top, -go - d * gc,
                           jnp.where(at_left, negb, ug))
            uli = jnp.where(atb, dli, uli)
            lg = jnp.where(at_left, -go - d * gc,
                           jnp.where(at_top, negb, lg))
            lli = jnp.where(atb, dli, lli)

        if capture:
            # readout at cell (l1, l2), i.e. row l1 on diagonal l1+l2
            cap = (rows == l1) & ((l1 + l2) == d)

            def pick(x):
                return jnp.sum(jnp.where(cap, x, 0), axis=0, keepdims=True,
                               dtype=i32)

            out_ref[0:1, :] += pick(m)
            out_ref[1:2, :] += pick(lg)
            out_ref[2:3, :] += pick(ug)
            out_ref[3:4, :] += pick(mli)
            out_ref[4:5, :] += pick(lli)
            out_ref[5:6, :] += pick(uli)

        # cycle: diag-1 becomes diag-2, new values become diag-1
        aM2[sl], aUG2[sl], aLG2[sl] = M1, UG1, LG1
        aMLI2[sl], aULI2[sl], aLLI2[sl] = MLI1, ULI1, LLI1
        aM1[sl], aUG1[sl], aLG1[sl] = m, ug, lg
        aMLI1[sl], aULI1[sl], aLLI1[sl] = mli, uli, lli
        aBD[sl] = bdiag

    # ---- dynamic stage boundaries ----------------------------------------
    # A window of size W anchored at 0 is valid while min(d, l1m)+1 <= W;
    # a shrink window W' (8 support + band + top slack) is valid once
    # d >= max(l2m + 16, l1m + l2m + 17 - W').
    shrink_ws = [min(Rpad, w + 16) for w in reversed(ladder[:-1])]
    grow_ws = ladder[:-1]

    stages = []          # (W, shrink) in sweep order
    bounds = []          # end-of-stage scalars, same length
    prev = jnp.int32(2)
    sh_first = (jnp.maximum(l2m + 16, l1m + l2m + 17 - shrink_ws[0])
                if shrink_ws else D)
    for w in grow_ws:
        cap = jnp.where(l1m + 1 <= w, _BIG, w).astype(jnp.int32)
        e = jnp.clip(jnp.minimum(cap, sh_first), prev, D)
        stages.append((w, False))
        bounds.append((prev, e))
        prev = e
    # full-width stage up to the first valid shrink diagonal
    e = jnp.clip(sh_first, prev, D)
    stages.append((Rpad, False))
    bounds.append((prev, e))
    prev = e
    for j, wp in enumerate(shrink_ws):
        if j + 1 < len(shrink_ws):
            nxt = jnp.maximum(l2m + 16,
                              l1m + l2m + 17 - shrink_ws[j + 1])
            e = jnp.clip(nxt, prev, D)
        else:
            e = D
        stages.append((wp, True))
        bounds.append((prev, e))
        prev = e

    for (w, shrink), (lo, hi) in zip(stages, bounds):
        mid = jnp.clip(dmin, lo, hi)
        jax.lax.fori_loop(
            lo, mid,
            functools.partial(
                lambda d, c, W, S: (step(d, W=W, shrink=S, capture=False)
                                    or 0), W=w, S=shrink), 0)
        jax.lax.fori_loop(
            mid, hi,
            functools.partial(
                lambda d, c, W, S: (step(d, W=W, shrink=S, capture=True)
                                    or 0), W=w, S=shrink), 0)

    # ---- final readout ----------------------------------------------------
    fm, flg, fug = out_ref[0:1, :], out_ref[1:2, :], out_ref[2:3, :]
    fmli, flgli, fugli = out_ref[3:4, :], out_ref[4:5, :], out_ref[5:6, :]
    # final lane priority: matches > lowerGap > upperGap (cpp:278-291)
    score = jnp.maximum(jnp.maximum(fm, flg), fug)
    from_m = score == fm
    from_lg = (~from_m) & (score == flg)
    li = jnp.where(from_m, fmli, jnp.where(from_lg, flgli, fugli))
    out_ref[0:1, :] = score
    out_ref[1:2, :] = li >> 16
    out_ref[2:3, :] = li & 0xFFFF


def win_grid_call(dmin_g, dmax_g, a_t, b_t, l1, l2, *, G: int, match: int,
                  mismatch: int, go: int, gc: int, interpret: bool = False):
    """Drop-in for align_device._grid_call: [G]-grid over 128-lane blocks.

    a_t [Rpad, G*128] int8, b_t [BL, G*128] int32, l1/l2 [1, G*128] i32,
    dmin_g/dmax_g [G] i32.  Per-block max l1/l2 (the window-bound scalars)
    are derived here — padding lanes carry l1 = l2 = 1 or replicate a real
    pair, so blockwise maxima are unaffected.  Returns (alen, amatch).
    """
    Rpad = a_t.shape[0]
    P = G * LANES
    l1m_g = jnp.max(l1.reshape(G, LANES), axis=1).astype(jnp.int32)
    l2m_g = jnp.max(l2.reshape(G, LANES), axis=1).astype(jnp.int32)
    kern = functools.partial(_win_kernel, match=match, mismatch=mismatch,
                             go=go, gc=gc)
    BL = b_t.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((Rpad, LANES), lambda g, *_: (0, g)),
            pl.BlockSpec((BL, LANES), lambda g, *_: (0, g)),
            pl.BlockSpec((1, LANES), lambda g, *_: (0, g)),
            pl.BlockSpec((1, LANES), lambda g, *_: (0, g)),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda g, *_: (0, g)),
        scratch_shapes=[pltpu.VMEM((Rpad, LANES), jnp.int32)
                        for _ in range(14)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, P), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dmin_g.reshape(G), dmax_g.reshape(G), l1m_g, l2m_g, a_t, b_t, l1, l2)
    return out[1], out[2]          # alen, amatch (int32, exact)
