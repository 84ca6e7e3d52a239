"""Grid-batched device aligner: ALL pair blocks in one dispatch.

`ops/align_pallas.py` runs one 128-lane Pallas call per block; over the
tunneled TPU each dispatch costs ~25 ms RTT plus a megabyte-scale H2D of the
packed operands, so a 3000-pair labeling pass spends ~6 s on ~24 dispatches
of ~20 ms kernels.  This module keeps the same kernel (`align_pallas._kernel`,
GlobAlignE semantics — /root/reference/src/utility/GlobAlignE.cpp:123-292)
but drives it through a `pallas_call` GRID over pair blocks:

- one dispatch per call site, not per 128 pairs;
- operands shipped (or device-gathered) as int8, 4x less H2D than int32;
- per-block [dmin, dmax] SMEM scalars so short blocks sweep fewer diagonals
  (pairs are sorted by combined length so blocks are homogeneous);
- optional staging: the whole corpus' codes live on device ([N, Lpad] int8)
  and per-call operands are gathered + transposed on device, so a call ships
  only the pair indices.

Identity is returned as exact int32 (alignment length, match count); the
float64 division happens on host exactly like the reference's `getIdentity`
(GlobAlignE.cpp:301-305).
"""
from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meshclust_tpu.ops.align_pallas import LANES, _kernel_body, _round_up

# Gate: pairs with l1 + l2 > 32767 overflow the (len<<16 | matches) packing.
_PACK_LIMIT = 32767
# Row-axis cap (VMEM: 13 carried [Rpad, 128] i32 arrays).
_ROW_CAP = 8192


def _grid_kernel(dmin_ref, dmax_ref, a_ref, b_ref, l1_ref, l2_ref, out_ref,
                 *, match: int, mismatch: int, go: int, gc: int):
    g = pl.program_id(0)
    _kernel_body(dmin_ref[g], dmax_ref[g], a_ref, b_ref, l1_ref, l2_ref,
                 out_ref, match=match, mismatch=mismatch, go=go, gc=gc)


def _grid_call(dmin_g, dmax_g, a_t, b_t, l1, l2, *, G: int, match: int,
               mismatch: int, go: int, gc: int, interpret: bool = False):
    """pallas_call with a G-block grid. a_t [Rpad, G*128] int8,
    b_t [BL, G*128] int8, l1/l2 [1, G*128] i32, dmin_g/dmax_g [G] i32
    (scalar-prefetched per-block diagonal bounds).

    Default path is the row-windowed sweep (ops/align_window.py — only the
    active wavefront rows are touched per diagonal, ~1.6x over the full
    sweep on square pairs); MESHCLUST_ALIGN_WINDOWED=0 reverts to the
    full-row kernel."""
    if os.environ.get("MESHCLUST_ALIGN_WINDOWED", "1") == "1":
        from meshclust_tpu.ops.align_window import win_grid_call
        return win_grid_call(dmin_g, dmax_g, a_t, b_t, l1, l2, G=G,
                             match=match, mismatch=mismatch, go=go, gc=gc,
                             interpret=interpret)
    Rpad = a_t.shape[0]
    BL = b_t.shape[0]
    kern = functools.partial(_grid_kernel, match=match, mismatch=mismatch,
                             go=go, gc=gc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((Rpad, LANES), lambda g, dmin, dmax: (0, g)),
            pl.BlockSpec((BL, LANES), lambda g, dmin, dmax: (0, g)),
            pl.BlockSpec((1, LANES), lambda g, dmin, dmax: (0, g)),
            pl.BlockSpec((1, LANES), lambda g, dmin, dmax: (0, g)),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda g, dmin, dmax: (0, g)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, G * LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dmin_g.reshape(G), dmax_g.reshape(G), a_t, b_t, l1, l2)
    return out[1], out[2]          # alen, amatch (int32, exact)


@functools.partial(jax.jit, static_argnames=(
    "G", "match", "mismatch", "go", "gc", "interpret"))
def _align_packed(a_t, b_t, l1, l2, dmin_g, dmax_g, *, G, match, mismatch,
                  go, gc, interpret=False):
    return _grid_call(dmin_g, dmax_g, a_t, b_t, l1, l2, G=G, match=match,
                      mismatch=mismatch, go=go, gc=gc, interpret=interpret)


def _gather_operands_impl(codes, idx_a, idx_b, l1, l2, *, Rpad, BL, G):
    """Traceable device-side gather + transpose from staged codes
    [N, Lpad] int8 (see _gather_operands for the jit-boundary rationale)."""
    P = G * LANES
    Lpad = codes.shape[1]
    a = jnp.take(codes, idx_a, axis=0)               # [P, Lpad] int8
    b = jnp.take(codes, idx_b, axis=0)
    need = Rpad - 1
    if need <= Lpad:
        a_sl = a[:, :need]
    else:
        a_sl = jnp.pad(a, ((0, 0), (0, need - Lpad)))
    a_t = jnp.concatenate(
        [jnp.zeros((P, 1), jnp.int8), a_sl], axis=1).T   # [Rpad, P]
    if BL <= Lpad:
        b_sl = b[:, :BL]
    else:
        b_sl = jnp.pad(b, ((0, 0), (0, BL - Lpad)))
    # seq2 stays int32 in VMEM: the kernel reads one dynamic row per
    # diagonal (b_ref[pl.ds(d-1,1),:]) and Mosaic only supports dynamic
    # sublane indexing on 32-bit memrefs (int8 tiles are 32x128, so the
    # index would need to be provably 32-aligned, which d-1 is not).
    b_t = b_sl.T.astype(jnp.int32)                    # [BL, P]
    s = (l1 + l2).reshape(G, LANES)
    dmin_g = jnp.min(s, axis=1, keepdims=True).astype(jnp.int32)
    dmax_g = jnp.max(s, axis=1, keepdims=True).astype(jnp.int32)
    return (a_t, b_t, l1.reshape(1, P), l2.reshape(1, P), dmin_g, dmax_g)


@functools.partial(jax.jit, static_argnames=("Rpad", "BL", "G"))
def _gather_operands(codes, idx_a, idx_b, l1, l2, *, Rpad, BL, G):
    """Device-side gather + transpose from staged codes [N, Lpad] int8.

    Kept in its OWN jit (cheap XLA-only compile, keyed on corpus shape) so
    the expensive Mosaic program (`_align_packed`, keyed only on block
    shapes) is shared across corpora and pre-compiled by warmups. The
    intermediate operands never leave the device between the two dispatches.
    """
    return _gather_operands_impl(codes, idx_a, idx_b, l1, l2, Rpad=Rpad,
                                 BL=BL, G=G)


@functools.partial(jax.jit, static_argnames=(
    "Rpad", "BL", "G", "match", "mismatch", "go", "gc"))
def _probe_round(codes, lens, orders, pivot_rows, pivot_pos, live, *,
                 Rpad, BL, G, match, mismatch, go, gc):
    """ONE fused binary-search probe round for the trainer (SURVEY §3.2,
    Trainer.cpp:702-721): gather each live pivot's probe point from its
    device-resident distance order, gather/pack the code operands, run the
    grid NW kernel — all in one dispatch, one [2, P] readback. The exact
    `identity < cutoff` comparison stays on host in float64 (parity with
    the reference's double semantics, Trainer.cpp:115-127).

    codes [N, Lpad] i8 staged corpus; lens [N] i32; orders [P0, N] i32
    distance-sort order per pivot; pivot_rows [P] i32 point rows (padded);
    pivot_pos [P] i32 current probe rank; live [P] bool.
    """
    P = G * LANES
    P0 = orders.shape[0]
    rows = jnp.minimum(jnp.arange(P, dtype=jnp.int32), P0 - 1)
    probe = orders[rows, jnp.clip(pivot_pos, 0, orders.shape[1] - 1)]
    ia = pivot_rows.astype(jnp.int32)
    ib = probe.astype(jnp.int32)
    l1 = jnp.where(live, lens[ia], 1).astype(jnp.int32)
    l2 = jnp.where(live, lens[ib], 1).astype(jnp.int32)
    a_t, b_t, l1r, l2r, dmin_g, dmax_g = _gather_operands_impl(
        codes, ia, ib, l1, l2, Rpad=Rpad, BL=BL, G=G)
    alen, amatch = _grid_call(dmin_g, dmax_g, a_t, b_t, l1r, l2r, G=G,
                              match=match, mismatch=mismatch, go=go, gc=gc)
    return jnp.stack([alen, amatch, l2r[0]])


def _bucket_rows(x: int) -> int:
    """Quarter-octave bucket for the DP row axis (<=25% pad waste)."""
    if x <= 64:
        return 64
    step = max(64, (1 << (int(x - 1).bit_length() - 1)) // 4)
    return ((x + step - 1) // step) * step


def _bucket_pow2(x: int, lo: int = 1) -> int:
    b = lo
    while b < x:
        b *= 2
    return b


# Max lanes per dispatch; larger pair lists are chunked sequentially.
_MAX_G = 32


class DeviceAligner:
    """Batched GlobAlignE identities addressed by sequence index.

    codes: per-sequence uint8 digit arrays ('N' kept as 78 — N==N matches,
    ref ChromosomeOneDigit semantics). On TPU backends the whole corpus is
    staged on device once (int8) when it fits `stage_mb`; otherwise operands
    are packed host-side — both paths use the single-dispatch grid kernel.
    """

    def __init__(self, codes: List[np.ndarray], match: int = 1,
                 mismatch: int = -1, go: int = 2, gc: int = 1,
                 stage_mb: Optional[int] = None):
        self.codes = codes
        self.lengths = np.asarray([len(c) for c in codes], np.int64)
        self.match, self.mismatch, self.go, self.gc = match, mismatch, go, gc
        if stage_mb is None:
            # Staging is what keeps identities() off the host-packed path
            # (~150x slower per pair at 1M scale: Python operand packing +
            # full-operand tunnel shipping per batch). Budget ~40% of the
            # detected device memory (6144 MB on a 16 GB v5e) so a
            # smaller-HBM accelerator falls back instead of OOMing
            # (round-4 advice).
            default_mb = 6144
            try:
                stats = jax.devices()[0].memory_stats()
                if stats and stats.get("bytes_limit"):
                    default_mb = int(stats["bytes_limit"] * 0.4 / 2**20)
            except Exception:
                pass
            stage_mb = int(os.environ.get("MESHCLUST_ALIGN_STAGE_MB",
                                          str(default_mb)))
        self.stage_mb = stage_mb
        self._staged = None     # (codes_dev [N, Lpad] int8, Lpad)

    # -- capability gates ----------------------------------------------------
    def _on_tpu(self) -> bool:
        if os.environ.get("MESHCLUST_PALLAS_ALIGN", "1") != "1":
            return False
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False

    def _stage(self):
        if self._staged is None:
            lmax = int(self.lengths.max()) if len(self.codes) else 8
            lpad = _round_up(max(lmax, 8), 128)
            N = len(self.codes)
            mat = np.zeros((N, lpad), np.uint8)
            for i, c in enumerate(self.codes):
                mat[i, : len(c)] = c
            # Ship 2-bit-packed bases + a 1-bit 'N' mask (78 marker) and
            # unpack on device: 2.75 bits/base instead of 8 — the staging
            # H2D through the tunnel was ~15 s at 1M x 1.2kb.
            v = (mat & 3).reshape(N, lpad // 4, 4)
            p2 = (v[:, :, 0] | (v[:, :, 1] << 2) | (v[:, :, 2] << 4)
                  | (v[:, :, 3] << 6)).astype(np.uint8)
            nm = np.packbits(mat == 78, axis=1)

            @jax.jit
            def unpack(p2d, nmd):
                x = p2d.astype(jnp.int32)
                parts = jnp.stack(
                    [(x >> (2 * i)) & 3 for i in range(4)], axis=-1
                ).reshape(x.shape[0], x.shape[1] * 4)
                b = nmd.astype(jnp.int32)
                bits = jnp.stack(
                    [(b >> (7 - i)) & 1 for i in range(8)], axis=-1
                ).reshape(b.shape[0], b.shape[1] * 8)
                return jnp.where(bits == 1, 78, parts).astype(jnp.int8)

            self._staged = (unpack(jax.device_put(p2),
                                   jax.device_put(nm)), lpad)
        return self._staged

    def _can_stage(self) -> bool:
        lmax = int(self.lengths.max()) if len(self.codes) else 8
        lpad = _round_up(max(lmax, 8), 128)
        return len(self.codes) * lpad <= self.stage_mb * (1 << 20)

    # -- public API ----------------------------------------------------------
    def probe_rounds_supported(self) -> bool:
        """Fused probe rounds need the staged TPU grid path."""
        return self._on_tpu() and self._can_stage()

    def probe_round(self, orders_dev, pivot_rows: np.ndarray,
                    pivot_pos: np.ndarray, live: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """One fused binary-search probe round (see _probe_round). Returns
        (alignment_length, matches, probe_len) int64 [n_pivots]; dead
        pivots carry degenerate 1x1 results the caller must ignore."""
        codes_dev, _ = self._stage()
        if not hasattr(self, "_lens_dev"):
            self._lens_dev = jax.device_put(
                self.lengths.astype(np.int32))
        n = pivot_rows.shape[0]
        lmax = int(self.lengths.max())
        ba = _bucket_rows(lmax)
        bb = _bucket_pow2(lmax, 64)
        Rpad = _round_up(ba + 1, 8)
        BL = _round_up(ba + bb + 2, 8)
        G = max(1, (n + LANES - 1) // LANES)
        P = G * LANES
        rows = np.zeros(P, np.int32)
        rows[:n] = pivot_rows
        pos = np.zeros(P, np.int32)
        pos[:n] = pivot_pos
        lv = np.zeros(P, bool)
        lv[:n] = live
        out = np.asarray(_probe_round(
            codes_dev, self._lens_dev, orders_dev, jnp.asarray(rows),
            jnp.asarray(pos), jnp.asarray(lv), Rpad=Rpad, BL=BL, G=G,
            match=self.match, mismatch=self.mismatch, go=self.go,
            gc=self.gc))
        return (out[0, :n].astype(np.int64), out[1, :n].astype(np.int64),
                out[2, :n].astype(np.int64))

    def identities(self, pairs: Sequence[Tuple[int, int]]) -> np.ndarray:
        """Float64 identities for (index_a, index_b) pairs (exact host
        division of exact int32 match/length counts)."""
        n = len(pairs)
        if n == 0:
            return np.zeros(0, np.float64)
        ia = np.asarray([p for p, _ in pairs], np.int64)
        ib = np.asarray([q for _, q in pairs], np.int64)
        l1 = self.lengths[ia]
        l2 = self.lengths[ib]
        from meshclust_tpu.utils import perf
        perf.add("nw_cells", float((l1 * l2).sum()))
        perf.add("nw_pairs", n)
        if not self._on_tpu():
            from meshclust_tpu.ops import align as A
            with perf.phase("align"):
                return A.align_identity_batch(
                    [(self.codes[a], self.codes[b]) for a, b in pairs],
                    match=self.match, mismatch=self.mismatch, go=self.go,
                    gc=self.gc)
        if (l1 + l2).max() + 2 > _PACK_LIMIT or l1.max() > _ROW_CAP:
            # genome-length pairs: blockwise-tiled wavefront (no row/pack
            # caps, boundary state carried across H x W tiles).  If the
            # tiled kernel ever fails to compile/run on this backend, fall
            # back to the XLA scan aligner rather than crash the user run
            # (round-2 verdict: an uncompilable kernel must never be
            # user-facing).
            from meshclust_tpu.ops.align_tiled import align_long_batch
            try:
                with perf.phase("align"):
                    alen, amatch = align_long_batch(
                        [(self.codes[a], self.codes[b]) for a, b in pairs],
                        match=self.match, mismatch=self.mismatch, go=self.go,
                        gc=self.gc)
                return amatch.astype(np.float64) / np.maximum(
                    alen.astype(np.float64), 1.0)
            except Exception as e:  # noqa: BLE001 — any backend failure
                from meshclust_tpu.utils.log import log
                log(f"tiled long-pair kernel unavailable ({type(e).__name__}:"
                    f" {e}); falling back to XLA scan aligner")
                from meshclust_tpu.ops import align as A
                with perf.phase("align"):
                    return A.align_identity_batch(
                        [(self.codes[a], self.codes[b]) for a, b in pairs],
                        match=self.match, mismatch=self.mismatch, go=self.go,
                        gc=self.gc)
        with perf.phase("align"):
            alen, amatch = self.counts(pairs)
        return amatch.astype(np.float64) / np.maximum(
            alen.astype(np.float64), 1.0)

    def counts(self, pairs: Sequence[Tuple[int, int]]
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact (alignment_length, matches) int arrays — device grid path
        only (callers gate via identities())."""
        n = len(pairs)
        if n == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        ia = np.asarray([p for p, _ in pairs], np.int64)
        ib = np.asarray([q for _, q in pairs], np.int64)
        l1 = self.lengths[ia]
        l2 = self.lengths[ib]
        if not self._on_tpu():
            raise RuntimeError(
                "DeviceAligner.counts() requires the TPU grid kernel; "
                "call identities() for the gated/fallback path")
        if (l1 + l2).max() + 2 > _PACK_LIMIT or l1.max() > _ROW_CAP:
            raise ValueError(
                f"pair too long for the packed grid kernel "
                f"(l1+l2 max {int((l1 + l2).max())} > {_PACK_LIMIT - 2} or "
                f"l1 max {int(l1.max())} > {_ROW_CAP}); "
                "call identities() for the gated/fallback path")
        alen = np.zeros(n, np.int64)
        amatch = np.zeros(n, np.int64)
        # group by row bucket so one oversized seq1 doesn't pad everything
        groups: dict = {}
        for t in range(n):
            groups.setdefault(_bucket_rows(int(l1[t])), []).append(t)
        staged = self._can_stage()
        # Dispatch every chunk before reading ANY result back: JAX dispatch
        # is async, so the per-chunk tunnel RTT + D2H of chunk k overlaps
        # the kernel execution of chunk k+1 instead of serializing.
        pending = []
        for ba, idxs in groups.items():
            idxs.sort(key=lambda t: int(l1[t] + l2[t]))
            bb = _bucket_pow2(int(l2[np.asarray(idxs)].max()), 64)
            for s in range(0, len(idxs), _MAX_G * LANES):
                chunk = np.asarray(idxs[s: s + _MAX_G * LANES])
                al, am = self._run_chunk(ia[chunk], ib[chunk], l1[chunk],
                                         l2[chunk], ba, bb, staged,
                                         defer=True)
                pending.append((chunk, al, am))
        for chunk, al, am in pending:
            m = len(chunk)
            alen[chunk] = np.asarray(al, np.int64)[:m]
            amatch[chunk] = np.asarray(am, np.int64)[:m]
        return alen, amatch

    def _run_chunk(self, ia, ib, l1, l2, ba: int, bb: int, staged: bool,
                   defer: bool = False):
        """defer=True returns the device arrays un-read (caller slices to n
        after converting); defer=False reads back immediately."""
        n = len(ia)
        # Staged operands ship only indices, so a FIXED grid size (one
        # compiled program per row bucket) costs nothing: full-pad blocks
        # get l1=l2=1 => dmax=2 => the diagonal sweep is empty. Host-packed
        # operands ship [Rpad+BL, G*128] bytes, so size the grid to the data.
        nblocks = (n + LANES - 1) // LANES
        G = _MAX_G if staged else _bucket_pow2(nblocks)
        G = max(G, nblocks)
        P = G * LANES
        nfull = nblocks * LANES
        # lanes n..nfull (partial tail block): replicate the last (longest,
        # since idxs is sorted ascending by combined length) pair so the tail
        # block's dmin never drops below its real lanes; full-pad blocks are
        # degenerate 1x1 pairs and sweep zero diagonals.
        pad_ia = np.zeros(P, np.int32)
        pad_ib = np.zeros(P, np.int32)
        pad_l1 = np.ones(P, np.int32)
        pad_l2 = np.ones(P, np.int32)
        pad_ia[n:nfull] = ia[-1]
        pad_ib[n:nfull] = ib[-1]
        pad_l1[n:nfull] = l1[-1]
        pad_l2[n:nfull] = l2[-1]
        pad_ia[:n] = ia
        pad_ib[:n] = ib
        pad_l1[:n] = l1
        pad_l2[:n] = l2
        Rpad = _round_up(ba + 1, 8)
        BL = _round_up(ba + bb + 2, 8)
        if staged:
            codes_dev, _ = self._stage()
            a_t, b_t, l1r, l2r, dmin_g, dmax_g = _gather_operands(
                codes_dev, jnp.asarray(pad_ia), jnp.asarray(pad_ib),
                jnp.asarray(pad_l1), jnp.asarray(pad_l2), Rpad=Rpad, BL=BL,
                G=G)
            alen, amatch = _align_packed(
                a_t, b_t, l1r, l2r, dmin_g, dmax_g, G=G, match=self.match,
                mismatch=self.mismatch, go=self.go, gc=self.gc)
        else:
            a_t = np.zeros((Rpad, P), np.int8)
            b_t = np.zeros((BL, P), np.int32)   # int32: see _gather_operands
            for p in range(P):
                # Pad lanes (p >= n) replicate the last real pair but may be
                # declared shorter than the real sequence (full-pad blocks
                # carry l1 = l2 = 1): truncate to the declared lengths so the
                # copy always fits the (Rpad, BL) bucket.
                ca = self.codes[int(pad_ia[p])][: int(pad_l1[p])]
                cb = self.codes[int(pad_ib[p])][: int(pad_l2[p])]
                a_t[1: len(ca) + 1, p] = ca
                b_t[: len(cb), p] = cb
            sums = (pad_l1 + pad_l2).reshape(G, LANES)
            dmin_g = sums.min(axis=1, keepdims=True).astype(np.int32)
            dmax_g = sums.max(axis=1, keepdims=True).astype(np.int32)
            alen, amatch = _align_packed(
                jnp.asarray(a_t), jnp.asarray(b_t),
                jnp.asarray(pad_l1.reshape(1, P)),
                jnp.asarray(pad_l2.reshape(1, P)), jnp.asarray(dmin_g),
                jnp.asarray(dmax_g), G=G, match=self.match,
                mismatch=self.mismatch, go=self.go, gc=self.gc)
        if defer:
            return alen, amatch
        return (np.asarray(alen, np.int64)[:n],
                np.asarray(amatch, np.int64)[:n])

