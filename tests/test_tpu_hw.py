"""Real-hardware TPU tier: COMPILE AND RUN every Pallas/Mosaic entry point.

Run with:  MESHCLUST_TEST_TPU=1 python -m pytest tests/ -m tpu -q

Unlike the interpret-mode math oracles elsewhere in the suite, these tests
exist to exercise the actual Mosaic compiler — round 1 shipped a grid kernel
that passed every interpret test but failed layout verification on hardware
("cannot statically prove that index in dimension 0 is a multiple of 8").
Every kernel here compiles real programs; expect ~20-60 s per fresh shape
over the tunneled compile service.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs real TPU (set MESHCLUST_TEST_TPU=1 and run on hardware)")


def _codes(rng, n, lo, hi):
    return [rng.integers(0, 4, size=int(rng.integers(lo, hi)),
                         dtype=np.uint8) for _ in range(n)]


def _mk_points(n_species=8, per=8, length=300):
    from meshclust_tpu.core.points import build_points
    from meshclust_tpu.io import fasta
    from tests.conftest import mutate, random_dna
    import __graft_entry__ as g
    rng = np.random.default_rng(7)
    seqs = []
    for s in range(n_species):
        base = random_dna(rng, length + int(rng.integers(-20, 20)))
        for c in range(per):
            seq = base if c == 0 else mutate(rng, base, 0.03)
            seqs.append(fasta.encode_record(f">sp{s}_c{c}", seq.encode()))
    ps = build_points(seqs, k=4, use_pallas=False)
    _, _, _, _, params = g._toy_model(V=ps.V)
    return ps, params


@requires_tpu
def test_histogram_pallas_compiles():
    from meshclust_tpu.ops import histogram as H
    rng = np.random.default_rng(0)
    B, L, k = 16, 256, 4
    codes = rng.integers(0, 4, size=(B, L)).astype(np.int32)
    lengths = rng.integers(k, L, size=B)
    valid = (np.arange(L)[None, :] < (lengths - (k - 1))[:, None])
    out = np.asarray(H.histogram_pallas(
        jnp.asarray(codes), jnp.asarray(valid), k))
    # numpy oracle
    ref = np.ones((B, 4 ** k), np.int64)
    for b in range(B):
        for i in range(int(lengths[b]) - k + 1):
            h = 0
            for j in range(k):
                h = h * 4 + int(codes[b, i + j])
            ref[b, h] += 1
    np.testing.assert_array_equal(out, ref)


@requires_tpu
def test_batch_align_pallas_single_block():
    from meshclust_tpu.ops.align_pallas import align_batch_128
    from meshclust_tpu.ops import align as A
    rng = np.random.default_rng(1)
    pairs = [(rng.integers(0, 4, size=int(rng.integers(40, 120)),
                           dtype=np.uint8),
              rng.integers(0, 4, size=int(rng.integers(40, 120)),
                           dtype=np.uint8)) for _ in range(40)]
    ids = align_batch_128(pairs, ba=120, bb=120)
    ref = A.align_identity_batch(pairs)
    np.testing.assert_array_equal(ids, ref)


@requires_tpu
@pytest.mark.parametrize("staged", [True, False])
def test_align_grid_kernel(staged):
    """The int8/int32 grid kernel (the round-1 hardware failure) on several
    row buckets, both operand paths."""
    from meshclust_tpu.ops.align_device import DeviceAligner
    from meshclust_tpu.ops import align as A
    rng = np.random.default_rng(2)
    # spread lengths across row buckets (64, ~96, ~160, ~320)
    codes = (_codes(rng, 20, 30, 60) + _codes(rng, 20, 70, 95)
             + _codes(rng, 20, 120, 160) + _codes(rng, 20, 250, 320))
    n = len(codes)
    pairs = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
             for _ in range(150)]
    da = DeviceAligner(codes, stage_mb=512 if staged else 0)
    assert da._can_stage() == staged
    alen, amatch = da.counts(pairs)
    ids = amatch.astype(np.float64) / np.maximum(alen, 1)
    ref = A.align_identity_batch(
        [(codes[a], codes[b]) for a, b in pairs])
    np.testing.assert_array_equal(ids, ref)


@requires_tpu
def test_accumulate_device_compiles():
    from meshclust_tpu.core.accumulate_device import accumulate_device
    from meshclust_tpu.core.bvec import BVec
    ps, params = _mk_points(n_species=8, per=8)
    bv = BVec(ps.lengths.copy(), 32)
    for i in range(ps.n):
        bv.insert(i, int(ps.lengths[i]))
    bv.insert_finalize()
    centers = accumulate_device(ps, bv, params, sim=0.90)
    assert sum(len(c.members) for c in centers) == ps.n


@requires_tpu
def test_phase_b_device_compiles():
    from meshclust_tpu.core.classify import DeviceBackend
    ps, params = _mk_points(n_species=6, per=8)
    be = DeviceBackend(ps, params)
    members = np.arange(ps.n)
    assign = np.sort(np.arange(ps.n) % 6).astype(np.int64)
    center_rows = np.arange(6) * 10
    a, ci, cv, th = be.phase_b_loop(members, assign, center_rows,
                                    delta=2, iterations=3)
    assert cv.any()
    assert th.shape[0] == 3


@requires_tpu
def test_device_backend_get_close_compiles():
    from meshclust_tpu.core.classify import DeviceBackend
    ps, params = _mk_points(n_species=6, per=8)
    be = DeviceBackend(ps, params)
    marks, is_min, best = be.get_close(0, np.arange(1, 50))
    assert marks.shape == (49,)


@requires_tpu
def test_tiled_long_aligner_compiles_and_matches():
    """Blockwise-tiled long-pair kernel: real Mosaic compile + parity with
    the XLA scan on pairs that fit both paths, plus one genuinely long pair
    (beyond the short kernel's 8192-row/32767-pack caps)."""
    from meshclust_tpu.ops import align as A
    from meshclust_tpu.ops.align_tiled import align_long_batch
    rng = np.random.default_rng(11)
    pairs = []
    for _ in range(8):
        la = int(rng.integers(700, 1600))
        a = rng.integers(0, 4, size=la, dtype=np.uint8)
        b = a.copy()
        pos = rng.integers(0, la, size=la // 15)
        b[pos] = (b[pos] + 1) % 4
        pairs.append((a, b[: la - int(rng.integers(0, 30))]))
    want = A.align_identity_batch(pairs)
    alen, amatch = align_long_batch(pairs, tile_h=512, tile_w=512)
    got = amatch / np.maximum(alen, 1.0)
    np.testing.assert_array_equal(got, want)

    # one long pair: 20kb mutated copy => identity near the mutation rate
    a = rng.integers(0, 4, size=20000, dtype=np.uint8)
    b = a.copy()
    pos = rng.integers(0, 20000, size=1500)
    b[pos] = (b[pos] + 1) % 4
    alen, amatch = align_long_batch([(a, b)])
    ident = amatch[0] / max(alen[0], 1)
    assert alen[0] >= 20000
    assert 0.9 < ident < 0.96, ident


@requires_tpu
def test_fused_probe_rounds_match_unfused():
    """Trainer.split's fused one-dispatch-per-round binary search must pick
    the SAME training pairs as the per-call path (float64 host compare on
    exact int kernel results — bucket-independent)."""
    from meshclust_tpu.core.points import build_points
    from meshclust_tpu.core.trainer import Trainer
    from meshclust_tpu.io import fasta
    from meshclust_tpu.ops.align_device import DeviceAligner
    from tests.conftest import mutate, random_dna
    rng = np.random.default_rng(23)
    seqs = []
    for s in range(10):
        base = random_dna(rng, 200 + int(rng.integers(-30, 30)))
        for c in range(20):
            seq = base if c == 0 else mutate(rng, base, 0.05)
            seqs.append(fasta.encode_record(f">p{s}_{c}", seq.encode()))
    ps = build_points(seqs, k=3, use_pallas=False)

    def make():
        tr = Trainer(ps, n_points=120, cutoff=0.90, max_pts_from_one=20,
                     k=3)
        tr._dev_aligner = DeviceAligner(ps.codes)
        return tr

    tr_fused = make()
    assert tr_fused._probe_aligner() is not None
    pairs_fused = tr_fused.split()

    tr_plain = make()
    tr_plain._dev_aligner.probe_rounds_supported = lambda: False
    pairs_plain = tr_plain.split()
    assert pairs_fused == pairs_plain


@requires_tpu
def test_ds_matches_float64_on_hardware():
    """The double-single classifier must deliver float64-class decisions on
    the REAL TPU compile stack (XLA-TPU forces excess-precision mode; the
    optimization barriers in ops/ds.py must survive it)."""
    import jax.numpy as jnp
    from meshclust_tpu.ops import ds, ds_classify as DSC
    from tests.test_ds import _host_score, _mk_stats
    import __graft_entry__ as g
    rng = np.random.default_rng(5)
    V = 256
    _, _, _, _, params = g._toy_model(V=V)
    man, dot, mag_a, mag_b, sq_a, sq_b, len_a, len_b = _mk_stats(rng, 4096,
                                                                 V)
    score64, f164 = _host_score(params, man, dot, mag_a, mag_b, sq_a, sq_b,
                                len_a, len_b, V)
    cb = DSC.const_block(params)
    f32 = lambda x: jnp.asarray(x, jnp.float32)   # noqa: E731

    @jax.jit
    def run(man, dot, mag_a, mag_b, sq_a, sq_b, len_a, len_b):
        return DSC.score(tuple(params.singles),
                         tuple((c, tuple(i)) for c, i in params.combos),
                         jnp.asarray(cb["mins2"]), jnp.asarray(cb["spans2"]),
                         jnp.asarray(cb["is_sim"]),
                         jnp.asarray(cb["weights2"]),
                         man, dot, mag_a, mag_b, sq_a, sq_b, len_a, len_b,
                         V)

    pos, f1h, f1l = run(f32(man), f32(dot), f32(mag_a), f32(mag_b),
                        f32(sq_a), f32(sq_b), f32(len_a), f32(len_b))
    clear = np.abs(score64) > 1e-10
    np.testing.assert_array_equal(np.asarray(pos)[clear],
                                  (score64 >= 0)[clear])
    f1ds = np.asarray(f1h, np.float64) + np.asarray(f1l, np.float64)
    np.testing.assert_allclose(f1ds, f164, rtol=1e-12, atol=1e-12)
