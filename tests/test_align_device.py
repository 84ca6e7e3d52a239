"""Grid-batched device aligner (ops/align_device.py) vs the scalar oracle.

The TPU fast path is a Pallas grid over 128-lane pair blocks; here the same
grid program runs under the Pallas interpreter, and the DeviceAligner's host
logic (bucketing, lane padding, fallback) is exercised on the CPU backend.
"""
import numpy as np
import pytest

from meshclust_tpu.ops import align_device as AD
from tests import ref_impl


def _codes(rng, n, n_prob=0.0):
    c = rng.integers(0, 4, size=n).astype(np.uint8)
    if n_prob:
        c[rng.random(n) < n_prob] = 78
    return c


def _pack(codes_list, pair_idx, ba, bb, G):
    """Host-side packing mirroring DeviceAligner._run_chunk (non-staged)."""
    LANES = AD.LANES
    n = len(pair_idx)
    P = G * LANES
    Rpad = AD._round_up(ba + 1, 8)
    BL = AD._round_up(ba + bb + 2, 8)
    a_t = np.zeros((Rpad, P), np.int8)
    b_t = np.zeros((BL, P), np.int8)
    l1 = np.ones(P, np.int32)
    l2 = np.ones(P, np.int32)
    for p, (ia, ib) in enumerate(pair_idx):
        ca, cb = codes_list[ia], codes_list[ib]
        a_t[1: len(ca) + 1, p] = ca
        b_t[: len(cb), p] = cb
        l1[p] = len(ca)
        l2[p] = len(cb)
    s = (l1 + l2).reshape(G, LANES)
    return (a_t, b_t, l1.reshape(1, P), l2.reshape(1, P),
            s.min(1, keepdims=True).astype(np.int32),
            s.max(1, keepdims=True).astype(np.int32))


@pytest.mark.parametrize("G", [1, 2])
def test_grid_kernel_matches_oracle(rng, G):
    import jax.numpy as jnp
    codes = [_codes(rng, int(rng.integers(5, 70)), 0.05) for _ in range(40)]
    pair_idx = [(int(rng.integers(40)), int(rng.integers(40)))
                for _ in range(G * AD.LANES)]
    ops = _pack(codes, pair_idx, 72, 72, G)
    alen, amatch = AD._align_packed(
        *[jnp.asarray(x) for x in ops], G=G, match=1, mismatch=-1, go=2,
        gc=1, interpret=True)
    alen = np.asarray(alen)
    amatch = np.asarray(amatch)
    for t, (ia, ib) in enumerate(pair_idx[: 2 * AD.LANES]):
        _, el, em, _ = ref_impl.glob_align(codes[ia], codes[ib])
        assert alen[t] == el and amatch[t] == em, f"pair {t}"


def test_grid_degenerate_pad_blocks(rng):
    """Full-pad blocks (l1=l2=1) are swept in one diagonal and return the
    1x1 result without touching real lanes."""
    import jax.numpy as jnp
    codes = [_codes(rng, 30), _codes(rng, 25)]
    # block 0: one real pair + tail replication; block 1: all-degenerate
    pair_idx = [(0, 1)] + [(0, 0)] * (AD.LANES - 1)
    ops = list(_pack(codes, pair_idx, 32, 32, 1))
    G = 2
    P = G * AD.LANES
    a_t = np.zeros((ops[0].shape[0], P), np.int8)
    b_t = np.zeros((ops[1].shape[0], P), np.int8)
    a_t[:, : AD.LANES] = ops[0]
    b_t[:, : AD.LANES] = ops[1]
    l1 = np.ones((1, P), np.int32)
    l2 = np.ones((1, P), np.int32)
    l1[0, : AD.LANES] = ops[2][0]
    l2[0, : AD.LANES] = ops[3][0]
    s = (l1 + l2).reshape(G, AD.LANES)
    dmin = s.min(1, keepdims=True).astype(np.int32)
    dmax = s.max(1, keepdims=True).astype(np.int32)
    alen, amatch = AD._align_packed(
        jnp.asarray(a_t), jnp.asarray(b_t), jnp.asarray(l1), jnp.asarray(l2),
        jnp.asarray(dmin), jnp.asarray(dmax), G=G, match=1, mismatch=-1,
        go=2, gc=1, interpret=True)
    _, el, em, _ = ref_impl.glob_align(codes[0], codes[1])
    assert int(np.asarray(alen)[0]) == el
    assert int(np.asarray(amatch)[0]) == em


def test_device_aligner_cpu_fallback(rng):
    """On the CPU test backend, identities() routes to the XLA scan path and
    matches the oracle."""
    codes = [_codes(rng, int(rng.integers(20, 90))) for _ in range(12)]
    al = AD.DeviceAligner(codes)
    pairs = [(i, (i + 3) % 12) for i in range(12)]
    got = al.identities(pairs)
    for t, (ia, ib) in enumerate(pairs):
        _, el, em, _ = ref_impl.glob_align(codes[ia], codes[ib])
        assert abs(got[t] - em / max(el, 1)) < 1e-12


def test_windowed_shrink_stages_match_oracle(rng):
    """Long and length-asymmetric pairs drive the row-windowed kernel
    (ops/align_window.py) through its shrink stages and the w0 clamp; every
    lane must still match the scalar oracle exactly."""
    import jax.numpy as jnp
    # lengths chosen so blocks mix l1 >> l2, l2 >> l1, square, and tiny
    lens = [200, 190, 60, 12, 150, 199, 30, 180]
    codes = [_codes(rng, ln, 0.03) for ln in lens]
    pair_idx = [(i % 8, (i * 3 + 1) % 8) for i in range(AD.LANES)]
    ops = _pack(codes, pair_idx, 200, 200, 1)
    alen, amatch = AD._align_packed(
        *[jnp.asarray(x) for x in ops], G=1, match=1, mismatch=-1, go=2,
        gc=1, interpret=True)
    alen = np.asarray(alen)
    amatch = np.asarray(amatch)
    seen = set()
    for t, (ia, ib) in enumerate(pair_idx):
        if (ia, ib) in seen:
            continue
        seen.add((ia, ib))
        _, el, em, _ = ref_impl.glob_align(codes[ia], codes[ib])
        assert alen[t] == el and amatch[t] == em, f"pair {t} ({ia},{ib})"


def test_windowed_equals_full_kernel(rng, monkeypatch):
    """Windowed and full-row kernels produce identical (alen, amatch)."""
    import jax.numpy as jnp
    codes = [_codes(rng, int(rng.integers(40, 140)), 0.05) for _ in range(20)]
    pair_idx = [(int(rng.integers(20)), int(rng.integers(20)))
                for _ in range(AD.LANES)]
    ops = [jnp.asarray(x) for x in _pack(codes, pair_idx, 144, 144, 1)]
    kw = dict(G=1, match=1, mismatch=-1, go=2, gc=1, interpret=True)
    monkeypatch.setenv("MESHCLUST_ALIGN_WINDOWED", "0")
    AD._align_packed.clear_cache()
    alen0, am0 = AD._align_packed(*ops, **kw)
    monkeypatch.setenv("MESHCLUST_ALIGN_WINDOWED", "1")
    AD._align_packed.clear_cache()
    alen1, am1 = AD._align_packed(*ops, **kw)
    AD._align_packed.clear_cache()
    np.testing.assert_array_equal(np.asarray(alen0), np.asarray(alen1))
    np.testing.assert_array_equal(np.asarray(am0), np.asarray(am1))
