"""Feature statistics derived from (man, dot) sums vs the scalar oracles."""
import numpy as np
import pytest

from meshclust_tpu.ops import features as F
from meshclust_tpu.ops import glm
from tests import ref_impl


def _hists(rng, n=6, V=256, hi=12):
    return rng.integers(1, hi, size=(n, V)).astype(np.int64)


def test_derived_stats_match_oracles(rng):
    V = 256
    h = _hists(rng, 6, V)
    lens = rng.integers(100, 2000, size=6).astype(np.int64)
    st = F.seq_stats(h)
    man, dot = F.pair_sums_exact(h, h)
    mag_a = st["mag"][:, None].astype(np.float64)
    mag_b = st["mag"][None, :].astype(np.float64)
    sq_a = st["sq"][:, None].astype(np.float64)
    sq_b = st["sq"][None, :].astype(np.float64)
    len_a = lens[:, None].astype(np.float64)
    len_b = lens[None, :].astype(np.float64)

    args = dict(man=man, dot=dot, mag_a=mag_a, mag_b=mag_b, sq_a=sq_a,
                sq_b=sq_b, len_a=len_a, len_b=len_b, V=V)
    inter = F.raw_from_sums(F.FEAT_INTERSECTION, **args)
    manh = F.raw_from_sums(F.FEAT_MANHATTAN, **args)
    pear = F.raw_from_sums(F.FEAT_PEARSON, **args)
    kulc = F.raw_from_sums(F.FEAT_KULCZYNSKI2, **args)
    simr = F.raw_from_sums(F.FEAT_SIMRATIO, **args)
    ld = F.raw_from_sums(F.FEAT_LD, **args)

    for i in range(6):
        for j in range(6):
            p, q = h[i], h[j]
            mi = int(st["mag"][i])
            mj = int(st["mag"][j])
            assert inter[i, j] == pytest.approx(
                ref_impl.intersection(p, q, mi, mj), rel=1e-12)
            assert manh[i, j] == ref_impl.manhattan(p, q)
            assert pear[i, j] == pytest.approx(
                ref_impl.pearson(p, q, mi, mj), rel=1e-9)
            assert kulc[i, j] == pytest.approx(
                ref_impl.kulczynski2(p, q, mi, mj), rel=1e-12)
            assert simr[i, j] == pytest.approx(
                ref_impl.simratio(p, q), rel=1e-12)
            assert ld[i, j] == ref_impl.length_difference(
                int(lens[i]), int(lens[j]))


def test_device_sums_match_exact(rng):
    import jax.numpy as jnp
    h = _hists(rng, 5, 128, hi=30)
    man_e, dot_e = F.pair_sums_exact(h, h)
    man_d, dot_d = F.pair_sums_device(jnp.asarray(h, jnp.int32),
                                      jnp.asarray(h, jnp.int32))
    np.testing.assert_array_equal(np.asarray(man_d, np.int64), man_e)
    np.testing.assert_array_equal(np.asarray(dot_d, np.int64), dot_e)


def test_js_exact_vs_table(rng):
    h = _hists(rng, 3, 64)
    st = F.seq_stats(h)
    exact = F.jenson_shannon_pairs(h, h, st["mag"], st["mag"])
    tbl = F.js_table(1_000_000)
    approx = F.jenson_shannon_pairs(h, h, st["mag"], st["mag"], table=tbl)
    # the reference table quantizes log(pp/avg); close but not equal
    np.testing.assert_allclose(approx, exact, atol=5e-3)
    for i in range(3):
        assert exact[i, i] == pytest.approx(0.0, abs=1e-12)
        want = ref_impl.jenson_shannon(h[i], h[(i + 1) % 3],
                                       int(st["mag"][i]),
                                       int(st["mag"][(i + 1) % 3]))
        assert exact[i, (i + 1) % 3] == pytest.approx(want, rel=1e-10)


def test_sqchord(rng):
    h = _hists(rng, 3, 64)
    ex = F.extra_sums_exact(h, h)["sqchord"]
    for i in range(3):
        for j in range(3):
            assert ex[i, j] == pytest.approx(
                ref_impl.squaredchord(h[i], h[j]), rel=1e-10)


def test_feature_pipeline_normalize_and_combo():
    f = F.Feature(V=64)
    f.add_feature(F.FEAT_INTERSECTION | F.FEAT_LD, F.COMBO_SELF)
    f.add_feature(F.FEAT_MANHATTAN | F.FEAT_LD, F.COMBO_SQUARED)
    # lookup dedups: FEAT_LD appears once
    assert sorted(f.lookup) == sorted(
        [F.FEAT_INTERSECTION, F.FEAT_LD, F.FEAT_MANHATTAN])
    f.normalize_raw({
        F.FEAT_INTERSECTION: np.array([0.2, 0.8]),
        F.FEAT_LD: np.array([10.0, 50.0]),
        F.FEAT_MANHATTAN: np.array([100.0, 300.0]),
    })
    f.finalize()
    cache = np.array([0.5, 30.0, 200.0])  # raw singles in lookup order
    # order of lookup: INTERSECTION(16) first? add order: 2 then 16 -> LD
    # appears first (bit 2 < bit 16 scanned low to high)
    raw = {F.FEAT_INTERSECTION: 0.5, F.FEAT_LD: 30.0, F.FEAT_MANHATTAN: 200.0}
    cache = np.array([raw[flag] for flag in f.lookup])
    norm = f.normalize_cache(cache)
    # intersection is sim: (0.5-0.2)/0.6 = 0.5; LD is dist: 1-0.5 = 0.5;
    # manhattan is dist: 1-0.5 = 0.5
    np.testing.assert_allclose(norm, [0.5, 0.5, 0.5])
    cols = f.combo_columns(norm)
    np.testing.assert_allclose(cols, [0.25, 0.0625])


def test_glm_roundtrip(rng):
    X = np.concatenate([np.ones((200, 1)), rng.normal(size=(200, 2))], axis=1)
    w_true = np.array([0.3, 2.0, -1.5])
    y = np.where(X @ w_true >= 0, 1.0, -1.0)
    w = glm.train(X, y)
    preds = np.where(glm.predict(X, w) == 1, 1, -1)
    acc, sens, spec = glm.accuracy(y, preds)
    assert acc > 95.0


def _rree_scalar_oracle(p, q):
    """Direct transcription of Feature::rree_k_r (Feature.cpp:447-475),
    scalar loops + the fastlog4 bit trick, as the parity oracle."""
    import struct

    def fastlog2(x):
        (i,) = struct.unpack("<I", struct.pack("<f", np.float32(x)))
        (mx,) = struct.unpack("<f", struct.pack(
            "<I", (i & 0x007FFFFF) | (0x7E << 23)))
        y = np.float32(float(np.float32(i)) * (1.0 / (1 << 23)))
        return np.float32(
            y - np.float32(124.22544637) - np.float32(1.498030302)
            * np.float32(mx) - np.float32(1.72587999)
            / (np.float32(0.3520887068) + np.float32(mx)))

    N = len(p)
    op = oq = 0.0
    for off in range(0, N, 4):
        psum = int(sum(p[off:off + 4]))
        qsum = int(sum(q[off:off + 4]))
        ip = iq = 0.0
        for j in range(4):
            cp = float(p[off + j]) / psum
            cq = float(q[off + j]) / qsum
            avg = 0.5 * (cp + cq)
            ip += cp * float(fastlog2(np.float32(cp / avg)) / np.float32(2))
            iq += cq * float(fastlog2(np.float32(cq / avg)) / np.float32(2))
        op += ip
        oq += iq
    return 0.5 * (op + oq)


def test_rree_k_r_matches_scalar_oracle(rng):
    V = 64
    h = _hists(rng, 5, V)
    got = F.rree_k_r_pairs(h[:, None, :], h[None, :, :])
    for i in range(5):
        for j in range(5):
            want = _rree_scalar_oracle(h[i], h[j])
            assert got[i, j] == pytest.approx(want, rel=1e-12, abs=1e-12)
    # identical distributions diverge by ~0 (fastlog4(1) != 0 exactly,
    # but the approximation error is the same lane-wise)
    assert abs(got[0, 0]) < 1e-2
    # wired into raw_from_sums via extras
    r = F.raw_from_sums(F.FEAT_RREE_K_R, man=0, dot=0, mag_a=0, mag_b=0,
                        sq_a=0, sq_b=0, len_a=0, len_b=0, V=V,
                        extras={"rree": got})
    assert np.array_equal(r, got)
