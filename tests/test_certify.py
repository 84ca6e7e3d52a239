"""Certified-f32 bounds (ops/certify.py): the error bound must dominate the
actual f32-vs-f64 discrepancy on random and adversarial integer inputs, and
certified decisions must match the DS (f64-class) decisions."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meshclust_tpu.ops import certify as CT
from meshclust_tpu.ops import ds as DS
from meshclust_tpu.ops import ds_classify as DSC
from meshclust_tpu.ops import features as F

SINGLES = (F.FEAT_INTERSECTION, F.FEAT_LD, F.FEAT_PEARSON,
           F.FEAT_MANHATTAN, F.FEAT_KULCZYNSKI2, F.FEAT_SIMRATIO)
COMBOS = ((F.COMBO_SELF, (0, 1)), (F.COMBO_SQUARED, (3, 1)),
          (F.COMBO_SELF, (2,)), (F.COMBO_SQUARED, (4, 5)))


def _random_stats(rng, n, V, maxc=60):
    """Plausible integer statistics from actual random histograms."""
    h = rng.integers(1, maxc, size=(n, V)).astype(np.int64)
    hc = rng.integers(1, maxc, size=V).astype(np.int64)
    man = np.abs(h - hc).sum(1)
    dot = h @ hc
    mag_a = h.sum(1)
    mag_b = np.full(n, hc.sum())
    sq_a = (h * h).sum(1)
    sq_b = np.full(n, hc @ hc)
    len_a = rng.integers(500, 1500, n)
    len_b = np.full(n, 1000)
    return tuple(x.astype(np.float32)
                 for x in (man, dot, mag_a, mag_b, sq_a, sq_b,
                           len_a, len_b))


def _f64_score(singles, combos, mins, maxs, weights, is_sim, stats, V):
    man, dot, mag_a, mag_b, sq_a, sq_b, len_a, len_b = \
        [np.asarray(s, np.float64) for s in stats]
    cols = []
    for flag in singles:
        if flag == F.FEAT_LD:
            v = np.abs(len_a - len_b)
        elif flag == F.FEAT_MANHATTAN:
            v = man
        elif flag == F.FEAT_INTERSECTION:
            v = (mag_a + mag_b - man) / (mag_a + mag_b)
        elif flag == F.FEAT_KULCZYNSKI2:
            ap, aq = mag_a / V, mag_b / V
            min_sum = (mag_a + mag_b - man) / 2
            v = V * (ap + aq) / (2 * ap * aq) * min_sum
        elif flag == F.FEAT_SIMRATIO:
            norm2 = np.maximum(sq_a + sq_b - 2 * dot, 0.0)
            v = dot / (dot + np.sqrt(norm2))
        elif flag == F.FEAT_PEARSON:
            ap = np.floor(mag_a / V + 0.5)
            aq = np.floor(mag_b / V + 0.5)
            np_ = sq_a - 2 * ap * mag_a + V * ap * ap
            nq_ = sq_b - 2 * aq * mag_b + V * aq * aq
            dotc = dot - ap * mag_b - aq * mag_a + V * ap * aq
            v = dotc / np.sqrt(np.maximum(0.5, np_ * nq_))
        else:
            raise AssertionError(flag)
        cols.append(v)
    cols = np.stack(cols, -1)
    mins64 = np.asarray(mins, np.float64)
    maxs64 = np.asarray(maxs, np.float64)
    norm = (cols - mins64) / (maxs64 - mins64)
    norm = np.where(is_sim, norm, 1.0 - norm)
    w = np.asarray(weights, np.float64)
    score = np.full(len(man), w[0])
    f1 = None
    for j, (combo, idx) in enumerate(combos):
        prod = np.ones(len(man))
        for i in idx:
            c = norm[:, i]
            prod = prod * (c * c if combo == F.COMBO_SQUARED else c)
        if j == 0:
            f1 = prod
        score = score + w[j + 1] * prod
    return score, f1


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bound_dominates_f64_gap(rng, seed):
    r = np.random.default_rng(seed)
    V = 64
    stats = _random_stats(r, 4096, V)
    S = len(SINGLES)
    mins = r.uniform(-1, 0.2, S).astype(np.float32)
    maxs = (mins + r.uniform(0.5, 600, S)).astype(np.float32)
    weights = r.normal(0, 2, len(COMBOS) + 1).astype(np.float32)
    is_sim = np.asarray([True, False, True, False, True, True])

    def run(*st):
        spans = (maxs.astype(np.float64)
                 - mins.astype(np.float64)).astype(np.float32)
        return CT.score(SINGLES, COMBOS, jnp.asarray(mins),
                        jnp.asarray(spans), jnp.asarray(is_sim),
                        jnp.asarray(weights), *map(jnp.asarray, st), V=V)

    s32, eps_s, f132, eps_f1 = jax.jit(run)(*stats)
    s64, f164 = _f64_score(SINGLES, COMBOS, mins, maxs, weights, is_sim,
                           stats, V)
    gap_s = np.abs(np.asarray(s32, np.float64) - s64)
    gap_f1 = np.abs(np.asarray(f132, np.float64) - f164)
    assert np.all(gap_s <= np.asarray(eps_s)), \
        f"score bound violated: max excess {np.max(gap_s - eps_s)}"
    assert np.all(gap_f1 <= np.asarray(eps_f1))
    # the bound must also be USEFUL: certain on the overwhelming majority
    frac_uncertain = np.mean(np.abs(s32) <= np.asarray(eps_s))
    assert frac_uncertain < 0.01


def test_certified_pos_matches_ds(rng):
    r = np.random.default_rng(7)
    V = 64
    stats = _random_stats(r, 8192, V)
    S = len(SINGLES)
    mins = r.uniform(-1, 0.2, S)
    maxs = mins + r.uniform(0.5, 600, S)
    # weights chosen so scores straddle 0
    weights = r.normal(0, 1.0, len(COMBOS) + 1)
    is_sim = np.asarray([True, False, True, False, True, True])

    def stack(x):
        hi, lo = DS.from_f64(x)
        return jnp.asarray(np.stack([hi, lo]))

    mins2, spans2 = stack(mins), stack(maxs - mins)
    w2 = stack(weights)
    pos_ds, f1h, f1l = jax.jit(lambda *st: DSC.score(
        SINGLES, COMBOS, mins2, spans2, jnp.asarray(is_sim), w2,
        *map(jnp.asarray, st), V=V))(*stats)

    mins32 = mins.astype(np.float32)
    maxs32 = maxs.astype(np.float32)
    w32 = weights.astype(np.float32)
    spans32 = (maxs - mins).astype(np.float32)
    s32, eps_s, _, _ = jax.jit(lambda *st: CT.score(
        SINGLES, COMBOS, jnp.asarray(mins32), jnp.asarray(spans32),
        jnp.asarray(is_sim), jnp.asarray(w32), *map(jnp.asarray, st),
        V=V))(*stats)
    s32 = np.asarray(s32)
    eps_s = np.asarray(eps_s)
    pos_ds = np.asarray(pos_ds)
    certain = np.abs(s32) > eps_s
    assert np.mean(certain) > 0.99
    assert np.array_equal(s32[certain] >= 0, pos_ds[certain])


def test_exact_floor_div():
    r = np.random.default_rng(3)
    a = r.integers(0, 1 << 24, 20000).astype(np.int32)
    b = r.integers(1, 1 << 20, 20000).astype(np.int32)
    # adversarial: exact multiples and off-by-one
    a[:3000] = (a[:3000] // np.maximum(b[:3000], 1)) * b[:3000]
    a[3000:6000] = a[3000:6000] - (a[3000:6000] % b[3000:6000]) + 1
    q = np.asarray(jax.jit(CT.exact_floor_div)(jnp.asarray(a),
                                               jnp.asarray(b)))
    assert np.array_equal(q, a // b)


def test_distance_d_bound():
    r = np.random.default_rng(4)
    dist = r.integers(0, 1 << 23, 50000).astype(np.float32)
    mg = (dist + r.integers(1, 1 << 22, 50000)).astype(np.float32)
    d32, eps = jax.jit(CT.distance_d)(jnp.asarray(dist), jnp.asarray(mg))
    frac = dist.astype(np.float64) / np.maximum(mg, 1.0)
    d64 = 10000.0 * (1.0 - frac * frac)
    gap = np.abs(np.asarray(d32, np.float64) - d64)
    assert np.all(gap <= np.asarray(eps))
    assert np.median(np.asarray(eps)) < 0.05
