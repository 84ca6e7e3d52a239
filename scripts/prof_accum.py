"""Microbenchmark the Phase-A absorb-iteration sweep components on TPU.

Times, per absorb iteration at [N, V]:
  - man+dot statistics alone (u8 hist, fused convert)
  - full DS classify (score only)
  - mean-argmin distance_d pass
  - the combined inner_body cost via the real build_accumulate program
Run: python scripts/prof_accum.py [N] [V]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
V = int(sys.argv[2]) if len(sys.argv) > 2 else 256

rng = np.random.default_rng(0)
hist = jnp.asarray(rng.integers(1, 30, size=(N, V), dtype=np.uint8))
mag = jnp.asarray(rng.integers(1000, 1400, N).astype(np.float32))
sq = jnp.asarray(rng.integers(5000, 9000, N).astype(np.float32))
lens = jnp.asarray(rng.integers(900, 1100, N).astype(np.float32))


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t) / reps
    print(f"{name:<34s} {dt*1e3:8.3f} ms  "
          f"({N*V/dt/1e9:7.1f} G elem/s)")
    return dt


@jax.jit
def man_dot(h, c):
    hf = h.astype(jnp.float32)
    cf = hf[c]
    man = jnp.sum(jnp.abs(hf - cf[None, :]), axis=1)
    dot = hf @ cf
    return man, dot


@jax.jit
def man_dot_u8(h, c):
    hi = h.astype(jnp.int32)
    ci = hi[c]
    man = jnp.sum(jnp.abs(hi - ci[None, :]), axis=1).astype(jnp.float32)
    dot = jnp.sum(hi * ci[None, :], axis=1).astype(jnp.float32)
    return man, dot


@jax.jit
def argmin_pass(h, sumvec, count, mask):
    hf = h.astype(jnp.float32)
    mean = sumvec / count
    cw = jnp.floor(mean)
    dist = 2.0 * jnp.sum(jnp.minimum(hf, cw[None, :]), axis=1)
    mg = mag + jnp.sum(cw)
    frac = dist / jnp.maximum(mg, 1.0)
    d = 10000.0 * (1.0 - frac * frac)
    return jnp.argmin(jnp.where(mask, d, np.inf))


from meshclust_tpu.ops import ds as DS  # noqa: E402
from meshclust_tpu.ops import ds_classify as DSC  # noqa: E402
from meshclust_tpu.ops import features as F  # noqa: E402

singles = (F.FEAT_INTERSECTION, F.FEAT_LD, F.FEAT_PEARSON, F.FEAT_MANHATTAN)
combos = ((F.COMBO_SELF, (0, 1)), (F.COMBO_SQUARED, (3, 1)),
          (F.COMBO_SELF, (2,)))
mins2 = jnp.asarray(np.zeros((2, 4), np.float32))
spans2 = jnp.asarray(np.stack([np.ones(4, np.float32),
                               np.zeros(4, np.float32)]))
weights2 = jnp.asarray(np.stack([np.array([0.1, 2.0, -1.0, 0.5], np.float32),
                                 np.zeros(4, np.float32)]))
is_sim = jnp.asarray(np.array([True, False, True, False]))


@jax.jit
def ds_score_only(man, dot, c):
    return DSC.score(singles, combos, mins2, spans2, is_sim, weights2,
                     man, dot, mag, mag[c], sq, sq[c], lens, lens[c], V)


@jax.jit
def full_iter_ds(h, c, sumvec, count, mask):
    man, dot = man_dot(h, c)
    pos, f1h, f1l = ds_score_only(man, dot, c)
    pos = pos & mask
    posf = pos.astype(jnp.float32)
    sv = sumvec + jax.lax.dot_general(
        posf[None, :], h.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    cnt = count + jnp.sum(posf)
    am = argmin_pass(h, sv, cnt, mask)
    return sv, cnt, am, f1h


c = 0
mask = jnp.ones(N, bool)
sumvec = hist[0].astype(jnp.float32)
count = jnp.float32(1.0)

print(f"N={N} V={V}  bytes(u8 hist)={N*V/1e6:.0f} MB  "
      f"f32={N*V*4/1e6:.0f} MB")
t_md = timeit("man+dot (f32 convert)", man_dot, hist, c)
t_md8 = timeit("man+dot (int32)", man_dot_u8, hist, c)
m, d = man_dot(hist, c)
t_ds = timeit("DS score only ([N] ops)", ds_score_only, m, d, c)
t_am = timeit("mean-argmin pass", argmin_pass, hist, sumvec, count, mask)
t_full = timeit("full iter (man+dot+DS+sumvec+argmin)", full_iter_ds,
                hist, c, sumvec, count, mask)
print(f"sum of parts: {(t_md+t_ds+t_am)*1e3:.3f} ms")

# ---- granular breakdown ----------------------------------------------------
@jax.jit
def argmin_a(h, sumvec, count):
    hf = h.astype(jnp.float32)
    mean = sumvec / count
    cw = jnp.floor(mean)
    dist = 2.0 * jnp.sum(jnp.minimum(hf, cw[None, :]), axis=1)
    return dist

@jax.jit
def argmin_b(dist, mask, cwsum):
    mg = mag + cwsum
    frac = dist / jnp.maximum(mg, 1.0)
    d = 10000.0 * (1.0 - frac * frac)
    return jnp.argmin(jnp.where(mask, d, np.inf))

@jax.jit
def f32_score(man, dot, c):
    from meshclust_tpu.core.classify import _score_rows_f32
    mins1 = jnp.zeros(4, jnp.float32)
    maxs1 = jnp.ones(4, jnp.float32)
    w1 = jnp.asarray([0.1, 2.0, -1.0, 0.5], jnp.float32)
    return _score_rows_f32(singles, combos, V, man, dot, mag, mag[c],
                           sq, sq[c], lens, lens[c], mins1, maxs1,
                           is_sim, w1)

d0 = argmin_a(hist, sumvec, count)
timeit("argmin: [N,V] dist pass", argmin_a, hist, sumvec, count)
timeit("argmin: [N] d + argmin", argmin_b, d0, mask, jnp.float32(100.0))
timeit("f32 score ([N] ops)", f32_score, m, d, c)
for n2 in (1024, 16384):
    m2, d2 = m[:n2], d[:n2]
    @jax.jit
    def ds_small(man2, dot2):
        return DSC.score(singles, combos, mins2, spans2, is_sim, weights2,
                         man2, dot2, mag[:n2], mag[0], sq[:n2], sq[0],
                         lens[:n2], lens[0], V)
    out = ds_small(m2, d2); jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(20):
        out = ds_small(m2, d2)
    jax.block_until_ready(out)
    print(f"DS score at N={n2:<8d} {(time.perf_counter()-t)/20*1e3:8.3f} ms")
