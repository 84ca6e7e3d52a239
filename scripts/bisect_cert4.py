"""Zoom on the first diverging mean-argmin (center 679 at 150k): dump the
member set, compute the f64 oracle, and compare ds vs cert winners."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

captured = {}
from meshclust_tpu.core import accumulate_device as AD
orig_acc = AD.accumulate_device


def spy(ps, bv, params, sim, cmax_hint=0):
    captured.update(ps=ps, bv=bv, params=params)
    return orig_acc(ps, bv, params, sim, cmax_hint)


def main():
    AD.accumulate_device = spy
    os.environ["MESHCLUST_EXACT_MODE"] = "ds"
    from meshclust_tpu.config import ClusterConfig
    from meshclust_tpu.core import runner
    runner.run(ClusterConfig(
        files=["/tmp/meshclust_bench_150000_1000.fasta"],
        output="/tmp/bisect4.clstr", similarity=0.90))
    ps = captured["ps"]
    params = captured["params"]

    from meshclust_tpu.ops import ds_classify as DSC
    from meshclust_tpu.core.bvec import BVec
    bv = BVec(ps.lengths.copy(), 1000)
    bv.bulk_insert(ps.lengths)
    bv.insert_finalize()
    slots_point = np.concatenate([np.asarray(b, np.int64) for b in bv.idx])
    N = slots_point.shape[0]
    nbins = len(bv.idx)
    bin_start = np.zeros(nbins, np.int32)
    bin_end = np.zeros(nbins, np.int32)
    off = 0
    bin_of = np.zeros(N, np.int32)
    for b, sz in enumerate(len(x) for x in bv.idx):
        bin_start[b], bin_end[b] = off, off + sz
        bin_of[off:off + sz] = b
        off += sz
    dev = ps.device_arrays()
    sp = jnp.asarray(slots_point.astype(np.int32))
    hist_s = dev["hist"][sp]
    mag_s = dev["mag"][sp]
    sq_s = dev["sq"][sp]
    len_s = dev["len"][sp]
    cb = DSC.const_block(params)
    consts = (jnp.asarray(cb["mins2"]), jnp.asarray(cb["spans2"]),
              jnp.asarray(params.is_sim), jnp.asarray(cb["weights2"]))
    combos_l = [(c, list(ix)) for c, ix in params.combos]
    i32 = jnp.int32
    Cmax = N + 1
    fns = {m: AD.build_accumulate(N, ps.V, nbins, Cmax, 0.90,
                                  params.singles, combos_l, mode=m)
           for m in ("ds", "cert")}

    def init_state():
        return [jnp.ones(N, bool).at[0].set(False),
                jnp.full(N, -1, i32), jnp.zeros(N, i32),
                i32(0), i32(0), i32(0),
                jnp.full(Cmax, -1, i32), jnp.bool_(False),
                jnp.zeros(4, i32)]

    bb = jnp.asarray(np.asarray(bv.begin_bounds, np.int32))
    orig = jnp.arange(N, dtype=i32)
    args0 = (hist_s, mag_s, sq_s, len_s, orig, jnp.asarray(bin_of),
             jnp.asarray(bin_start), jnp.asarray(bin_end), bb,
             consts[0], consts[1], consts[2], consts[3])

    def advance(st, fn, limit):
        out = fn(*args0, *st, i32(limit))
        return list(out)

    # run ds to c = 679 (REUSE one state since both agree up to there)
    st = init_state()
    while int(st[5]) < 679:
        st = advance(st, fns["ds"], min(679, int(st[5]) + 64))
    print("at c =", int(st[5]), flush=True)
    import copy
    st_ds = advance([jnp.array(x) for x in st], fns["ds"], 680)
    st_ct = advance([jnp.array(x) for x in st], fns["cert"], 680)
    ow_d = np.asarray(st_ds[1]); ow_c = np.asarray(st_ct[1])
    cs_d = np.asarray(st_ds[6]); cs_c = np.asarray(st_ct[6])
    mem_d = np.nonzero(ow_d == 679)[0]
    mem_c = np.nonzero(ow_c == 679)[0]
    print("members equal:", np.array_equal(mem_d, mem_c), len(mem_d))
    print("center ds:", cs_d[679], " cert:", cs_c[679])
    st_a = np.asarray(st_ds[2])

    # f64 oracle for get_mean over these members, in (stamp, slot) order
    h = np.asarray(hist_s[jnp.asarray(mem_d)], np.float64)
    order = np.lexsort((mem_d, st_a[mem_d]))
    mem_o = mem_d[order]
    h_o = h[order]
    c64 = h_o.sum(0) / len(mem_o)
    cw = np.floor(c64)
    dist = 2.0 * np.minimum(h_o, cw[None, :]).sum(1)
    mg = np.floor(h_o + c64[None, :]).sum(1)
    frac = dist / mg
    d = 10000.0 * (1.0 - frac * frac)
    w = int(np.argmin(d))
    print("oracle winner slot:", mem_o[w], "d:", d[w])
    for lbl, slot in (("ds", cs_d[679]), ("cert", cs_c[679])):
        ix = np.nonzero(mem_o == slot)[0]
        if len(ix):
            print(f"  {lbl} winner d={d[ix[0]]!r} dist={dist[ix[0]]} "
                  f"mg={mg[ix[0]]}")
    # certified-path values
    from meshclust_tpu.ops import certify as CT
    sum_i = h_o.sum(0).astype(np.int64)
    cnt = len(mem_o)
    cw_exact = sum_i // cnt
    print("cw match:", np.array_equal(cw_exact, cw.astype(np.int64)))
    dist32 = (2.0 * np.minimum(h_o, cw[None, :]).sum(1)).astype(np.float32)
    mg32 = mg.astype(np.float32)
    d32, eps = CT.distance_d(jnp.asarray(dist32), jnp.asarray(mg32))
    d32 = np.asarray(d32); eps = np.asarray(eps)
    w32 = int(np.argmin(d32))
    print("f32 winner slot:", mem_o[w32], "d32:", d32[w32], "eps:",
          eps[w32])
    mh = d32.min()
    near = d32 <= mh + eps + eps.max()
    print("near count:", near.sum(), "distinct pairs:",
          len({(float(dist32[i]), float(mg32[i]))
               for i in np.nonzero(near)[0]}))
    # gap between oracle winner and f32 winner
    print("d64 at f32 winner:", d[w32], " d64 min:", d[w], "gap:",
          d[w32] - d[w])
    np.savez("/tmp/bisect4.npz", mem_o=mem_o, h_o=h_o.astype(np.int32),
             st=st_a[mem_o])


if __name__ == "__main__":
    main()
