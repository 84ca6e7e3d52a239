"""Step cert vs ds accumulate center-by-center at 150k to find the first
differing decision."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from meshclust_tpu.core.points import build_points
from meshclust_tpu.core.bvec import BVec
from meshclust_tpu.io import fasta


def main():
    path = "/tmp/meshclust_bench_150000_1000.fasta"
    recs = fasta.read_fasta(path)
    ps = build_points(recs, k=5, use_pallas=False)
    from meshclust_tpu.core.trainer import Trainer
    tr = Trainer(ps, n_points=3000, cutoff=0.90, max_pts_from_one=20, k=5)
    params = tr.train(97.5).params

    from meshclust_tpu.core import accumulate_device as AD
    from meshclust_tpu.ops import ds_classify as DSC

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
        bin_start[b] = off
        bin_end[b] = off + sz
        bin_of[off:off + sz] = b
        off += sz
    dev = ps.device_arrays()
    sp = jnp.asarray(slots_point.astype(np.int32))
    hist_s = dev["hist"][sp]
    mag_s = dev["mag"][sp]
    sq_s = dev["sq"][sp]
    len_s = dev["len"][sp]
    cb = DSC.const_block(params)
    mins_a = jnp.asarray(cb["mins2"])
    maxs_a = jnp.asarray(cb["spans2"])
    weights_a = jnp.asarray(cb["weights2"])
    is_sim_a = jnp.asarray(params.is_sim)
    combos_l = [(c, list(ix)) for c, ix in params.combos]
    i32 = jnp.int32
    Cmax = N + 1

    def init_state():
        return dict(active=jnp.ones(N, bool).at[0].set(False),
                    owner=jnp.full(N, -1, i32), stamp=jnp.zeros(N, i32),
                    t=i32(0), seed=i32(0), c=i32(0),
                    cs=jnp.full(Cmax, -1, i32), done=jnp.bool_(False),
                    nfb=jnp.zeros(4, i32))

    fns = {}
    for mode in ("ds", "cert"):
        fns[mode] = AD.build_accumulate(N, ps.V, nbins, Cmax, 0.90,
                                        params.singles, combos_l, mode=mode)
    st = {m: init_state() for m in ("ds", "cert")}
    bb = jnp.asarray(np.asarray(bv.begin_bounds, np.int32))
    orig = jnp.arange(N, dtype=i32)
    K = 16
    step = 0
    while True:
        for m in ("ds", "cert"):
            s = st[m]
            lim = i32(int(s["c"]) + K)
            out = fns[m](hist_s, mag_s, sq_s, len_s, orig,
                         jnp.asarray(bin_of), jnp.asarray(bin_start),
                         jnp.asarray(bin_end), bb, mins_a, maxs_a,
                         is_sim_a, weights_a, s["active"], s["owner"],
                         s["stamp"], s["t"], s["seed"], s["c"], s["cs"],
                         s["done"], s["nfb"], lim)
            (s["active"], s["owner"], s["stamp"], s["t"], s["seed"],
             s["c"], s["cs"], s["done"], s["nfb"]) = out
        step += K
        a, b = st["ds"], st["cert"]
        same_owner = bool(jnp.all(a["owner"] == b["owner"]))
        same_active = bool(jnp.all(a["active"] == b["active"]))
        same_cs = bool(jnp.all(a["cs"] == b["cs"]))
        same_seed = int(a["seed"]) == int(b["seed"])
        print(f"c={int(a['c'])}/{int(b['c'])} t={int(a['t'])}/"
              f"{int(b['t'])} owner={same_owner} active={same_active} "
              f"cs={same_cs} seed={same_seed} nfb={np.asarray(b['nfb'])}",
              flush=True)
        if not (same_owner and same_active and same_cs and same_seed):
            ow_a = np.asarray(a["owner"]); ow_b = np.asarray(b["owner"])
            bad = np.nonzero(ow_a != ow_b)[0]
            print("first owner mismatch slots:", bad[:10])
            print("owners ds:", ow_a[bad[:10]], "cert:", ow_b[bad[:10]])
            cs_a = np.asarray(a["cs"]); cs_b = np.asarray(b["cs"])
            cbad = np.nonzero(cs_a != cs_b)[0]
            print("center mismatch at:", cbad[:10],
                  cs_a[cbad[:10]], cs_b[cbad[:10]])
            st_a = np.asarray(a["stamp"]); st_b = np.asarray(b["stamp"])
            np.savez("/tmp/bisect2.npz", ow_a=ow_a, ow_b=ow_b,
                     st_a=st_a, st_b=st_b, cs_a=cs_a, cs_b=cs_b,
                     slots_point=slots_point)
            break
        if bool(a["done"]) and bool(b["done"]):
            print("no divergence (!)")
            break


if __name__ == "__main__":
    main()
