"""Capture the CLI's exact accumulate inputs, then step ds vs cert."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

captured = {}

from meshclust_tpu.core import meanshift as MS_mod
from meshclust_tpu.core import accumulate_device as AD

orig_acc = AD.accumulate_device


def spy(ps, bv, params, sim, cmax_hint=0):
    captured["ps"] = ps
    captured["bv"] = bv
    captured["params"] = params
    captured["sim"] = sim
    return orig_acc(ps, bv, params, sim, cmax_hint)


MS_mod_acc = None
import meshclust_tpu.core.meanshift as msm

from meshclust_tpu.config import ClusterConfig
from meshclust_tpu.core import runner


def main():
    import meshclust_tpu.core.accumulate_device as adm
    adm.accumulate_device = spy
    # meanshift imports it inside the method (from ... import) — patch there
    os.environ["MESHCLUST_EXACT_MODE"] = "ds"
    cfg = ClusterConfig(
        files=["/tmp/meshclust_bench_150000_1000.fasta"],
        output="/tmp/bisect3.clstr", similarity=0.90)
    runner.run(cfg)
    ps = captured["ps"]
    bv0 = captured["bv"]
    params = captured["params"]
    print("captured: n =", ps.n, "V =", ps.V, flush=True)

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

    fns = {m: AD.build_accumulate(N, ps.V, nbins, Cmax, 0.90,
                                  params.singles, combos_l, mode=m)
           for m in ("ds", "cert")}
    st = {m: init_state() for m in ("ds", "cert")}
    bb = jnp.asarray(np.asarray(bv.begin_bounds, np.int32))
    orig = jnp.arange(N, dtype=i32)
    K = 64
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
        a, b = st["ds"], st["cert"]
        same = (bool(jnp.all(a["owner"] == b["owner"]))
                and bool(jnp.all(a["active"] == b["active"]))
                and bool(jnp.all(a["cs"] == b["cs"]))
                and int(a["seed"]) == int(b["seed"])
                and int(a["t"]) == int(b["t"]))
        if int(a["c"]) % 128 == 0 or not same:
            print(f"c={int(a['c'])} t={int(a['t'])}/{int(b['t'])} "
                  f"same={same} nfb={np.asarray(b['nfb'])}", flush=True)
        if not same:
            cs_a = np.asarray(a["cs"]); cs_b = np.asarray(b["cs"])
            cbad = np.nonzero(cs_a != cs_b)[0]
            ow_a = np.asarray(a["owner"]); ow_b = np.asarray(b["owner"])
            obad = np.nonzero(ow_a != ow_b)[0]
            print("center mismatches:", cbad[:5],
                  cs_a[cbad[:5]], cs_b[cbad[:5]])
            print("owner mismatches:", obad[:8], ow_a[obad[:8]],
                  ow_b[obad[:8]])
            import pickle
            with open("/tmp/bisect3_state.pkl", "wb") as f:
                pickle.dump({"c": int(a["c"]), "K": K,
                             "params": params}, f)
            break
        if bool(a["done"]) and bool(b["done"]):
            print("no divergence in accumulate with CLI inputs")
            break


if __name__ == "__main__":
    main()
