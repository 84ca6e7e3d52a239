"""Find the smallest corpus prefix where cert-mode accumulate diverges from
ds-mode, then locate the first differing center."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from meshclust_tpu.core.points import build_points
from meshclust_tpu.core.bvec import BVec
from meshclust_tpu.io import fasta
from meshclust_tpu.ops import features as F


def load_prefix(path, n):
    recs = fasta.read_fasta(path)[:n]
    return recs


def run_mode(ps, params, mode, k=512):
    os.environ["MESHCLUST_EXACT_MODE"] = mode
    os.environ["MESHCLUST_ACCUM_CHUNK"] = str(k)
    from meshclust_tpu.core.accumulate_device import accumulate_device
    bv = BVec(ps.lengths.copy(), 1000)
    bv.bulk_insert(ps.lengths)
    bv.insert_finalize()
    return accumulate_device(ps, bv, params, 0.90)


def first_diff(ca, cb):
    for i, (x, y) in enumerate(zip(ca, cb)):
        if x.center != y.center or x.members != y.members:
            return i
    if len(ca) != len(cb):
        return min(len(ca), len(cb))
    return -1


def main():
    path = "/tmp/meshclust_bench_150000_1000.fasta"
    # train once on the FULL corpus equivalent? Use a fixed params set from
    # a quick train on the prefix to keep it simple — divergence only needs
    # SOME GLM; use the production-trained model on the largest prefix.
    for n in (8000, 16000, 32000, 64000):
        recs = load_prefix(path, n)
        ps = build_points(recs, k=5, use_pallas=False)
        from meshclust_tpu.core.trainer import Trainer
        os.environ.pop("MESHCLUST_EXACT_MODE", None)
        tr = Trainer(ps, n_points=3000, cutoff=0.90, max_pts_from_one=20,
                     k=5)
        model = tr.train(97.5)
        params = model.params
        ca = run_mode(ps, params, "ds")
        cb = run_mode(ps, params, "cert")
        d = first_diff(ca, cb)
        print(f"N={n}: centers ds={len(ca)} cert={len(cb)} "
              f"first_diff={d}", flush=True)
        if d >= 0:
            print("  ds  center", ca[d].center, "members",
                  ca[d].members[:10], len(ca[d].members))
            print("  cert center", cb[d].center, "members",
                  cb[d].members[:10], len(cb[d].members))
            np.save("/tmp/bisect_hist.npy", ps.hist_rows(
                np.arange(ps.n)) if ps.n <= 40000 else np.zeros(1))
            import pickle
            with open("/tmp/bisect_state.pkl", "wb") as f:
                pickle.dump({"n": n, "d": d,
                             "params": params,
                             "ds_center": ca[d].center,
                             "ds_members": ca[d].members,
                             "ct_center": cb[d].center,
                             "ct_members": cb[d].members}, f)
            break


if __name__ == "__main__":
    main()
