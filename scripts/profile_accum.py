#!/usr/bin/env python
"""Phase-A (accumulate) profiling at BENCH_N scale on the real chip.

Runs the pipeline up to and including accumulate, printing per-phase walls
plus the accumulate iteration counters, so kernel changes can be judged in
isolation from the full bench.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("BENCH_N", "150000"))
os.environ["BENCH_N"] = str(N)

import bench  # noqa: E402
from meshclust_tpu.config import ClusterConfig  # noqa: E402
from meshclust_tpu.utils import perf  # noqa: E402


def main():
    path = bench.make_dataset(N)
    from meshclust_tpu.core import runner as R
    from meshclust_tpu.core.bvec import BVec
    from meshclust_tpu.core.meanshift import MeanShift
    from meshclust_tpu.core import classify as C
    from meshclust_tpu.core.points import build_points
    from meshclust_tpu.core.trainer import Trainer
    from meshclust_tpu.ops import histogram as H
    from meshclust_tpu.io import fasta as fio
    from meshclust_tpu.utils import jaxcache

    jaxcache.enable()
    perf.reset()
    cfg = ClusterConfig(files=[path], similarity=0.90,
                        output="/tmp/profile_accum.clstr")
    cfg = cfg.finalize()
    with perf.phase("read"):
        per_file = [fio.read_fasta(f) for f in [path]]
    seqs = [s for fs in per_file for s in fs]
    k = H.find_k(per_file)
    print(f"n={len(seqs)} k={k}")
    with perf.phase("featurize"):
        ps = build_points(seqs, k)
    print(f"V={ps.V} largest={ps.largest}")

    from meshclust_tpu.ops.align_device import DeviceAligner
    aligner = DeviceAligner(ps.codes, match=cfg.match, mismatch=cfg.mismatch,
                            go=cfg.gap_open, gc=cfg.gap_continue)
    trainer = Trainer(ps, n_points=cfg.sample_size, cutoff=cfg.similarity,
                      max_pts_from_one=cfg.pivots, k=k, exact=cfg.exact)
    trainer._dev_aligner = aligner
    with perf.phase("train"):
        model = trainer.train(cfg.acc_cutoff)

    backend = C.make_backend(ps, model.params, align_fn=None,
                             exact=cfg.exact, aligner=aligner)
    with perf.phase("bvec"):
        bv = BVec(ps.lengths.copy(), cfg.bin_size)
        bv.bulk_insert(ps.lengths)
        bv.insert_finalize()

    ms = MeanShift(ps, backend, sim=cfg.similarity, delta=cfg.delta,
                   iterations=cfg.iterations)
    t0 = time.time()
    with perf.phase("accumulate"):
        centers = ms.accumulate_all(bv)
    acc_s = time.time() - t0
    print(f"accumulate: {acc_s:.2f}s  centers={len(centers)}")
    print(perf.format_report())


if __name__ == "__main__":
    main()
