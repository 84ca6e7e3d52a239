"""A/B the accumulate modes (ds / cert / f32) on captured CLI inputs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

captured = {}
from meshclust_tpu.core import accumulate_device as AD
orig_acc = AD.accumulate_device


def spy(ps, bv, params, sim, cmax_hint=0):
    captured.update(ps=ps, params=params)
    return orig_acc(ps, bv, params, sim, cmax_hint)


def main():
    fasta = sys.argv[1] if len(sys.argv) > 1 \
        else "/tmp/meshclust_bench_150000_1000.fasta"
    AD.accumulate_device = spy
    from meshclust_tpu.config import ClusterConfig
    from meshclust_tpu.core import runner
    runner.run(ClusterConfig(files=[fasta], output="/tmp/ab.clstr",
                             similarity=0.90))
    ps = captured["ps"]
    params = captured["params"]
    from meshclust_tpu.core.bvec import BVec
    from meshclust_tpu.utils import perf

    def once(mode):
        os.environ["MESHCLUST_EXACT_MODE"] = mode
        bv = BVec(ps.lengths.copy(), 1000)
        bv.bulk_insert(ps.lengths)
        bv.insert_finalize()
        t0 = time.time()
        centers = orig_acc(ps, bv, params, 0.90)
        return time.time() - t0, centers

    sigs = {}
    for mode in ("f32", "cert", "ds"):
        once(mode)                      # compile
        times = []
        for _ in range(3):
            dt, centers = once(mode)
            times.append(dt)
        sigs[mode] = [(c.center, tuple(c.members)) for c in centers]
        perf.reset()
        print(f"{mode:5s} accumulate: min {min(times):.2f}s "
              f"times {[f'{t:.2f}' for t in times]}", flush=True)
    print("cert == ds partitions:", sigs["cert"] == sigs["ds"])
    print("f32 == ds partitions:", sigs["f32"] == sigs["ds"])




# ablation mode: scripts/ab_accum.py <fasta> dbg
def ablate():
    fasta = sys.argv[1]
    AD.accumulate_device = spy
    from meshclust_tpu.config import ClusterConfig
    from meshclust_tpu.core import runner
    runner.run(ClusterConfig(files=[fasta], output="/tmp/ab.clstr",
                             similarity=0.90))
    ps = captured["ps"]
    params = captured["params"]
    from meshclust_tpu.core.bvec import BVec

    def once():
        bv = BVec(ps.lengths.copy(), 1000)
        bv.bulk_insert(ps.lengths)
        bv.insert_finalize()
        t0 = time.time()
        orig_acc(ps, bv, params, 0.90)
        return time.time() - t0

    os.environ["MESHCLUST_EXACT_MODE"] = "cert"
    for dbg in ("", "nowin", "noargmin", "nobest", "nowin,noargmin,nobest"):
        os.environ["MESHCLUST_ACCUM_DBG"] = dbg
        once()
        ts = [once() for _ in range(3)]
        print(f"dbg={dbg or 'none':28s} min {min(ts):.2f}s", flush=True)


if __name__ == "__main__" and len(sys.argv) > 2 and sys.argv[2] == "dbg":
    ablate()
    sys.exit(0)

if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "dbg":
        ablate()
    else:
        main()
