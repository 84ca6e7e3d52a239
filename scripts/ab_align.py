"""A/B the full-row vs row-windowed align grid kernels on the real TPU.

Times the steady-state kernel (post-compile) on synthetic 128-lane blocks
shaped like the 15k align bench (square ~1kb pairs) plus a rectangular and
a short-bucket case, and prints GCUPS for both paths.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from meshclust_tpu.ops import align_device as AD


def make_ops(rng, G, la, lb, ba, bb):
    P = G * AD.LANES
    Rpad = AD._round_up(ba + 1, 8)
    BL = AD._round_up(ba + bb + 2, 8)
    a_t = np.zeros((Rpad, P), np.int8)
    b_t = np.zeros((BL, P), np.int32)
    l1 = np.zeros((1, P), np.int32)
    l2 = np.zeros((1, P), np.int32)
    for p in range(P):
        n1 = int(rng.integers(max(2, la - 30), la + 1))
        n2 = int(rng.integers(max(2, lb - 30), lb + 1))
        a_t[1: n1 + 1, p] = rng.integers(0, 4, n1)
        b_t[:n2, p] = rng.integers(0, 4, n2)
        l1[0, p] = n1
        l2[0, p] = n2
    s = (l1 + l2).reshape(G, AD.LANES)
    return (jnp.asarray(a_t), jnp.asarray(b_t), jnp.asarray(l1),
            jnp.asarray(l2),
            jnp.asarray(s.min(1, keepdims=True).astype(np.int32)),
            jnp.asarray(s.max(1, keepdims=True).astype(np.int32)))


def run(name, ops, G, reps=3):
    cells = float((np.asarray(ops[2], np.float64)
                   * np.asarray(ops[3], np.float64)).sum())
    out = {}
    for env, label in (("0", "full"), ("1", "windowed")):
        os.environ["MESHCLUST_ALIGN_WINDOWED"] = env
        AD._align_packed.clear_cache()
        t0 = time.time()
        r = AD._align_packed(*ops, G=G, match=1, mismatch=-1, go=2, gc=1)
        jax.block_until_ready(r)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            r = AD._align_packed(*ops, G=G, match=1, mismatch=-1, go=2, gc=1)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / reps
        out[label] = (dt, np.asarray(r[0]), np.asarray(r[1]))
        print(f"{name:12s} {label:9s} {dt*1e3:8.1f} ms  "
              f"{cells/dt/1e9:7.2f} GCUPS  (compile {compile_s:.1f}s)")
    assert np.array_equal(out["full"][1], out["windowed"][1]), "alen mismatch"
    assert np.array_equal(out["full"][2], out["windowed"][2]), "amatch mismatch"
    print(f"{name:12s} speedup {out['full'][0]/out['windowed'][0]:.2f}x, "
          f"outputs identical")


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    # 15k bench shape: ~988bp square pairs
    run("square1k", make_ops(rng, 8, 988, 988, 1024, 1024), 8)
    # rectangular: long vs short
    run("rect", make_ops(rng, 8, 1500, 400, 1536, 512), 8)
    # short bucket
    run("short253", make_ops(rng, 8, 253, 253, 256, 256), 8)


if __name__ == "__main__":
    main()
