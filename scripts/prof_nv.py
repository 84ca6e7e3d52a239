"""Which [N,V] reduction patterns hit bandwidth on the axon TPU?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, V = 1 << 17, 256
rng = np.random.default_rng(0)
h = jnp.asarray(rng.integers(1, 30, size=(N, V), dtype=np.uint8))
cw = jnp.asarray(rng.integers(1, 30, V).astype(np.float32))
cw8 = cw.astype(jnp.uint8)
cvec = jnp.asarray(rng.integers(1, 30, V).astype(np.float32))


def bench(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t) / reps
    print(f"{name:<46s} {dt*1e3:8.3f} ms ({N*V/dt/1e9:6.1f} G elem/s)")


bench("abs-diff sum (f32 convert)", jax.jit(
    lambda h: jnp.sum(jnp.abs(h.astype(jnp.float32) - cvec[None, :]),
                      axis=1)), h)
bench("min sum (f32 convert)", jax.jit(
    lambda h: jnp.sum(jnp.minimum(h.astype(jnp.float32), cw[None, :]),
                      axis=1)), h)
bench("min sum (u8 domain, i32 sum)", jax.jit(
    lambda h: jnp.sum(jnp.minimum(h, cw8[None, :]).astype(jnp.int32),
                      axis=1)), h)
bench("plain sum", jax.jit(
    lambda h: jnp.sum(h.astype(jnp.float32), axis=1)), h)
bench("matvec via dot", jax.jit(
    lambda h: h.astype(jnp.float32) @ cvec), h)
bench("abs-diff + dot fused", jax.jit(
    lambda h: (jnp.sum(jnp.abs(h.astype(jnp.float32) - cvec[None, :]),
                       axis=1),
               h.astype(jnp.float32) @ cvec)), h)
bench("abs-diff + dot + minsum fused", jax.jit(
    lambda h: (jnp.sum(jnp.abs(h.astype(jnp.float32) - cvec[None, :]),
                       axis=1),
               h.astype(jnp.float32) @ cvec,
               jnp.sum(jnp.minimum(h.astype(jnp.float32), cw[None, :]),
                       axis=1))), h)

# does a traced (non-constant) cw change things? (in production cw is
# computed from sumvec/count inside the program)
bench("min sum, cw as ARG", jax.jit(
    lambda h, cwa: jnp.sum(jnp.minimum(h.astype(jnp.float32),
                                       cwa[None, :]), axis=1)), h, cw)
sv = h[0].astype(jnp.float32) * 100.0
bench("min sum, cw=floor(sv/cnt) in-program", jax.jit(
    lambda h, sv: jnp.sum(jnp.minimum(h.astype(jnp.float32),
                                      jnp.floor(sv / 7.0)[None, :]),
                          axis=1)), h, sv)
