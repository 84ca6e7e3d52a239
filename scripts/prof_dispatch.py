"""Isolate axon-tunnel dispatch overhead: trivial kernels, kernel-count
scaling, sync-per-rep vs pipelined."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 17
x = jnp.asarray(np.random.default_rng(0).random(N, np.float32))


def bench(name, fn, *args, reps=50, sync_each=False):
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        if sync_each:
            jax.block_until_ready(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t) / reps
    print(f"{name:<44s} {dt*1e6:10.1f} us")
    return dt


@jax.jit
def trivial(x):
    return x * 2.0


def chain(n_barriers):
    @jax.jit
    def f(x):
        y = x
        for _ in range(n_barriers):
            y = jax.lax.optimization_barrier(y * 1.0000001)
        return y
    return f


bench("trivial [N] op, pipelined", trivial, x)
bench("trivial [N] op, sync each", trivial, x, sync_each=True)
for nb in (1, 8, 32, 128, 512):
    bench(f"barrier chain x{nb}, pipelined", chain(nb), x)
for nb in (32, 128):
    bench(f"barrier chain x{nb}, sync each", chain(nb), x, sync_each=True)

# scalar-output (argmin) cost
@jax.jit
def amin(x):
    return jnp.argmin(x)

bench("argmin [N] -> scalar, pipelined", amin, x)

# while_loop iteration overhead: 100 iterations of a trivial body
@jax.jit
def wl(x):
    def body(s):
        i, y = s
        return i + 1, y * 1.0000001
    return jax.lax.while_loop(lambda s: s[0] < 100, body, (0, x))

bench("while_loop 100 trivial iters", wl, x)

@jax.jit
def wl_bar(x):
    def body(s):
        i, y = s
        y = jax.lax.optimization_barrier(y * 1.0000001)
        y = jax.lax.optimization_barrier(y + 0.1)
        return i + 1, y
    return jax.lax.while_loop(lambda s: s[0] < 100, body, (0, x))

bench("while_loop 100 iters, 2 barriers each", wl_bar, x)

# scalar-op cost hypothesis
def scalar_chain(k):
    @jax.jit
    def f(x, c):
        s = x[c]                       # dynamic scalar gather
        for _ in range(k):
            s = s * 1.0000001 + 0.1
        return x + s
    return f

for k in (1, 8, 32, 128):
    bench(f"scalar chain x{k} + [N] add", scalar_chain(k), x, 5)

def scalar_gathers(k):
    @jax.jit
    def f(x, c):
        out = x
        for i in range(k):
            out = out + x[(c + i) % N]
        return out
    return f

for k in (1, 8, 32):
    bench(f"{k} dynamic scalar gathers + adds", scalar_gathers(k), x, 5)

def reductions(k):
    @jax.jit
    def f(x):
        out = x
        for i in range(k):
            out = out + jnp.sum(out) * 1e-9
        return out
    return f

for k in (1, 4, 16):
    bench(f"{k} full reductions chained", reductions(k), x)
