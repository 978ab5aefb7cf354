"""Probe: batched gather cost vs memory layout on TPU.

The chamfer backward's take_along_axis gathers lower to ~3.6 ms fusions when
XLA assigns channel-major/flattened layouts to the (B, N, 3) intermediates.
This probes row-major vs channel-major gather+consumer chains in isolation.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

B, N = 256, 2048
REP = 8
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
y = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
g = jnp.asarray(rng.random((B, N), dtype=np.float32))
idx = jnp.asarray(rng.integers(0, N, (B, N)), dtype=jnp.int32)
xt = jnp.swapaxes(x, 1, 2).copy()
yt = jnp.swapaxes(y, 1, 2).copy()


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(5):
            r = f(*args)
        jax.block_until_ready(r)
        float(jnp.sum(r))
        dt = (time.perf_counter() - t0) / 5 * 1e3
    print(f"{name:<46} {dt:8.2f} ms  (/{REP}: {dt/REP:6.2f})", flush=True)


def chain(op):
    def fn(a, b, w, i):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(REP):
            out = op(a, b, w, i)
            s = jnp.sum(out)
            acc += s
            a = a + s * 1e-20
        return acc
    return fn


print(f"backend={jax.default_backend()}")
timeit("baseline", chain(lambda a, b, w, i: a[:, :1, :1]), x, y, g, idx)
timeit("row-major gather+term (B,N,3)",
       chain(lambda a, b, w, i: 2.0 * w[..., None]
             * (a - jnp.take_along_axis(b, i[..., None], axis=1))),
       x, y, g, idx)
timeit("channel-major gather+term (B,3,N)",
       chain(lambda a, b, w, i: 2.0 * w[:, None, :]
             * (a - jnp.take_along_axis(b, i[:, None, :], axis=2))),
       xt, yt, g, idx)
timeit("row-major term + final transpose",
       chain(lambda a, b, w, i: jnp.swapaxes(
           2.0 * w[:, None, :]
           * (a - jnp.take_along_axis(b, i[:, None, :], axis=2)), 1, 2)),
       xt, yt, g, idx)
