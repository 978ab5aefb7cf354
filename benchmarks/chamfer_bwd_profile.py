"""Attribute the chamfer fwd+bwd cost piece by piece on TPU.

Each op is repeated REP times inside one jitted program with a data chain,
so per-dispatch floors cancel: per-op cost = (t(REP) - t(baseline)) / REP.

Usage: python benchmarks/chamfer_bwd_profile.py [B] [REP]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_tpu.ops import chamfer_distance
from pointcloud_tpu.ops.pallas_kernels import (
    nearest_neighbor_pallas, scatter_rows_pallas,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N = 2048
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
y0 = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
idx0 = jnp.asarray(rng.integers(0, N, (B, N)), dtype=jnp.int32)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(5):
            r = f(*args)
        jax.block_until_ready(r)
        float(jnp.sum(r) if r.ndim else r)
        dt = (time.perf_counter() - t0) / 5 * 1e3
    print(f"{name:<44} {dt:8.2f} ms  (/{REP}: {dt/REP:6.2f})", flush=True)
    return dt


def chain(op):
    """Repeat op REP times with a data dependency; return a scalar."""

    def fn(x, y, idx):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(REP):
            out = op(x, y, idx)
            s = jnp.sum(out).astype(jnp.float32)
            acc = acc + s
            x = x + s * 1e-20
        return acc

    return fn


print(f"backend={jax.default_backend()} B={B} N={N} REP={REP}")
base = timeit("baseline (chain overhead only)",
              chain(lambda x, y, i: x[:, :1, :1]), x0, y0, idx0)
timeit("take_along_axis gather (B,N,3)",
       chain(lambda x, y, i: jnp.take_along_axis(y, i[..., None], axis=1)),
       x0, y0, idx0)
timeit("scatter .at[].add (B,N,3)",
       chain(lambda x, y, i: jnp.zeros_like(y).at[
           jnp.arange(B)[:, None], i].add(x)), x0, y0, idx0)
timeit("scatter_rows_pallas (B,N,3)",
       chain(lambda x, y, i: scatter_rows_pallas(x, i, N)), x0, y0, idx0)
timeit("NN pallas fwd",
       chain(lambda x, y, i: nearest_neighbor_pallas(x, y)[0]), x0, y0, idx0)

# whole-loss fwd vs fwd+bwd (single call; subtract dispatch floor mentally)
timeit("chamfer fwd (x1)", lambda x, y: chamfer_distance(x, y) + 0 * jnp.sum(x),
       x0, y0)
timeit("chamfer value_and_grad (x1)",
       lambda x, y: jax.value_and_grad(lambda a: chamfer_distance(a, y))(x)[0]
       + jnp.sum(jax.value_and_grad(lambda a: chamfer_distance(a, y))(x)[1]) * 1e-9,
       x0, y0)
