"""Masked vs unmasked fused-NN-sweep cost at small/asymmetric batch shapes.

REP-chained inside one jitted program (chamfer_bwd_profile.py methodology)
so tunnel dispatch floors cancel.

Usage: python benchmarks/nn_probe.py [REP]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_tpu.ops.chamfer import chamfer_distance
from pointcloud_tpu.ops.pallas_kernels import nearest_neighbor_pallas

REP = int(sys.argv[1]) if len(sys.argv) > 1 else 8
rng = np.random.default_rng(0)


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
    print(f"{name:<52} {dt:8.2f} ms  (/{REP}: {dt/REP:6.2f})", flush=True)


def chain(op):
    def fn(x, *rest):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(REP):
            out = op(x, *rest)
            s = jnp.sum(out).astype(jnp.float32)
            acc = acc + s
            x = x + s * 1e-20
        return acc

    return fn


print(f"backend={jax.default_backend()} REP={REP}")
for (B, N, M) in [(32, 2048, 2048), (128, 640, 2048), (512, 2048, 2048)]:
    x = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((B, M, 3), dtype=np.float32))
    xm = jnp.asarray(rng.random((B, N)) > 0.1)
    ym = jnp.asarray(rng.random((B, M)) > 0.5)
    timeit(f"B={B} N={N} M={M} NN kernel unmasked",
           chain(lambda x, y: nearest_neighbor_pallas(x, y)[0]), x, y)
    timeit(f"B={B} N={N} M={M} NN kernel masked",
           chain(lambda x, y, xm, ym: nearest_neighbor_pallas(
               x, y, xm, ym)[0]), x, y, xm, ym)
    timeit(f"B={B} N={N} M={M} chamfer masked (dense XLA)",
           chain(lambda x, y, xm, ym: chamfer_distance(
               x, y, x_mask=xm, y_mask=ym, method="direct",
           )), x, y, xm, ym)
