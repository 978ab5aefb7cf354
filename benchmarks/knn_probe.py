"""kNN grouping forward timing at PointMLP stage shapes (TPU).

Chained-dependency methodology (CLAUDE.md). Usage:
  python benchmarks/knn_probe.py [B] [with_xyz(0|1)]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_tpu.ops.geometry import group_neighbors
import inspect

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
WANT_XYZ = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
ITERS = 20
HAS_WX = "with_xyz" in inspect.signature(group_neighbors).parameters

rng = np.random.default_rng(0)
stages = [(2048, 1024, 24, 64), (1024, 512, 24, 128),
          (512, 256, 24, 256), (256, 128, 24, 512)]

print(f"backend={jax.default_backend()} B={B} with_xyz={WANT_XYZ} "
      f"(kwarg supported: {HAS_WX})")
total = 0.0
for i, (N, G, K, C) in enumerate(stages):
    xyz0 = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    feat0 = jnp.asarray(
        rng.random((B, N, C), dtype=np.float32)).astype(jnp.bfloat16)

    kw = {"with_xyz": WANT_XYZ} if HAS_WX else {}

    def grp(x, feat0=feat0, G=G, K=K, kw=kw):
        cents = x[:, :G, :]
        gx, gf, _, _ = group_neighbors(x, feat0, cents, K, radius=None, **kw)
        acc = jnp.sum(gf).astype(jnp.float32)
        if gx is not None:
            acc = acc + jnp.sum(gx)
        return x + acc * 1e-12

    step = jax.jit(grp)
    x = step(xyz0)
    jax.block_until_ready(x)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            x = step(x)
        float(jnp.sum(x[0]))
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    total += best
    print(f"stage{i+1} N={N} S={G} k={K} C={C}: {best:7.2f} ms", flush=True)
print(f"TOTAL {total:.2f} ms")
