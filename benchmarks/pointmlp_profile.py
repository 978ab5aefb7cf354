"""Stage-level timing of the full PointMLP train step on TPU.

Chained-dependency methodology (CLAUDE.md); second timed pass reported.
Usage: python benchmarks/pointmlp_profile.py [B] [iters]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_tpu.ops.fps import farthest_point_sample
from pointcloud_tpu.ops.geometry import group_neighbors

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

rng = np.random.default_rng(0)


def bench(name, fn, x0):
    step = jax.jit(fn)
    x = step(x0)
    jax.block_until_ready(x)
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            x = step(x)
        jax.block_until_ready(x)
        float(jnp.sum(x[(0,) * x.ndim]))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:<52} {dt:8.2f} ms", flush=True)


print(f"backend={jax.default_backend()} B={B} (full PointMLP geometry)")

# stage geometry: (N, G, k, feat_channels_in) per stage, embed 64, exp 2
stages = [(2048, 1024, 24, 64), (1024, 512, 24, 128),
          (512, 256, 24, 256), (256, 128, 24, 512)]

for i, (N, G, K, C) in enumerate(stages):
    xyz0 = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    feat0 = jnp.asarray(
        rng.random((B, N, C), dtype=np.float32)).astype(jnp.bfloat16)

    bench(f"stage{i+1} FPS N={N} K={G}", lambda x: x + jnp.sum(
        farthest_point_sample(x, G)).astype(jnp.float32) * 1e-12, xyz0)

    def grp(x, feat0=feat0, G=G, K=K):
        cents = x[:, :G, :]
        gx, gf, _, _ = group_neighbors(x, feat0, cents, K, radius=None)
        return x + (jnp.sum(gx) + jnp.sum(gf).astype(jnp.float32)) * 1e-12

    bench(f"stage{i+1} fused kNN group k={K} C={C}", grp, xyz0)

# LocalGrouper normalize cost (std over flattened per-sample, fp32)
from pointcloud_tpu.models.pointmlp import LocalGrouper

for i, (N, G, K, C) in enumerate(stages):
    xyz0 = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
    feat0 = jnp.asarray(
        rng.random((B, N, C), dtype=np.float32)).astype(jnp.bfloat16)
    lg = LocalGrouper(groups=G, kneighbors=K)
    vs = lg.init(jax.random.PRNGKey(0), xyz0, feat0)

    def lgf(x, lg=lg, vs=vs, feat0=feat0):
        nx, g, _ = lg.apply(vs, x, feat0)
        return x + (jnp.sum(nx) + jnp.sum(g).astype(jnp.float32)) * 1e-12

    bench(f"stage{i+1} LocalGrouper total", lgf, xyz0)

# full encoder fwd and params-bwd
from pointcloud_tpu.models import backbone_factory

enc = backbone_factory["PointMLP"](dtype=jnp.bfloat16)
x0 = jnp.asarray(rng.random((B, 2048, 6), dtype=np.float32))
ev = enc.init(jax.random.PRNGKey(0), x0[:1], train=True)


def enc_fwd(x):
    out, _ = enc.apply(ev, x, train=True, mutable=["batch_stats"])
    return x + jnp.sum(out).astype(jnp.float32) * 1e-12


bench("PointMLP encoder fwd", enc_fwd, x0)


def enc_fwdbwd(x):
    def loss(p):
        out, _ = enc.apply(
            {**ev, "params": p}, x, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)
    l, grads = jax.value_and_grad(loss)(ev["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    return x + (l + sum(jnp.sum(g.astype(jnp.float32)) for g in leaves)) * 1e-12


bench("PointMLP encoder fwd+bwd (params)", enc_fwdbwd, x0)
