"""In-jit ablation of the full PointMLP fwd+bwd cost on TPU.

Each variant swaps one geometry stage for a shape-preserving no-op INSIDE
the single jitted program (monkeypatched module bindings), so the deltas
attribute real in-step time — the per-dispatch micro-bench floor (~6 ms
through the tunnel) cancels out. Chained-dependency methodology (CLAUDE.md).

Usage: python benchmarks/pointmlp_ablate.py [B] [iters]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import pointcloud_tpu.models.pointmlp as pm
from pointcloud_tpu.models import backbone_factory

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

rng = np.random.default_rng(0)

REAL_FPS = pm.farthest_point_sample
REAL_GROUP = pm.group_neighbors


def fake_fps(xyz, npoint, mask=None, **kw):
    Bq, N, _ = xyz.shape
    stride = N // npoint
    idx = jnp.broadcast_to(jnp.arange(npoint, dtype=jnp.int32) * stride, (Bq, npoint))
    # keep a data dependency on xyz so XLA can't hoist it out
    return idx + (jnp.sum(xyz[:, :1, :1]) * 1e-12).astype(jnp.int32)


def fake_group(xyz, feats, new_xyz, k, radius=None, mask=None, **kw):
    Bq, G, _ = new_xyz.shape
    gx = jnp.broadcast_to(new_xyz[:, :, None, :], (Bq, G, k, 3))
    anchors = feats[:, :G, :]
    gf = jnp.broadcast_to(anchors[:, :, None, :], (Bq, G, k, feats.shape[-1]))
    idx = jnp.zeros((Bq, G, k), jnp.int32)
    valid = jnp.ones((Bq, G, k), jnp.float32)
    return gx, gf, idx, valid


def bench(name, fps, group, normalize="anchor"):
    pm.farthest_point_sample = fps
    pm.group_neighbors = group
    enc = backbone_factory["PointMLP"](dtype=jnp.bfloat16)
    if normalize != "anchor":
        enc = enc.replace(normalize=normalize) if hasattr(enc, "replace") else enc
    x0 = jnp.asarray(rng.random((B, 2048, 6), dtype=np.float32))
    ev = enc.init(jax.random.PRNGKey(0), x0[:1], train=True)

    def step(x):
        def loss(p):
            out, _ = enc.apply(
                {**ev, "params": p}, x, train=True, mutable=["batch_stats"]
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        l, grads = jax.value_and_grad(loss)(ev["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        return x + (l + sum(jnp.sum(g.astype(jnp.float32)) for g in leaves)) * 1e-12

    jstep = jax.jit(step)
    x = jstep(x0)
    jax.block_until_ready(x)
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            x = jstep(x)
        jax.block_until_ready(x)
        float(jnp.sum(x[0, 0, 0]))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:<44} {dt:8.2f} ms", flush=True)
    pm.farthest_point_sample = REAL_FPS
    pm.group_neighbors = REAL_GROUP
    return dt


print(f"backend={jax.default_backend()} B={B} full PointMLP fwd+bwd ablation")
full = bench("full", REAL_FPS, REAL_GROUP)
no_fps = bench("fps -> strided arange", fake_fps, REAL_GROUP)
no_grp = bench("group -> broadcast anchor", REAL_FPS, fake_group)
neither = bench("both faked (MLP+norm cost only)", fake_fps, fake_group)
print(f"\nattribution: FPS ~{full - no_fps:.1f} ms, grouping ~{full - no_grp:.1f} ms, "
      f"rest (MLP/BN/norm) ~{neither:.1f} ms")
