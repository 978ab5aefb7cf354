"""PointNet2 B=256 step attribution via standalone component probes.

Times each SA-level component (FPS, fused ball grouping fwd+bwd, fused
SA chain fwd+bwd) as its own small jitted program with chained reps —
small programs compile in ~1 min each vs 15-20 min for the full train
step, and their sum bounds the step composition (VERDICT r4 task 3:
name the 94.8 ms). Shapes follow PointNet2Encoder (models/pointnet2.py):
SA1 512/0.2/32 mlp(64,64,128), SA2 128/0.4/64 mlp(128,128,256),
SA3 group_all mlp(256,512,1024).

Usage: python benchmarks/pointnet2_components.py [B] [probe...]
  probes: fps1 fps2 ball1 ball2 chain1 chain2 chain3 chamfer
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
probes = sys.argv[2:] or [
    "fps1", "fps2", "ball1", "ball2", "chain1", "chain2", "chain3",
    "chamfer",
]
REPS = int(os.environ.get("REPS", "10"))
rng = np.random.default_rng(0)


def bench(name, fn, *args):
    @jax.jit
    def chained(*a):
        acc = jnp.float32(0.0)
        x = a[0]
        for _ in range(REPS):
            acc = acc + fn(*((x + acc * 1e-20,) + a[1:]))
        return acc

    t0 = time.perf_counter()
    r = chained(*args)
    jax.block_until_ready(r)
    print(f"{name:10} compile+1st {time.perf_counter() - t0:6.1f} s",
          flush=True)
    for _ in range(2):
        t0 = time.perf_counter()
        float(chained(*args))
        dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:10} {dt:7.2f} ms", flush=True)


def fps_probe(N, K):
    from pointcloud_tpu.ops.fps import farthest_point_sample

    xyz = jnp.asarray(rng.random((B, N, 3), np.float32))

    def f(xyz):
        idx = farthest_point_sample(xyz, K)
        return jnp.sum(idx.astype(jnp.float32))
    return f, (xyz,)


def ball_probe(N, S, k, radius, F, bwd=True):
    from pointcloud_tpu.ops.pallas_kernels import grouped_gather_ball

    xyz = jnp.asarray(rng.random((B, N, 3), np.float32))
    feats = jnp.asarray(rng.random((B, N, F), np.float32)).astype(
        jnp.bfloat16)
    cents = jnp.asarray(rng.random((B, S, 3), np.float32))
    pen = jnp.zeros((B, N, 1), jnp.float32)

    def f(xyz):
        def loss(xyz, feats, cents):
            g, idx, valid = grouped_gather_ball(
                xyz, feats, cents, pen, k, radius)
            return jnp.sum(g.astype(jnp.float32) ** 2)

        if bwd:
            l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                xyz, feats, cents)
            return l + sum(jnp.sum(g.astype(jnp.float32)) for g in grads)
        return loss(xyz, feats, cents)
    return f, (xyz,)


def chain_probe(S, K, Cin, mlp):
    from pointcloud_tpu.ops.preextract_fused import mlp_pool_fused

    x = jnp.asarray(
        rng.standard_normal((B, S * K, Cin)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ws, gs, bs = [], [], []
    ci = Cin
    r2 = np.random.default_rng(1)
    for co in mlp:
        ws.append(jnp.asarray(
            (r2.standard_normal((ci, co)) / np.sqrt(ci)).astype(np.float32)))
        gs.append(jnp.ones((co,), jnp.float32))
        bs.append(jnp.zeros((co,), jnp.float32))
        ci = co
    pen = jnp.zeros((B, S * K), jnp.float32)

    def f(x):
        def loss(x, ws):
            out, stats = mlp_pool_fused(
                x, tuple(ws), tuple(gs), tuple(bs), pen, K)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        l, (dx, dws) = jax.value_and_grad(loss, argnums=(0, 1))(x, ws)
        return l + jnp.sum(dx.astype(jnp.float32)) + sum(
            jnp.sum(w) for w in dws)
    return f, (x,)


def chamfer_probe(N=2048):
    from pointcloud_tpu.ops import chamfer_distance

    x = jnp.asarray(rng.random((B, N, 3), np.float32))
    y = jnp.asarray(rng.random((B, N, 3), np.float32))

    def f(x):
        def loss(x, y):
            return chamfer_distance(x, y)
        l, (dx, dy) = jax.value_and_grad(loss, argnums=(0, 1))(x, y)
        return l + jnp.sum(dx) + jnp.sum(dy)
    return f, (x,)


BUILDERS = {
    "fps1": lambda: fps_probe(2048, 512),
    "fps2": lambda: fps_probe(512, 128),
    # SA1: feats into grouping = 3 raw feature dims
    "ball1": lambda: ball_probe(2048, 512, 32, 0.2, 3),
    # SA2: feats = SA1's 128-d output
    "ball2": lambda: ball_probe(512, 128, 64, 0.4, 128),
    "ball1f": lambda: ball_probe(2048, 512, 32, 0.2, 3, bwd=False),
    "ball2f": lambda: ball_probe(512, 128, 64, 0.4, 128, bwd=False),
    "chain1": lambda: chain_probe(512, 32, 3 + 3, (64, 64, 128)),
    "chain2": lambda: chain_probe(128, 64, 128 + 3, (128, 128, 256)),
    "chain3": lambda: chain_probe(1, 128, 256 + 3, (256, 512, 1024)),
    "chamfer": lambda: chamfer_probe(),
}

if __name__ == "__main__":
    print(f"backend={jax.default_backend()} B={B}")
    for p in probes:
        try:
            fn, args = BUILDERS[p]()
            bench(p, fn, *args)
        except Exception as e:
            print(f"{p:10} FAILED: {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
