"""Component-level timing of the PointNet2 set-abstraction path on TPU.

Pinpoints where the train step's time goes (VERDICT round-1 weak #2:
grouping-bound) before fusing anything. Chained-dependency methodology per
CLAUDE.md: every iteration feeds a scalar function of the previous output
back into the input, and the loop ends with a host transfer.

Usage: python benchmarks/sa_profile.py [B] [iters]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_tpu.ops.fps import farthest_point_sample
from pointcloud_tpu.ops.geometry import (
    pairwise_sqdist, index_points, ball_query, sample_and_group,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
N, S, K = 2048, 512, 32

rng = np.random.default_rng(0)
xyz0 = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
feat0 = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
cent0 = jnp.asarray(rng.random((B, S, 3), dtype=np.float32))
idx0 = jnp.asarray(rng.integers(0, N, (B, S, K)), dtype=jnp.int32)


def bench(name, fn, x0):
    """fn: x -> scalar-chainable array of x's shape. Two timed passes; the
    second is reported (the first absorbs remote-backend warm-up)."""
    step = jax.jit(fn)
    x = step(x0)
    jax.block_until_ready(x)
    for p in range(2):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            x = step(x)
        jax.block_until_ready(x)
        float(jnp.sum(x[(0,) * x.ndim]))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:<46} {dt:8.2f} ms", flush=True)
    return dt


print(f"backend={jax.default_backend()} B={B} N={N} S={S} K={K}")

bench("fps (pallas) K=512", lambda x: x + jnp.sum(
    farthest_point_sample(x, S)).astype(jnp.float32) * 1e-12, xyz0)

bench("pairwise_sqdist (S x N)", lambda x: x + jnp.sum(
    pairwise_sqdist(cent0 + x[:, :1, :1] * 0, x)) * 1e-12, xyz0)


def topk_only(x, approx):
    d = pairwise_sqdist(cent0 + x[:, :1, :1] * 0, x)
    neg, idx = (jax.lax.approx_max_k(-d, K, recall_target=0.95) if approx
                else jax.lax.top_k(-d, K))
    return x + (jnp.sum(neg) + jnp.sum(idx).astype(jnp.float32)) * 1e-12


bench("dist + approx_max_k", lambda x: topk_only(x, True), xyz0)
bench("dist + exact top_k", lambda x: topk_only(x, False), xyz0)

bench("ball_query (dist+topk+where)", lambda x: x + (
    jnp.sum(ball_query(0.2, K, x, cent0 + x[:, :1, :1] * 0)[0]).astype(
        jnp.float32)) * 1e-12, xyz0)

bench("index_points gather (B,S,K) of C=3", lambda x: x + jnp.sum(
    index_points(x, idx0)) * 1e-12, xyz0)

bench("index_points gather x2 (xyz+feat)", lambda x: x + (
    jnp.sum(index_points(x, idx0)) + jnp.sum(index_points(feat0, idx0))
) * 1e-12, xyz0)

bench("sample_and_group SA1 (full)", lambda x: x + jnp.sum(
    sample_and_group(S, 0.2, K, x, feat0)[1]) * 1e-12, xyz0)

bench("sample_and_group SA2 (128/0.4/64)", lambda x: x + jnp.sum(
    sample_and_group(128, 0.4, 64, x[:, :512], feat0[:, :512])[1]
) * 1e-12, xyz0)

# the SA1 MLP alone: Dense(64,64,128)+BN+relu on (B,S,K,6), max over K
import flax.linen as nn


class SA1MLP(nn.Module):
    @nn.compact
    def __call__(self, g):
        h = g
        for f in (64, 64, 128):
            h = nn.Dense(f)(h)
            h = nn.BatchNorm(use_running_average=False, momentum=0.9)(h)
            h = nn.relu(h)
        return jnp.max(h, axis=2)


g0 = jnp.asarray(rng.random((B, S, K, 6), dtype=np.float32))
mlp = SA1MLP()
vs = mlp.init(jax.random.PRNGKey(0), g0)


def mlp_fwd(g):
    out, _ = mlp.apply(vs, g, mutable=["batch_stats"])
    return g + jnp.sum(out) * 1e-12


bench("SA1 MLP fwd (Dense+BN stack, max)", mlp_fwd, g0)


def mlp_fwdbwd(g):
    def loss(gg):
        out, _ = mlp.apply(vs, gg, mutable=["batch_stats"])
        return jnp.sum(out * out)
    l, grad = jax.value_and_grad(loss)(g)
    return g + grad * 1e-12 + l * 1e-12


bench("SA1 MLP fwd+bwd", mlp_fwdbwd, g0)


# full encoder fwd and fwd+bwd
from pointcloud_tpu.models import backbone_factory

enc = backbone_factory["PointNet2"](feature_dims=3)
x6 = jnp.concatenate([xyz0, feat0], axis=-1)
ev = enc.init(jax.random.PRNGKey(0), x6[:1], train=True)


def enc_fwd(x):
    out, _ = enc.apply(ev, x, train=True, mutable=["batch_stats"])
    return x + jnp.sum(out) * 1e-12


bench("PointNet2 encoder fwd", enc_fwd, x6)


def enc_fwdbwd(x):
    # differentiate w.r.t. params (the real training direction; input-side
    # grads would have to flow through FPS, which training never does)
    def loss(p):
        out, _ = enc.apply(
            {**ev, "params": p}, x, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(out * out)
    l, grads = jax.value_and_grad(loss)(ev["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    return x + (l + sum(jnp.sum(g) for g in leaves)) * 1e-12


bench("PointNet2 encoder fwd+bwd (params)", enc_fwdbwd, x6)
