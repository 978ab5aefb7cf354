"""In-jit ablation of the PointNet AE train step (fwd+bwd+Adam) on TPU.

Variant deltas attribute real in-step cost (chained-dependency methodology,
CLAUDE.md). Usage: python benchmarks/pointnet_ablate.py [B] [iters]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import optax

from pointcloud_tpu.models import AE, backbone_factory
from pointcloud_tpu.ops import chamfer_distance

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.random((B, 2048, 6), dtype=np.float32))


def bench(name, model, use_loss=True, train=True, opt=True):
    variables = model.init(jax.random.PRNGKey(0), x0[:1], train=True)
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    ostate = tx.init(params)

    @jax.jit
    def step(state):
        params, bstats, ostate, x = state

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bstats}, x, train=True,
                mutable=["batch_stats"],
            )
            if use_loss:
                l = chamfer_distance(out[..., :3].astype(jnp.float32), x[..., :3])
            else:
                l = jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
            return l, mut["batch_stats"]

        if train:
            (l, bs2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if opt:
                up, o2 = tx.update(grads, ostate, params)
                p2 = optax.apply_updates(params, up)
            else:
                p2, o2 = params, ostate
                l = l + sum(
                    jnp.sum(g.astype(jnp.float32)) * 1e-12
                    for g in jax.tree_util.tree_leaves(grads)
                )
        else:
            l, bs2 = loss_fn(params)
            p2, o2 = params, ostate
        return (p2, bs2, o2, x + l * 1e-12)

    state = (params, bstats, ostate, x0)
    state = step(state)
    jax.block_until_ready(state[3])
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state = step(state)
        jax.block_until_ready(state[3])
        float(jnp.sum(state[3][0, 0]))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:<52} {dt:8.2f} ms", flush=True)
    return dt


def make_ae(**bk_kw):
    bk = backbone_factory["PointNet"](
        feature_dims=3, dtype=jnp.bfloat16, **bk_kw
    )
    return AE(bk, out_points=2048, out_dim=6, bottleneck=16, dtype=jnp.bfloat16)


print(f"backend={jax.default_backend()} B={B} PointNet AE train-step ablation")
full = bench("full train step", make_ae())
nostn = bench("no STNs (input+feature transform off)",
              make_ae(input_transform=False, feature_transform=False))
noloss = bench("loss = sum(out^2) (no chamfer)", make_ae(), use_loss=False)
fwd = bench("fwd-only (train-mode, no bwd/opt)", make_ae(), train=False)
noopt = bench("no Adam (grads only)", make_ae(), opt=False)
print(f"\nattribution: STNs ~{full-nostn:.1f} ms, chamfer+decoder-loss ~{full-noloss:.1f} ms, "
      f"bwd ~{noopt-fwd:.1f} ms, Adam ~{full-noopt:.1f} ms, fwd ~{fwd:.1f} ms")
