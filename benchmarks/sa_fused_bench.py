"""One PointNet2 SetAbstraction level fwd+bwd on TPU: fused chain vs the
r2 path (env-gated), plus the full PointNet2 AE train step.

Usage: python benchmarks/sa_fused_bench.py [B] [mode: sa|model|both]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import optax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
mode = sys.argv[2] if len(sys.argv) > 2 else "both"
ITERS = 10
rng = np.random.default_rng(0)


def timeit(name, step, state):
    state = step(state)
    jax.block_until_ready(state[-1])
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state = step(state)
        jax.block_until_ready(state[-1])
        float(jnp.sum(state[-1][(0,) * state[-1].ndim]))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:<40} {dt:8.2f} ms", flush=True)


def bench_sa(fused):
    from pointcloud_tpu.models.pointnet2 import SetAbstraction

    os.environ.pop("PCTPU_DISABLE_FUSED_SA", None)
    if not fused:
        os.environ["PCTPU_DISABLE_FUSED_SA"] = "1"
    xyz = jnp.asarray(rng.random((B, 2048, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((B, 2048, 3), dtype=np.float32)).astype(
        jnp.bfloat16
    )
    mod = SetAbstraction(npoint=512, radius=0.2, nsample=32,
                         mlp=(64, 64, 128), dtype=jnp.bfloat16)
    vs = mod.init(jax.random.PRNGKey(0), xyz[:1], feats[:1], train=True)

    @jax.jit
    def step(state):
        vs_p, x = state

        def loss(p):
            (nx, out, nm), mut = mod.apply(
                {**vs, "params": p}, x, feats, train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(jnp.where(out > -1e8, out, 0.0).astype(
                jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(vs_p)
        s = sum(jnp.sum(q.astype(jnp.float32))
                for q in jax.tree_util.tree_leaves(g))
        return (vs_p, x + ((l + s) * 1e-12).astype(x.dtype))

    timeit(f"SA1 fwd+bwd B={B} fused={fused}", step, (vs["params"], xyz))


def bench_model(fused):
    from pointcloud_tpu.models import AE, backbone_factory
    from pointcloud_tpu.ops import chamfer_distance

    os.environ.pop("PCTPU_DISABLE_FUSED_SA", None)
    if not fused:
        os.environ["PCTPU_DISABLE_FUSED_SA"] = "1"
    x0 = jnp.asarray(rng.random((B, 2048, 6), dtype=np.float32))
    bk = backbone_factory["PointNet2"](feature_dims=3, dtype=jnp.bfloat16)
    model = AE(bk, out_points=2048, out_dim=6, bottleneck=16,
               dtype=jnp.bfloat16)
    vs = model.init(jax.random.PRNGKey(0), x0[:1], train=True)
    tx = optax.adam(1e-3)
    ostate = tx.init(vs["params"])

    @jax.jit
    def step(state):
        params, bstats, ostate, x = state

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bstats}, x, train=True,
                mutable=["batch_stats"],
            )
            return chamfer_distance(
                out[..., :3].astype(jnp.float32), x[..., :3]
            ), mut["batch_stats"]

        (l, bs2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, o2 = tx.update(grads, ostate, params)
        return (optax.apply_updates(params, up), bs2, o2, x + l * 1e-12)

    timeit(
        f"PointNet2 AE train step B={B} fused={fused}", step,
        (vs["params"], vs["batch_stats"], ostate, x0),
    )


print(f"backend={jax.default_backend()} B={B}")
if mode in ("sa", "both"):
    bench_sa(True)
    bench_sa(False)
if mode in ("model", "both"):
    bench_model(True)
    bench_model(False)
