import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import optax
from pointcloud_tpu.models import AE, backbone_factory
from pointcloud_tpu.ops import chamfer_distance

def bench_train(backbone_name, B, dtype, n_points=2048, iters=10):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((B, n_points, 6), dtype=np.float32))
    kw = dict(feature_dims=3) if backbone_name.startswith("PointNet") else {}
    bk = backbone_factory[backbone_name](dtype=dtype, **kw)
    model = AE(bk, out_points=n_points, out_dim=6, bottleneck=16, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), x0[:1], train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(state):
        params, batch_stats, opt_state, x = state
        def loss_fn(p):
            out, mut = model.apply({"params": p, "batch_stats": batch_stats}, x, train=True, mutable=["batch_stats"])
            return chamfer_distance(out[..., :3].astype(jnp.float32), x[..., :3]), mut["batch_stats"]
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt2 = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), stats, opt2, x), loss

    state = (params, batch_stats, opt_state, x0)
    state, loss = step(state); float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state)
    float(loss)
    dt = (time.perf_counter()-t0)/iters
    name = "bf16" if dtype is not None else "fp32"
    print(f"{backbone_name} B={B} {name}: {dt*1e3:.1f} ms/step -> {B/dt:,.0f} clouds/s (loss={float(loss):.4f})", flush=True)

name, B = sys.argv[1], int(sys.argv[2])
modes = sys.argv[3:] or ["fp32", "bf16"]
for m in modes:
    bench_train(name, B, jnp.bfloat16 if m == "bf16" else None)
