"""Micro-benchmark: one PointMLP PreExtraction block fwd / fwd+bwd on TPU.

Quantifies the per-stage cost of the residual Dense+BN stacks that dominate
the full-PointMLP train step (benchmarks/pointmlp_ablate.py), against the
HBM roofline, to size the payoff of a fused recompute-for-stats kernel.

Usage: python benchmarks/preextract_profile.py [B] [iters]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_tpu.models.pointmlp import PreExtraction

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
rng = np.random.default_rng(0)

# full-PointMLP stage shapes: (G, K, Cin, Cout, blocks, exp)
STAGES = [
    (1024, 24, 128, 128, 2, 1.0),
    (512, 24, 256, 256, 2, 1.0),
    (256, 24, 512, 512, 2, 1.0),
    (128, 24, 1024, 1024, 2, 1.0),
]


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
    print(f"{name:<46} {dt:8.2f} ms", flush=True)
    return dt


print(f"backend={jax.default_backend()} B={B} PreExtraction per-stage")
for i, (G, K, Cin, Cout, blocks, exp) in enumerate(STAGES):
    mod = PreExtraction(Cout, blocks, exp, use_bias=False, dtype=jnp.bfloat16)
    x0 = jnp.asarray(
        rng.random((B, G, K, Cin), dtype=np.float32)
    ).astype(jnp.bfloat16)
    vs = mod.init(jax.random.PRNGKey(0), x0[:1], train=True)
    mb = B * G * K * Cout * 2 / 1e6

    def fwd(x, mod=mod, vs=vs):
        out, _ = mod.apply(vs, x, train=True, mutable=["batch_stats"])
        return x + jnp.sum(out).astype(x.dtype) * 1e-12

    def fwdbwd(x, mod=mod, vs=vs):
        def loss(p):
            out, _ = mod.apply(
                {**vs, "params": p}, x, train=True, mutable=["batch_stats"]
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(vs["params"])
        s = sum(jnp.sum(q.astype(jnp.float32)) for q in jax.tree_util.tree_leaves(g))
        return x + ((l + s) * 1e-12).astype(x.dtype)

    f = bench(f"stage{i+1} ({G}x{K}x{Cout}, {mb:.0f} MB/act) fwd", fwd, x0)
    fb = bench(f"stage{i+1} fwd+bwd", fwdbwd, x0)
