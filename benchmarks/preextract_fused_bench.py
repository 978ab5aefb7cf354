"""One PreExtraction stage fwd+bwd on TPU: fused Pallas path vs XLA.

Usage: python benchmarks/preextract_fused_bench.py [stage(1-4)] [B] [impl...]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_tpu.models.pointmlp import PreExtraction

STAGES = {
    1: (1024, 24, 128, 128),
    2: (512, 24, 256, 256),
    3: (256, 24, 512, 512),
    4: (128, 24, 1024, 1024),
}

stage = int(sys.argv[1]) if len(sys.argv) > 1 else 1
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
impls = sys.argv[3:] or ["fused", "xla"]
ITERS = 10

G, K, Cin, Cout = STAGES[stage]
rng = np.random.default_rng(0)
mod = PreExtraction(Cout, 2, 1.0, use_bias=False, dtype=jnp.bfloat16)
x0 = jnp.asarray(rng.random((B, G, K, Cin), dtype=np.float32)).astype(
    jnp.bfloat16
)
vs = mod.init(jax.random.PRNGKey(0), x0[:1], train=True)
print(f"stage{stage} B={B} ({G}x{K}x{Cout})", flush=True)

for impl in impls:
    def fwdbwd(x, impl=impl):
        def loss(p):
            out, _ = mod.apply(
                {**vs, "params": p}, x, train=True, impl=impl,
                mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(vs["params"])
        s = sum(jnp.sum(q.astype(jnp.float32))
                for q in jax.tree_util.tree_leaves(g))
        return x + ((l + s) * 1e-12).astype(x.dtype)

    step = jax.jit(fwdbwd)
    t0 = time.perf_counter()
    x = step(x0)
    jax.block_until_ready(x)
    print(f"  {impl}: compile+1st {time.perf_counter()-t0:.1f} s", flush=True)
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            x = step(x)
        jax.block_until_ready(x)
        float(jnp.sum(x[0, 0, 0]))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"  {impl}: fwd+bwd {dt:8.2f} ms", flush=True)
