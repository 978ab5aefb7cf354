"""Fused-Sinkhorn kernel probe: in-jit chained timing at a given shape.

Usage: python benchmarks/sinkhorn_probe.py [B] [N] [iters] [reps]

Chains a data dependency between repetitions inside ONE jitted program
(remote-relay dedup, see CLAUDE.md) and forces a host transfer at the end.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_tpu.ops.pallas_kernels import sinkhorn_match_pallas

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 50
REPS = int(sys.argv[4]) if len(sys.argv) > 4 else 10

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))
y = jnp.asarray(rng.random((B, N, 3), dtype=np.float32))


@jax.jit
def probe(x, y):
    acc = jnp.float32(0.0)
    for _ in range(REPS):
        d, a = sinkhorn_match_pallas(x, y, eps=0.005, iters=ITERS)
        s = jnp.sum(d)
        acc = acc + s
        x = x + s * 1e-20  # chain: next rep depends on the previous
    return acc


print(f"backend={jax.default_backend()} B={B} N={N} iters={ITERS}")
t0 = time.perf_counter()
float(probe(x, y))
print(f"compile+1st {time.perf_counter() - t0:.1f} s")
for _ in range(2):
    t0 = time.perf_counter()
    float(probe(x, y))
    dt = (time.perf_counter() - t0) / REPS
print(f"{dt * 1e3:.2f} ms/call -> {B / dt:,.0f} clouds/s")
