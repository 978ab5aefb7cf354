"""Per-pass compute-track trace of ONE PreExtraction stage fwd+bwd.

Splits a stage's fused-chain time (benchmarks/preextract_fused_bench.py)
into its individual Pallas passes so the 2-2.7x standalone-vs-roofline
gap can be located: inside the passes (per-pass ms vs that pass's own
HBM/MXU floor) or between them (scheduling gaps — the compute-track sum
vs the measured wall time).

Usage: python benchmarks/preextract_stage_trace.py [stage] [B] [topk]
"""
import glob
import os
import sys
import time
from collections import defaultdict

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
TOPK = int(sys.argv[3]) if len(sys.argv) > 3 else 30

G, K, Cin, Cout = STAGES[stage]
rng = np.random.default_rng(0)
mod = PreExtraction(Cout, 2, 1.0, use_bias=False, dtype=jnp.bfloat16)
x0 = jnp.asarray(rng.random((B, G, K, Cin), dtype=np.float32)).astype(
    jnp.bfloat16)
vs = mod.init(jax.random.PRNGKey(0), x0[:1], train=True)


@jax.jit
def fwdbwd(x):
    def loss(p):
        out, _ = mod.apply(
            {**vs, "params": p}, x, train=True, impl="fused",
            mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    l, g = jax.value_and_grad(loss)(vs["params"])
    s = sum(jnp.sum(q.astype(jnp.float32))
            for q in jax.tree_util.tree_leaves(g))
    return x + ((l + s) * 1e-12).astype(x.dtype)


x = fwdbwd(x0)
jax.block_until_ready(x)
t0 = time.perf_counter()
for _ in range(10):
    x = fwdbwd(x)
jax.block_until_ready(x)
wall = (time.perf_counter() - t0) / 10 * 1e3
print(f"stage{stage} B={B}: {wall:.2f} ms/iter wall (chained x10)")

logdir = "/tmp/pe_stage_trace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
for _ in range(3):
    x = fwdbwd(x)
jax.block_until_ready(x)
float(jnp.sum(x[0, 0, 0]))
jax.profiler.stop_trace()

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(paths[-1], "rb").read())

_ASYNC = ("%copy-start", "%slice-start", "%copy-done", "%slice-done")
dur = defaultdict(float)
cnt = defaultdict(int)
for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    lines = [ln for ln in plane.lines if "XLA Ops" in ln.name]
    for line in lines:
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            dur[name] += ev.duration_ps / 1e9
            cnt[name] += 1

sync = {n: d for n, d in dur.items() if not n.startswith(_ASYNC)}
print(f"compute-track {sum(sync.values()) / 3:.2f} ms/iter "
      f"(gap to wall = scheduling + non-overlapped DMA)")
for name, d in sorted(sync.items(), key=lambda kv: -kv[1])[:TOPK]:
    print(f"{d / 3:8.3f} ms  x{cnt[name] // 3:<3} {name[:100]}")
