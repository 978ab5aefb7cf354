"""Trace one jitted train step and print the top device ops by duration.

Parses the jax.profiler xplane dump with tensorflow's tsl proto (the
round-2 trace-guided-optimization workflow, packaged as a script).

Usage: python benchmarks/trace_top_ops.py [PointNet|PointNet2|PointMLP] [B] [topk]
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
import optax

from pointcloud_tpu.models import AE, backbone_factory
from pointcloud_tpu.ops import chamfer_distance

backbone = sys.argv[1] if len(sys.argv) > 1 else "PointNet"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
TOPK = int(sys.argv[3]) if len(sys.argv) > 3 else 40

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.random((B, 2048, 6), dtype=np.float32))
bk = backbone_factory[backbone](feature_dims=3, dtype=jnp.bfloat16)
model = AE(bk, out_points=2048, out_dim=6, bottleneck=16, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), x0[:1], train=True)
tx = optax.adam(1e-3)


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


state = (variables["params"], variables["batch_stats"], tx.init(variables["params"]), x0)
state = step(state)
jax.block_until_ready(state[3])
state = step(state)
jax.block_until_ready(state[3])

logdir = "/tmp/trace_top_ops"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
for _ in range(3):
    state = step(state)
jax.block_until_ready(state[3])
float(jnp.sum(state[3][0, 0]))
jax.profiler.stop_trace()

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
assert paths, f"no xplane under {logdir}"
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(paths[-1], "rb").read())

# Async copy/slice-start events report their full start->done SPAN — many
# are in flight at once, so their durations overlap and cannot be summed.
# Ops on the compute track (fusions, custom calls, dynamic-update-slice...)
# are serialized and DO attribute exclusive step time.
_ASYNC = ("%copy-start", "%slice-start", "%copy-done", "%slice-done",
          "%all-gather-start", "%all-reduce-start", "%send", "%recv")


def _is_async(name):
    return name.startswith(_ASYNC)


dur = defaultdict(float)
cnt = defaultdict(int)
for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    # Prefer the per-op line ("XLA Ops"); the "XLA Modules" line holds one
    # whole-step event and "Steps" holds markers — neither attributes time.
    lines = [l for l in plane.lines if "XLA Ops" in l.name]
    if not lines:
        lines = [
            l for l in plane.lines
            if "XLA Modules" not in l.name and "Steps" not in l.name
        ]
    for line in lines:
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            dur[name] += ev.duration_ps / 1e9  # ms
            cnt[name] += 1

sync = {n: d for n, d in dur.items() if not _is_async(n)}
total = sum(dur.values())
print(f"{backbone} B={B}: traced 3 steps; total device op-time "
      f"{total:.1f} ms ({total / 3:.1f} ms/step); compute-track "
      f"{sum(sync.values()) / 3:.1f} ms/step (async DMA spans overlap "
      f"and are listed separately)")
print("-- compute track (serialized; sums to real step attribution) --")
for name, d in sorted(sync.items(), key=lambda kv: -kv[1])[:TOPK]:
    print(f"{d / 3:9.3f} ms/step  x{cnt[name] // 3:<4} {name[:110]}")
print("-- async DMA spans (overlapping; shows WHAT moves, not cost) --")
for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:TOPK]:
    if _is_async(name):
        print(f"{d / 3:9.3f} ms/step  x{cnt[name] // 3:<4} {name[:110]}")
