"""Multi-host (jax.distributed) wiring test: two REAL processes join a
coordinator over localhost, build a global mesh, shard a batch with
shard_batch_global, and run a replicated-params train-ish step whose psum
rides the cross-process collective (SURVEY.md §2.3; VERDICT r2 missing #2).

CPU backend, 2 processes x 2 forced host devices = 4 global devices.
"""

import os
import pytest
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import importlib.util
import os
import sys
import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize overrides the env

pid = int(sys.argv[1])
port = sys.argv[2]

# load parallel/distributed.py WITHOUT executing the package __init__ —
# importing pointcloud_tpu initializes the XLA backend (env registration),
# which must not happen before jax.distributed.initialize()
_spec = importlib.util.spec_from_file_location(
    "dist_standalone",
    os.path.join("pointcloud_tpu", "parallel", "distributed.py"),
)
_dist = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_dist)

joined = _dist.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert joined
global_mesh = _dist.global_mesh
process_local_batch_slice = _dist.process_local_batch_slice

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()  # 2 local x 2 procs
assert jax.local_device_count() == 2

mesh = global_mesh(("data",))

# every process builds the same global batch; each contributes its slice
B = 8
rng = np.random.default_rng(0)
x = rng.random((B, 16, 3)).astype(np.float32)
sl = process_local_batch_slice(B)
assert (sl.stop - sl.start) == 4 and sl.start == pid * 4

from pointcloud_tpu.train.harness import replicate, shard_batch_global

(gx,) = shard_batch_global(mesh, (x,), B)
assert gx.shape == (B, 16, 3)

# replicated params + sharded batch -> grad psum over the 2 processes
w = replicate(mesh, jnp.ones((3, 1), jnp.float32) * 0.5)


@jax.jit
def step(w, x):
    def loss_fn(w):
        return jnp.mean((jnp.einsum("bnc,cd->bnd", x, w)) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(w)
    return loss, w - 0.1 * g


loss, w2 = step(w, gx)

# reference computed locally on the full batch
wl = np.full((3, 1), 0.5, np.float32)
want = float(np.mean(np.einsum("bnc,cd->bnd", x, wl) ** 2))
got = float(loss)
assert abs(got - want) <= 1e-6, (got, want)
w2n = np.asarray(jax.device_get(w2))
print(f"OK pid={pid} loss={got:.6f} w2={w2n.ravel().tolist()}")
"""


@pytest.mark.slow
def test_two_process_multihost_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out}"
        assert f"OK pid={pid}" in out, out
    # both processes computed the identical updated weights
    w0 = outs[0].split("w2=")[1].strip()
    w1 = outs[1].split("w2=")[1].strip()
    assert w0 == w1, (w0, w1)
