"""TPU train-step cost for every BASELINE.json config (VERDICT r2 #3).

Builds each model via train.harness.create_model (the real production
spec: model + loss + device-side transforms), feeds synthetic batches with
the dataset contracts' shapes, and times the jitted donated train step
with chained parameter evolution + a forced host transfer.

Usage: python benchmarks/config_step_bench.py [config ...]
  configs: ae-chamfer ae2-chamfer segmenter-emd multiseg-chamfer state
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import optax

from pointcloud_tpu.train.harness import create_model, make_train_step

N = 2048

# (name, model_type, backbone, loss_override, batch)
CONFIGS = {
    "ae-chamfer": ("Autoencoder", "PointNet", "chamfer", 256),
    "ae2-chamfer": ("Autoencoder", "PointNet2", "chamfer", 64),
    "segmenter-emd": ("Segmenter", "PointNet", None, 64),
    "multiseg-chamfer": ("MultiSegmenter", "PointNet", None, 64),
    "state": ("StatePredictor", "PointNet", None, 64),
    # VERDICT r2 weak #5: EMD training at realistic batch (fused Sinkhorn,
    # constant-eps training operating point cfg.emd_eps/iterations)
    "ae-emd": ("Autoencoder", "PointNet", None, 128),
}


def synth_batch(spec, B, rng):
    """Raw (pre-transform) batches with the dataset contracts' shapes."""
    x = rng.random((B, N, 6), dtype=np.float32)
    # keep coords inside the scene bbox so Normalize lands in [0, 1]
    bbox = np.asarray(spec.scene.bbox, np.float32)
    x[..., :3] = bbox[:, 0] + x[..., :3] * (bbox[:, 1] - bbox[:, 0])
    x = jnp.asarray(x)
    if spec.model_type == "Autoencoder":
        y = x
    elif spec.model_type in ("Segmenter", "MultiSegmenter"):
        C = len(spec.scene.classes)
        lab = rng.integers(0, C, (B, N, 1)).astype(np.float32)
        y = jnp.asarray(np.concatenate([np.asarray(x[..., :3]), lab], -1))
    else:  # StatePredictor: dict of ground-truth states
        dims = {n: d for n, d in zip(spec.scene.states, spec.scene.state_dim)
                if d > 0}
        y = {
            n: jnp.asarray(rng.random((B, d), dtype=np.float32))
            for n, d in dims.items()
        }
    return x, y


def bench(name, iters=10):
    model_type, backbone, loss_override, B = CONFIGS[name]
    spec, _ = create_model(model_type, backbone, "Cube",
                           loss_override=loss_override)
    rng = np.random.default_rng(0)
    x, y = synth_batch(spec, B, rng)

    variables = spec.model.init(jax.random.PRNGKey(0), x[:1], train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(spec, tx)

    # FLOPs of the optimized step program (XLA cost model) -> MFU rollup
    # (VERDICT r3 missing #2). Counted before running: donation invalidates
    # nothing since lower() only traces.
    flops = hbm_bytes = float("nan")
    try:
        ca = step.lower(params, batch_stats, opt_state, x, y) \
                 .compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        hbm_bytes = float(ca.get("bytes accessed", float("nan")))
    except Exception as e:
        print(f"{name:<18} cost_analysis unavailable: {e}", flush=True)

    t0 = time.perf_counter()
    params, batch_stats, opt_state, loss, logs = step(
        params, batch_stats, opt_state, x, y
    )
    float(loss)
    print(f"{name:<18} compile+1st {time.perf_counter() - t0:6.1f} s",
          flush=True)
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, batch_stats, opt_state, loss, logs = step(
                params, batch_stats, opt_state, x, y
            )
        float(loss)
        dt = (time.perf_counter() - t0) / iters
    print(
        f"{name:<18} B={B:<4} {dt * 1e3:7.1f} ms/step -> "
        f"{B / dt:8,.0f} clouds/s (loss={float(loss):.4f})", flush=True,
    )
    if flops == flops:  # not NaN
        # v5e peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM
        mxu_ms = flops / 197e12 * 1e3
        hbm_ms = hbm_bytes / 819e9 * 1e3
        print(
            f"{name:<18} {flops / 1e12:6.2f} TFLOP/step, "
            f"{flops / dt / 1e12:5.1f} TFLOP/s = {flops / dt / 197e12:5.1%} MFU"
            f" | roofline: mxu {mxu_ms:5.1f} ms, hbm {hbm_ms:5.1f} ms"
            f" (permitted {max(mxu_ms, hbm_ms):5.1f} ms)", flush=True,
        )


if __name__ == "__main__":
    names = sys.argv[1:] or list(CONFIGS)
    print(f"backend={jax.default_backend()}")
    for n in names:
        try:
            bench(n)
        except Exception as e:  # keep benching the rest
            print(f"{n:<18} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
