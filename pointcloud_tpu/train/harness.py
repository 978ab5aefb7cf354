"""Training harness (reference: pointcloud_vision/train.py:19-226).

`create_model(model_type, backbone, scene, ...)` wires architecture + loss +
dataset factory per model type exactly as the reference (train.py:79-156);
`train(...)` runs the jitted, data-parallel training loop with TensorBoard
logging and orbax checkpoints under the reference's
`output/{scene}/{Model}_{Backbone}/version_N` layout (train.py:166-206).

TPU-first mechanics replacing PyTorch Lightning:
  * one `jax.jit`-compiled train step: device-side input transforms (vmapped
    Normalize etc.), model fwd, loss, grad, optax Adam update, BatchNorm
    state update — params donated, so the update is in-place in HBM.
  * mixed precision: params/activations are fp32; TPU matmuls run bf16 with
    fp32 accumulation by default (the '16-mixed' analog, cfg.precision).
  * data parallelism: batches are sharded over a 1-D device mesh ('data');
    replicated params + sharded batch lets XLA insert the gradient psum
    (no DDP/NCCL — SURVEY.md §2.3).
  * sub-loss logging: the loss object's injected `log` hook (train.py:161)
    writes traced scalars into an aux dict returned from the jitted step.
"""

from __future__ import annotations

import dataclasses
import math
import os
import re
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import unfreeze

from pointcloud_tpu import cfg
from pointcloud_tpu.data.dataset import BatchLoader, PointCloudDataset, PointCloudGTDataset
from pointcloud_tpu.envs.scenes import scene_config
from pointcloud_tpu.losses import (
    EarthMoverDistance,
    ChamferDistance,
    SegmentingChamferDistance,
    StatePredictionLoss,
)
from pointcloud_tpu.models.architectures import (
    AE,
    MultiGTEncoder,
    MultiSegAE,
    SegAE,
    backbone_factory,
)
from pointcloud_tpu.transforms import Normalize


@dataclasses.dataclass
class TrainSpec:
    """Everything `train` needs for one model configuration."""

    model: Any  # flax module
    loss: Any  # loss object (callable, with .log hook)
    open_dataset: Callable[[str], Any]  # input_dir -> dataset
    in_transform: Any  # device-side transform for input clouds (or None)
    out_transform: Any  # device-side transform for target clouds (or None)
    model_type: str
    backbone: str
    scene_name: str
    scene: Any  # SimpleNamespace scene config
    dict_target: bool = False  # target is a dict of states (StatePredictor)


def _apply_tf(tf, batch):
    """vmap a (pc, mask, key)->(pc, mask) transform over a batch; no key."""
    if tf is None:
        return batch
    out, _ = jax.vmap(lambda p: tf(p, None, None))(batch)
    return out


def create_model(
    model_type: str,
    backbone: str,
    scene: str,
    load_dir: str | None = None,
    encoder_only: bool = False,
    loss_override: str | None = None,
):
    """Build (spec, loaded_variables_or_None) (reference train.py:71-163).

    loss_override: 'chamfer' swaps the AE EMD loss for plain Chamfer (the
    BASELINE.json "Chamfer loss" config; the reference reaches it by editing
    create_model).
    """
    scene_name = scene
    sc = scene_config(scene_name)
    dtype = cfg.compute_dtype()  # bf16 activations on TPU (cfg.precision)
    encoder_backbone = backbone_factory[backbone](feature_dims=3, dtype=dtype)

    if model_type == "Autoencoder":
        model = AE(
            encoder_backbone,
            out_points=sc.sample_points,
            out_dim=6,
            bottleneck=sum(sc.class_latent_dim),
            dtype=dtype,
        )
        if loss_override == "chamfer":
            loss = ChamferDistance()
        else:
            loss = EarthMoverDistance(
                eps=cfg.emd_eps, its=cfg.emd_iterations, num_classes=None,
                anneal_from=None,  # constant-eps training operating point
            )
        spec = TrainSpec(
            model=model,
            loss=loss,
            open_dataset=lambda input_dir: PointCloudDataset(
                root_dir=input_dir, in_features=["rgb"], out_features=["rgb"]
            ),
            in_transform=Normalize(sc.bbox),
            out_transform=Normalize(sc.bbox),
            model_type=model_type,
            backbone=backbone,
            scene_name=scene_name,
            scene=sc,
        )

    elif model_type == "Segmenter":
        C = len(sc.classes)
        model = SegAE(
            encoder_backbone,
            num_classes=C,
            out_points=sc.sample_points,
            bottleneck=sum(sc.class_latent_dim),
            dtype=dtype,
        )
        loss = EarthMoverDistance(
            eps=cfg.emd_eps, its=cfg.emd_iterations, num_classes=C,
            anneal_from=None,  # constant-eps training operating point
        )
        spec = TrainSpec(
            model=model,
            loss=loss,
            open_dataset=lambda input_dir: PointCloudDataset(
                root_dir=input_dir, in_features=["rgb"], out_features=["segmentation"]
            ),
            in_transform=Normalize(sc.bbox),
            out_transform=Normalize(sc.bbox),
            model_type=model_type,
            backbone=backbone,
            scene_name=scene_name,
            scene=sc,
        )

    elif model_type == "MultiSegmenter":
        name_points_dims = [
            (n, math.ceil(p * sc.sample_points), d)
            for (n, p, d) in zip(sc.classes, sc.class_distribution, sc.class_latent_dim)
            if d > 0
        ]
        class_labels = {n: sc.classes.index(n) for (n, _, _) in name_points_dims}
        model = MultiSegAE(
            preencoder=encoder_backbone,
            class_labels=class_labels,
            name_points_dims=tuple(name_points_dims),
            dtype=dtype,
        )
        loss = SegmentingChamferDistance(class_labels)
        spec = TrainSpec(
            model=model,
            loss=loss,
            open_dataset=lambda input_dir: PointCloudDataset(
                root_dir=input_dir, in_features=["rgb"], out_features=["segmentation"]
            ),
            in_transform=Normalize(sc.bbox),
            out_transform=Normalize(sc.bbox),
            model_type=model_type,
            backbone=backbone,
            scene_name=scene_name,
            scene=sc,
        )

    elif model_type == "StatePredictor":
        state_dims = {n: d for (n, d) in zip(sc.states, sc.state_dim) if d > 0}
        # normalize 3-d position states into the unit cube via the scene bbox
        # (reference pc_encoder.StatePredictor.from_state)
        bbox = jnp.asarray(sc.bbox, dtype=jnp.float32)

        def norm_pos(x, bbox=bbox):
            lo, hi = bbox[:, 0], bbox[:, 1]
            return (x - lo) / (hi - lo)

        transforms = {n: norm_pos for n, d in state_dims.items() if d == 3}
        model = MultiGTEncoder(
            preencoder=encoder_backbone, state_dims=state_dims, dtype=dtype
        )
        loss = StatePredictionLoss(list(state_dims), transforms)
        spec = TrainSpec(
            model=model,
            loss=loss,
            open_dataset=lambda input_dir: PointCloudGTDataset(
                root_dir=input_dir, in_features=["rgb"]
            ),
            in_transform=Normalize(sc.bbox),
            out_transform=None,
            model_type=model_type,
            backbone=backbone,
            scene_name=scene_name,
            scene=sc,
            dict_target=True,
        )
    else:
        raise NotImplementedError(f"Unknown model type: {model_type}")

    variables = None
    if load_dir:
        variables = load_checkpoint_variables(load_dir, encoder_only=encoder_only)
    return spec, variables


############################ checkpointing ############################


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(ckpt_dir: str, step: int, payload: dict):
    """Write an orbax checkpoint at ckpt_dir/step_{step} (train.py run layout)."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = _ocp().StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


# One background writer: saves serialize among themselves but overlap with
# training. The device->host transfer is the expensive part here (~370 MB
# through the remote-TPU tunnel, ~90 s — benchmarks/RESULTS.md), so it must
# happen OFF the training thread, not just the file write.
_ckpt_executor = None
_pending_saves: list = []


def save_checkpoint_async(ckpt_dir: str, step: int, payload: dict):
    """Checkpoint device-resident state without stalling the train loop.

    Device buffers are first snapshotted on-device (cheap HBM copy) so the
    train step's donated-argument updates can't invalidate them, then a
    background thread pulls the snapshot to host and writes the orbax
    checkpoint. Call `wait_for_checkpoints()` before relying on the files.
    """
    import concurrent.futures

    global _ckpt_executor
    if _ckpt_executor is None:
        _ckpt_executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt"
        )
    snap = jax.tree_util.tree_map(
        lambda a: jnp.copy(a) if isinstance(a, jax.Array) else a, payload
    )
    fut = _ckpt_executor.submit(
        lambda: save_checkpoint(ckpt_dir, step, jax.device_get(snap))
    )
    _pending_saves.append(fut)
    return fut


def wait_for_checkpoints():
    """Block until every async checkpoint has been written (re-raises any
    writer exception)."""
    while _pending_saves:
        _pending_saves.pop().result()


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """Latest step_N dir (reference pc_encoder.py:15-26 discovery semantics)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        d for d in os.listdir(ckpt_dir) if d.startswith("step_") and d[5:].isdigit()
    ]
    if not steps:
        return None
    best = max(steps, key=lambda d: int(d[5:]))
    return os.path.join(ckpt_dir, best)


def load_checkpoint_raw(path: str) -> dict:
    ckptr = _ocp().StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def strip_decoders(params: dict) -> dict:
    """Drop decoder subtrees (reference encoder_only, train.py:85-130)."""
    return {
        k: v for k, v in params.items() if not k.startswith(("decoder", "Decoder"))
    }


def load_checkpoint_variables(path: str, encoder_only: bool = False) -> dict:
    """Load {'params', 'batch_stats', ...}; optionally without decoders
    (strict=False analog: the caller merges with fresh init)."""
    payload = load_checkpoint_raw(path)
    if encoder_only:
        payload = dict(payload)
        payload["params"] = strip_decoders(payload["params"])
    return payload


def merge_variables(fresh: dict, loaded: dict) -> dict:
    """Overlay loaded subtrees onto freshly-initialized variables
    (flax strict=False load)."""

    def merge(a, b):
        if isinstance(a, dict) and isinstance(b, dict):
            out = dict(a)
            for k, v in b.items():
                out[k] = merge(a[k], v) if k in a else v
            return out
        return b

    fresh = unfreeze(fresh) if hasattr(fresh, "unfreeze") else dict(fresh)
    out = {}
    for coll in fresh:
        out[coll] = merge(fresh[coll], loaded.get(coll, {}))
    return out


############################ jitted steps ############################


def _forward_loss(spec: TrainSpec, params, batch_stats, x, y, train_mode: bool):
    """Shared fwd+loss; returns (loss, (new_batch_stats, logs))."""
    logs = {}
    spec.loss.log = lambda k, v: logs.__setitem__(k, v)
    variables = {"params": params, "batch_stats": batch_stats}
    if train_mode:
        out, mutated = spec.model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        new_stats = mutated["batch_stats"]
    else:
        out = spec.model.apply(variables, x, train=False)
        new_stats = batch_stats
    loss = spec.loss(out, y)
    spec.loss.log = lambda k, v: None
    return loss, (new_stats, logs)


def make_train_step(spec: TrainSpec, tx):
    """Build the donated, jitted train step."""

    def step(params, batch_stats, opt_state, x_raw, y_raw):
        x = _apply_tf(spec.in_transform, x_raw)
        y = y_raw if spec.dict_target else _apply_tf(spec.out_transform, y_raw)

        (loss, (new_stats, logs)), grads = jax.value_and_grad(
            lambda p: _forward_loss(spec, p, batch_stats, x, y, True), has_aux=True
        )(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt_state, loss, logs

    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_eval_step(spec: TrainSpec):
    def step(params, batch_stats, x_raw, y_raw):
        x = _apply_tf(spec.in_transform, x_raw)
        y = y_raw if spec.dict_target else _apply_tf(spec.out_transform, y_raw)
        logs = {}
        spec.loss.log = lambda k, v: logs.__setitem__(k, v)
        out = spec.model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        loss = spec.loss(out, y)
        spec.loss.log = lambda k, v: None
        # `out` doubles as the sample prediction for mesh logging
        # (train.py:43-53) — one forward pass serves both
        return loss, logs, out

    return jax.jit(step)


############################ sharding ############################


def data_mesh(batch_size: int | None = None):
    """1-D 'data' mesh; uses the most devices that evenly divide batch_size."""
    from jax.sharding import Mesh

    devices = jax.devices()
    n = len(devices)
    if batch_size is not None:
        while n > 1 and batch_size % n != 0:
            n -= 1
    return Mesh(np.array(devices[:n]), ("data",))


def shard_batch(mesh, batch):
    """Shard leading (batch) axis over the mesh; pytree-aware."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def shard_batch_global(mesh, batch, global_batch_size: int):
    """Multi-host batch sharding: every process holds the SAME global batch
    (identically seeded loaders); each keeps only its
    process_local_batch_slice rows and the slices assemble into one global
    jax.Array sharded over 'data' (SURVEY.md §2.3 multi-host DCN story)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pointcloud_tpu.parallel.distributed import process_local_batch_slice

    sl = process_local_batch_slice(global_batch_size)

    def put(x):
        x = np.asarray(x)
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x[sl], x.shape
        )

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh, tree):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


############################ training loop ############################


def train(
    model_type: str,
    backbone: str,
    scene: str,
    epochs: int | None = None,
    batch_size: int | None = None,
    ckpt_path: str | None = None,
    dataset_dir: str | None = None,
    output_root: str = "output",
    input_root: str = "input",
    loss_override: str | None = None,
    seed: int = 0,
    log_meshes: bool = True,
    data_parallel: bool = True,
    profile: bool = False,
    multihost: bool = False,
):
    """Train a vision model (reference train.py:166-206).

    Expects input/{dataset_dir}/{train,val}/*.npz; writes TensorBoard logs +
    orbax checkpoints under output/{dataset_dir}/{Model}_{Backbone}/version_N.
    Returns (final train loss, checkpoint dir).

    multihost=True: the process must already have joined the distributed
    runtime (parallel.distributed.initialize(); train.py --multihost does
    this before touching JAX). The mesh then spans every host's devices,
    all hosts must run identically-seeded loaders (same `seed`), and each
    host feeds only its process_local_batch_slice of every batch
    (shard_batch_global). batch_size is the GLOBAL batch and must divide by
    the global device count.
    """
    epochs = epochs or cfg.vision_epochs
    batch_size = batch_size or cfg.vision_batch_size

    spec, _ = create_model(model_type, backbone, scene, loss_override=loss_override)
    dataset_dir = dataset_dir or scene
    input_dir = os.path.join(input_root, dataset_dir)
    output_dir = os.path.join(output_root, dataset_dir, f"{model_type}_{backbone}")

    # version_N management (train.py:176-182)
    if ckpt_path:
        m = re.search(r"version_(\d+)", ckpt_path)
        version = int(m.group(1)) if m else 0
        print("detected version number from ckpt path:", version)
    else:
        existing = []
        if os.path.isdir(output_dir):
            existing = [
                int(d[8:])
                for d in os.listdir(output_dir)
                if d.startswith("version_") and d[8:].isdigit()
            ]
        version = max(existing) + 1 if existing else 0
    run_dir = os.path.join(output_dir, f"version_{version}")
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    train_ds = spec.open_dataset(os.path.join(input_dir, "train"))
    val_ds = spec.open_dataset(os.path.join(input_dir, "val"))

    def make_loader(ds, split_dir, shuffle, drop_last):
        # fast path: the native C++ threaded loader covers cloud->cloud
        # datasets with no host-side transforms (transforms run on-device)
        if (
            cfg.use_native_loader
            and isinstance(ds, PointCloudDataset)
            and ds.in_transform is None
            and ds.out_transform is None
        ):
            try:
                from pointcloud_tpu.data.native_loader import (
                    NativeCloudPairLoader,
                    native_available,
                )

                if native_available():
                    return NativeCloudPairLoader(
                        split_dir,
                        in_features=ds.in_features,
                        out_features=ds.out_features,
                        batch_size=batch_size,
                        shuffle=shuffle,
                        seed=seed,
                        threads=cfg.loader_threads,
                        prefetch=cfg.prefetch_batches,
                        drop_last=drop_last,
                    )
            except Exception:
                pass
        return BatchLoader(
            ds, batch_size, shuffle=shuffle, seed=seed,
            threads=cfg.loader_threads, prefetch=cfg.prefetch_batches,
            drop_last=drop_last,
        )

    train_loader = make_loader(
        train_ds, os.path.join(input_dir, "train"), True, True
    )
    val_loader = make_loader(val_ds, os.path.join(input_dir, "val"), False, False)

    # init
    sample_x, _ = _stack_peek(train_ds, min(2, len(train_ds)))
    rng = jax.random.PRNGKey(seed)
    variables = spec.model.init(rng, jnp.asarray(sample_x), train=False)
    params = unfreeze(variables).get("params", {})
    batch_stats = unfreeze(variables).get("batch_stats", {})

    start_epoch = 0
    tx = optax.adam(cfg.vision_lr)
    opt_state = tx.init(params)
    if ckpt_path:
        payload = load_checkpoint_raw(ckpt_path)
        params = payload["params"]
        batch_stats = payload.get("batch_stats", batch_stats)
        if "opt_state_leaves" in payload:
            # optax states are NamedTuple pytrees; they round-trip through
            # orbax as a flat leaf list + the live tree structure.
            treedef = jax.tree_util.tree_structure(opt_state)
            leaves = [
                payload["opt_state_leaves"][str(i)]
                for i in range(len(payload["opt_state_leaves"]))
            ]
            opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        start_epoch = int(np.asarray(payload.get("epoch", -1))) + 1
        print(f"resumed from {ckpt_path} at epoch {start_epoch}")

    if multihost:
        from pointcloud_tpu.parallel.distributed import global_mesh

        assert batch_size % jax.device_count() == 0, (
            f"global batch {batch_size} must divide the "
            f"{jax.device_count()} global devices"
        )
        mesh = global_mesh(("data",))
    else:
        mesh = data_mesh(batch_size) if data_parallel else None
    if mesh is not None:
        params = replicate(mesh, params)
        batch_stats = replicate(mesh, batch_stats)
        opt_state = replicate(mesh, opt_state)

    if mesh is None:
        put_batch = lambda b: b  # noqa: E731
    elif multihost:
        put_batch = lambda b: shard_batch_global(mesh, b, batch_size)  # noqa: E731
    else:
        put_batch = lambda b: shard_batch(mesh, b)  # noqa: E731

    train_step = make_train_step(spec, tx)
    eval_step = make_eval_step(spec)

    # multihost: only process 0 writes TB logs / checkpoints (the dirs are
    # typically on shared storage; every process still computes everything)
    is_main = jax.process_index() == 0
    writer = _make_writer(run_dir) if is_main else _make_writer(None)
    global_step = start_epoch * max(len(train_loader), 1)
    loss = jnp.float32(float("nan"))  # defined even if no epochs run

    from pointcloud_tpu.utils.profiling import StepTimer, trace

    step_timer = StepTimer(warmup=2)
    profile_ctx = None

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        for x_raw, y_raw in train_loader:
            if profile and global_step == 2:  # skip compile steps
                profile_ctx = trace(os.path.join(run_dir, "profile"))
                profile_ctx.__enter__()
            batch = put_batch((x_raw, y_raw))
            with step_timer:
                params, batch_stats, opt_state, loss, logs = train_step(
                    params, batch_stats, opt_state, *batch
                )
                jax.block_until_ready(loss) if profile else None
            if profile_ctx is not None and global_step == 5:
                profile_ctx.__exit__(None, None, None)
                profile_ctx = None
                print(f"profile trace written to {run_dir}/profile")
            global_step += 1
            # scalar logging every val_every steps (the reference's
            # log_every_n_steps cadence, train.py:198)
            if global_step % cfg.val_every == 0:
                writer.add_scalar("train_loss", float(loss), global_step)
                for k, v in logs.items():
                    writer.add_scalar(k, float(v), global_step)
        dt = time.time() - t0

        # validation every epoch (Lightning default in the reference)
        val_losses = []
        for bi, (x_raw, y_raw) in enumerate(val_loader):
            batch = put_batch((x_raw, y_raw))
            vloss, vlogs, out = eval_step(params, batch_stats, *batch)
            val_losses.append(float(vloss))
            if bi == 0 and log_meshes and spec.model_type == "Autoencoder":
                _log_mesh(writer, out, batch[1], global_step)
        if val_losses:
            writer.add_scalar("val_loss", float(np.mean(val_losses)), global_step)
        n_steps = max(len(train_loader), 1)
        print(
            f"epoch {epoch}: train_loss={float(loss):.6f} "
            f"val_loss={np.mean(val_losses) if val_losses else float('nan'):.6f} "
            f"({dt:.1f}s, {dt / n_steps * 1e3:.1f} ms/step wall, "
            f"{n_steps * batch_size / dt:,.0f} clouds/s; "
            f"dispatch {step_timer.summary(batch_size, 'clouds')})"
        )

        # checkpoint: snapshot on-device, transfer+write in the background
        # (the off-device transfer would otherwise stall the loop ~90 s per
        # save over the tunnel); throttled to every cfg.ckpt_every epochs
        # (+ always the final one)
        if is_main and (epoch % cfg.ckpt_every == 0 or epoch == epochs - 1):
            save_checkpoint_async(
                ckpt_dir,
                epoch,
                {
                    "params": params,
                    "batch_stats": batch_stats,
                    "opt_state_leaves": {
                        str(i): leaf
                        for i, leaf in enumerate(
                            jax.tree_util.tree_leaves(opt_state)
                        )
                    },
                    "epoch": np.asarray(epoch),
                },
            )

    wait_for_checkpoints()
    writer.close()
    return float(loss), ckpt_dir


def _stack_peek(ds, n):
    xs, ys = [], []
    for i in range(n):
        x, y = ds[i]
        xs.append(x)
        ys.append(y)
    if isinstance(ys[0], dict):
        y = {k: np.stack([s[k] for s in ys]) for k in ys[0]}
    else:
        y = np.stack(ys)
    return np.stack(xs), y


def _make_writer(run_dir):
    try:
        if run_dir is None:  # non-main multihost process
            raise ImportError
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(run_dir)
    except Exception:

        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def add_mesh(self, *a, **k):
                pass

            def close(self):
                pass

        return _Null()


def _log_mesh(writer, prediction, target, step):
    """Predicted vs GT sample cloud to TensorBoard (train.py:43-53)."""
    try:
        import torch

        pred = np.asarray(prediction)[0]
        gt = np.asarray(target)[0]
        pc = torch.from_numpy(np.stack([pred[:, :3], gt[:, :3]]))
        col = torch.from_numpy(
            np.clip(np.stack([pred[:, 3:6], gt[:, 3:6]]), 0, 1) * 255
        )
        writer.add_mesh("Point Cloud", vertices=pc, colors=col, global_step=step)
    except Exception:
        pass
