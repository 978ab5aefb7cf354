"""Global configuration (reference: pointcloud_vision/cfg.py:1-41).

The reference keeps a module of mutable globals; we keep the same ergonomic
surface (importable module attributes, mutable by CLIs) but add a typed
dataclass view so library code can take an explicit config object.

Machine-specific things (paths, dataset dirs) stay CLI arguments.
"""

from __future__ import annotations

import dataclasses
import os

########## General Settings ##########

# JAX platform is auto-selected; these knobs only pick numerics/precision.
# 'bf16-mixed': params/BN-stats fp32, activations + matmul compute bf16 on
# accelerators (TPU MXU-native; the analog of the reference's '16-mixed',
# cfg.py:13). 'fp32' forces full precision everywhere.
precision = "bf16-mixed"


def compute_dtype():
    """Model activation dtype implied by `precision`.

    Returns jnp.bfloat16 on TPU under 'bf16-mixed' (halves the HBM traffic
    that dominates BN-heavy stacks: PointNet AE train step 126 -> 82 ms at
    B=256), or None (fp32 flax default) on CPU — where bf16 is emulated and
    parity tests expect exact fp32 numerics.
    """
    import jax
    import jax.numpy as jnp

    if precision == "bf16-mixed" and jax.default_backend() in ("tpu", "axon"):
        return jnp.bfloat16
    return None

# More verbose output and sanity checks (performance impact) — cfg.py:16.
debug = bool(int(os.environ.get("PCTPU_DEBUG", "0")))

########## Vision: Model and Training Settings ##########

models = ["Autoencoder", "Segmenter", "MultiSegmenter", "StatePredictor"]
encoder_backbones = ["PointNet", "PointNet2", "PointMLP", "PointMLPE"]

vision_batch_size = 25  # cfg.py:28
vision_epochs = 100  # cfg.py:29
vision_lr = 1e-3  # default for Adam, cfg.py:30
val_every = 4  # validation every n epochs, cfg.py:32
ckpt_every = 10  # checkpoint every n epochs (plus the final epoch)

# Host-side data pipeline prefetch depth (replaces DataLoader workers,
# cfg.py:26 — TPU input pipelines prefetch into device memory instead).
prefetch_batches = 2
loader_threads = 6
# Use the native C++ threaded npz loader (native/pcloader.cpp) when its
# shared library is available and the dataset qualifies.
use_native_loader = True

# Earth Mover's Distance operating points (cfg.py:36-41).
emd_eps = 0.005
emd_iterations = 50
# Reference test operating point (kept for parity experiments; ~77 s/batch-25
# even with the fused kernel — impractical as an eval default).
emd_test_eps = 0.002
emd_test_iterations = 10000
# Eval default: epsilon-annealed Sinkhorn reaches the test operating point's
# matching quality (>=90% assignment agreement, tests/test_emd.py) in ~60
# iterations (~0.05 s/batch-25): geometric decay emd_anneal_from -> eps.
emd_eval_eps = 0.002
emd_eval_iterations = 60
emd_anneal_from = 0.1

# EMD backend: 'sinkhorn' (entropic OT, MXU-friendly, default) or 'auction'
# (deterministic reformulation of the reference CUDA kernel, emd_cuda.cu).
emd_method = "sinkhorn"


@dataclasses.dataclass
class TrainConfig:
    """Typed view of the training knobs for library code."""

    batch_size: int = vision_batch_size
    epochs: int = vision_epochs
    lr: float = vision_lr
    val_every: int = val_every
    precision: str = precision
    seed: int = 0

    @classmethod
    def from_globals(cls) -> "TrainConfig":
        return cls(
            batch_size=vision_batch_size,
            epochs=vision_epochs,
            lr=vision_lr,
            val_every=val_every,
            precision=precision,
        )
