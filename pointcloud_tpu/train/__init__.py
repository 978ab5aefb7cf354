"""Training runtime: model wiring, jitted steps, checkpointing, logging."""

from pointcloud_tpu.train.harness import (
    TrainSpec,
    create_model,
    train,
)

__all__ = ["TrainSpec", "create_model", "train"]
