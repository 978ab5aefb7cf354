#!/usr/bin/env python
"""Train a vision model (CLI mirror of reference pointcloud_vision/train.py:210-226).

Usage: python train.py <scene> <model> [--backbone PointNet2] [--epochs N]
       [--batch_size N] [--ckpt path] [--scene_dir dir] [--loss chamfer|emd]
"""

import argparse
import sys

# --multihost must call jax.distributed.initialize() before anything
# initializes the XLA backend — including importing pointcloud_tpu (env
# registration touches the backend), so peek at argv before importing.
if "--multihost" in sys.argv:
    import importlib.util as _ilu
    import os as _os

    _spec = _ilu.spec_from_file_location(
        "_dist", _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                               "pointcloud_tpu", "parallel", "distributed.py")
    )
    _dist = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_dist)
    print(f"multihost: joined={_dist.initialize()}")

from pointcloud_tpu import cfg
from pointcloud_tpu.train import train


def main():
    parser = argparse.ArgumentParser(description="Train or evaluate a vision module")
    parser.add_argument("scene", type=str)
    parser.add_argument("model", choices=cfg.models)
    parser.add_argument("--scene_dir", default=None, type=str,
                        help="dataset dir name under input/ (defaults to scene)")
    parser.add_argument("--backbone", choices=cfg.encoder_backbones, default="PointNet2")
    parser.add_argument("--batch_size", default=cfg.vision_batch_size, type=int)
    parser.add_argument("--epochs", default=cfg.vision_epochs, type=int)
    parser.add_argument("--ckpt", default=None, type=str,
                        help="checkpoint to resume from")
    parser.add_argument("--loss", default=None, choices=[None, "chamfer", "emd"],
                        help="override the model-type default loss")
    parser.add_argument("--input_root", default="input", type=str)
    parser.add_argument("--output_root", default="output", type=str)
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler device trace of steps 2-5")
    parser.add_argument("--multihost", action="store_true",
                        help="join the jax.distributed runtime (coordinator "
                             "from JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES"
                             " / JAX_PROCESS_ID env vars or cloud "
                             "auto-detection) and train data-parallel over "
                             "every host's devices; batch_size is global")
    a = parser.parse_args()

    import jax

    print(f"devices = {jax.devices()}")
    train(
        a.model,
        a.backbone,
        scene=a.scene,
        epochs=a.epochs,
        batch_size=a.batch_size,
        ckpt_path=a.ckpt,
        dataset_dir=a.scene_dir,
        input_root=a.input_root,
        output_root=a.output_root,
        loss_override=a.loss,
        profile=a.profile,
        multihost=a.multihost,
    )


if __name__ == "__main__":
    main()
