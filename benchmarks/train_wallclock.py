#!/usr/bin/env python
"""Training wall-clock benchmark vs the reference's published numbers
(BASELINE.md: AE training, Chamfer 2-5 min / EMD ~30 min per run on the
author's CUDA GPU).

Trains the reference configuration — Autoencoder, 2048-point clouds,
batch 25 (cfg.py:28), Adam 1e-3 — for a fixed number of epochs on a
generated dataset and reports wall-clock + losses. Results are recorded in
benchmarks/RESULTS.md.

Usage:
  python benchmarks/train_wallclock.py --input_root /tmp/bench_input \
      --epochs 100 --loss chamfer
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_root", required=True)
    p.add_argument("--scene", default="Cube")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=25)
    p.add_argument("--loss", default="chamfer", choices=["chamfer", "emd"])
    p.add_argument("--backbone", default="PointNet")
    p.add_argument("--output_root", default="/tmp/bench_output")
    p.add_argument("--ckpt_every", type=int, default=None,
                   help="override cfg.ckpt_every (checkpoint transfers are "
                        "slow through a remote-TPU tunnel)")
    a = p.parse_args()

    import jax

    from pointcloud_tpu import cfg
    from pointcloud_tpu.train import train

    if a.ckpt_every is not None:
        cfg.ckpt_every = a.ckpt_every

    print("devices:", jax.devices())
    t0 = time.time()
    loss, ckpt_dir = train(
        "Autoencoder",
        a.backbone,
        scene=a.scene,
        epochs=a.epochs,
        batch_size=a.batch_size,
        input_root=a.input_root,
        output_root=a.output_root,
        loss_override=None if a.loss == "emd" else a.loss,
        log_meshes=False,
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "config": f"Autoencoder_{a.backbone} {a.loss}",
                "epochs": a.epochs,
                "batch_size": a.batch_size,
                "final_train_loss": loss,
                "wall_clock_s": round(wall, 1),
                "wall_clock_min": round(wall / 60, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
