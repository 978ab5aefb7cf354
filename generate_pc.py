#!/usr/bin/env python
"""Generate point-cloud training data (reference generate_pc.py:103-115).

Two backends:
  --synthetic      kinematic SyntheticScene (no robosuite needed)
  (default)        a registered vision gym env rolled with random actions
                   (requires robosuite; reference behavior)

Writes one .npz per frame with the reference contract: points / rgb /
segmentation / boundingbox / ground_truth / classes.
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="Generate point cloud dataset")
    parser.add_argument("--dir", type=str, required=True, help="output directory")
    parser.add_argument("--env", type=str, default="RoboPush-v0")
    parser.add_argument("--scene", type=str, default="Cube",
                        help="scene name for --synthetic")
    parser.add_argument("--synthetic", action="store_true",
                        help="use the robosuite-free synthetic backend")
    parser.add_argument("--horizon", type=int, default=50, help="frames per run")
    parser.add_argument("--runs", type=int, default=4)
    parser.add_argument("--actions_per_frame", type=int, default=1)
    parser.add_argument("--action_scale", type=float, default=1.0)
    parser.add_argument("--steps_per_action", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--val_split", type=float, default=0.0,
                        help="if >0, also write a val/ split alongside train/")
    a = parser.parse_args()

    frames = a.horizon * a.runs
    if a.synthetic:
        from pointcloud_tpu.envs.synthetic import generate_dataset

        if a.val_split > 0:
            n_val = max(1, int(frames * a.val_split))
            generate_dataset(os.path.join(a.dir, "train"), scene=a.scene,
                             frames=frames - n_val, seed=a.seed)
            generate_dataset(os.path.join(a.dir, "val"), scene=a.scene,
                             frames=n_val, seed=a.seed + 10_000)
        else:
            generate_dataset(a.dir, scene=a.scene, frames=frames, seed=a.seed)
        print(f"wrote {frames} synthetic frames to {a.dir}")
    else:
        from pointcloud_tpu.data.generate import generate_pc

        generate_pc(
            a.dir,
            a.env,
            horizon=a.horizon,
            runs=a.runs,
            actions_per_frame=a.actions_per_frame,
            action_scale=a.action_scale,
            steps_per_action=a.steps_per_action,
        )


if __name__ == "__main__":
    main()
