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
    parser.add_argument("--show_distribution", action="store_true",
                        help="merge all frames into a distribution cloud "
                             "(saved as merged.npz_ignore) + a plot "
                             "(reference generate_pc.py:79-98)")
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

    if a.show_distribution:
        show_distribution(a.dir)


def show_distribution(root: str):
    """Merge every generated frame into one distribution cloud with GT
    markers and plot it (reference generate_pc.py:79-98; the merged cloud is
    saved with an .npz_ignore suffix so datasets skip it)."""
    import glob

    import numpy as np

    files = sorted(glob.glob(os.path.join(root, "**", "*.npz"), recursive=True))
    if not files:
        print("no frames found under", root)
        return
    all_points, all_gt = [], []
    for f in files:
        data = np.load(f, allow_pickle=True)
        pc = np.concatenate([data["points"], data["rgb"]], axis=1)
        all_points.append(pc)
        for name, value in data["ground_truth"]:
            v = np.asarray(value)
            if v.shape == (3,):
                all_gt.append(np.concatenate([v, [1, 0, 0]]))
    merged = np.concatenate(all_points)
    gt = np.asarray(all_gt, dtype=np.float32).reshape(-1, 6)
    print("all points gathered", merged.shape)
    np.savez(os.path.join(root, "merged.npz_tmp"), points=merged, gt=gt)
    os.replace(
        os.path.join(root, "merged.npz_tmp.npz")
        if os.path.exists(os.path.join(root, "merged.npz_tmp.npz"))
        else os.path.join(root, "merged.npz_tmp"),
        os.path.join(root, "merged.npz_ignore"),
    )
    from pointcloud_tpu.viewers.plot import show_clouds

    # subsample for plotting
    rng = np.random.default_rng(0)
    sel = rng.choice(len(merged), size=min(len(merged), 20000), replace=False)
    show_clouds(
        [(merged[sel, :3], merged[sel, 3:6], "distribution"),
         (gt[:, :3], gt[:, 3:6], "ground truth")],
        save=os.path.join(root, "distribution.png"),
        title=f"{root} ({len(files)} frames)",
    )


if __name__ == "__main__":
    main()
