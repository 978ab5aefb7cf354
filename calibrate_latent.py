#!/usr/bin/env python
"""CLI for latent-threshold calibration
(reference: calibrate_latent.py:123-170).

Usage: python calibrate_latent.py VisionReach-v0 path/to/policy.pkl
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("vision_task", type=str)
    parser.add_argument("policy_dir", type=str)
    parser.add_argument("--horizon", type=int, default=50)
    parser.add_argument("--runs", type=int, default=100)
    parser.add_argument("--threshold_strictness", type=float, default=0.3)
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--no_save", action="store_true")
    parser.add_argument("--show_distribution", action="store_true",
                        help="plot per-dim histograms of the latent distances")
    a = parser.parse_args()

    from pointcloud_tpu.train.calibrate import latent_distributions

    threshold, before, during = latent_distributions(
        a.vision_task,
        a.policy_dir,
        horizon=a.horizon,
        runs=a.runs,
        threshold_strictness=a.threshold_strictness,
        render=a.render,
        show_progress=True,
        save=not a.no_save,
    )
    print("threshold =", threshold)

    if a.show_distribution and threshold is not None:
        import matplotlib.pyplot as plt

        dims = threshold.shape[0]
        fig, axes = plt.subplots(1, dims, figsize=(3 * dims, 3), squeeze=False)
        for d in range(dims):
            ax = axes[0, d]
            ax.hist(before[:, d], bins=20, alpha=0.5, label="before success")
            ax.hist(during[:, d], bins=20, alpha=0.5, label="during success")
            ax.axvline(threshold[d], color="k", linestyle="--")
            ax.set_title(f"dim {d}")
        axes[0, 0].legend()
        plt.tight_layout()
        plt.show()


if __name__ == "__main__":
    main()
