#!/usr/bin/env python
"""Train an RL agent on a registered GoalEnv (reference: readme.md:79-94
drives rl_zoo3 TQC with rl/tqc.yml; this CLI runs the in-repo JAX TQC/DDPG
with the same hyperparameter file).

Usage: python train_rl.py RoboReach-v0 [--algo tqc|ddpg|her]
       [--epochs N] [--steps-per-epoch N] [--save policy.pkl]
"""

import argparse

import pointcloud_tpu  # noqa: F401  (registers envs)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("env", type=str)
    parser.add_argument("--algo", default="tqc", choices=["tqc", "ddpg", "her"])
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--steps-per-epoch", type=int, default=4000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--save", default=None, type=str)
    parser.add_argument("--conf", default=None, type=str, help="tqc.yml path")
    parser.add_argument(
        "--n-envs", default=None, type=int,
        help="parallel collection envs (tqc only; default from tqc.yml)",
    )
    a = parser.parse_args()

    import functools

    from pointcloud_tpu.rl.vec_env import make_env

    # picklable under the subproc vec-env's 'spawn' context
    env_fn = functools.partial(make_env, a.env, max_episode_steps=50)

    if a.algo == "tqc":
        from pointcloud_tpu.rl.config import load_yaml_config
        from pointcloud_tpu.rl.tqc import tqc

        try:
            cfg = load_yaml_config(a.env, a.conf)
        except Exception:
            cfg = {}
        cfg.pop("total_timesteps", None)
        if a.n_envs is not None:
            cfg["n_envs"] = a.n_envs
        policy, history = tqc(
            env_fn,
            epochs=a.epochs,
            steps_per_epoch=a.steps_per_epoch,
            seed=a.seed,
            save_path=a.save,
            **cfg,
        )
        print("final success rate:", history[-1] if history else None)
    else:
        from pointcloud_tpu.rl.ddpg import ddpg

        _, history = ddpg(
            env_fn,
            epochs=a.epochs,
            steps_per_epoch=a.steps_per_epoch,
            seed=a.seed,
            use_her=(a.algo == "her"),
            save_path=a.save,
        )
        print("final success rate:", history[-1] if history else None)


if __name__ == "__main__":
    main()
