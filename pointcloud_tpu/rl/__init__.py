"""In-repo RL (reference: rl/ — ReplayBuffer, DDPG, HER, TQC hyperparams).

JAX/Flax implementations with jitted update steps; agents consume the
GoalEnv dict observation {'observation', 'achieved_goal', 'desired_goal'}.
"""

from pointcloud_tpu.rl.buffers import ReplayBuffer, her_sample
from pointcloud_tpu.rl.core import MLPActorCritic
from pointcloud_tpu.rl.ddpg import ddpg, her
from pointcloud_tpu.rl.tqc import TQC, tqc

__all__ = [
    "ReplayBuffer",
    "her_sample",
    "MLPActorCritic",
    "ddpg",
    "her",
    "TQC",
    "tqc",
]
