"""pointcloud_tpu — a TPU-native (JAX/XLA/Pallas) point-cloud vision framework.

A ground-up rebuild of the capabilities of JoongWonSeo/pointcloud
(`pointcloud_vision` + `robosuite_envs` + `rl/`), designed TPU-first:

- fixed-shape, mask-based point-cloud ops (no ragged tensors, no atomics)
- Pallas kernels for the hot paths (pairwise distance / FPS / Sinkhorn-EMD)
- Flax models (PointNet / PointNet++ / PointMLP backbones, AE/Seg/GT heads)
- jit-compiled training with data-parallel sharding over a device mesh
- orbax checkpointing with versioned run directories + sidecar metadata
- the same Sensor -> ObservationEncoder -> GoalEnv plug-in API so RL loops
  (reference: robosuite_envs/base_env.py) carry over unchanged.

Vision gym environments are registered lazily on import when gymnasium is
available (reference: pointcloud_vision/__init__.py:7-151).
"""

__version__ = "0.1.0"

from pointcloud_tpu import cfg  # noqa: F401


def register_envs():
    """Register ground-truth + vision gym environments (idempotent).

    Mirrors the gymnasium.register calls in robosuite_envs/__init__.py:6-28
    and pointcloud_vision/__init__.py:7-151 of the reference.
    """
    from pointcloud_tpu.envs import registration

    registration.register_all()


try:  # registration is best-effort: gymnasium is an optional dependency
    register_envs()
except Exception:  # pragma: no cover - only hit when gymnasium is missing
    pass
