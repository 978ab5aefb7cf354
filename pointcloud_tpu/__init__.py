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

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache (opt-out: PCTPU_NO_COMPILE_CACHE).

    The fused-chain kernels compile in minutes on a remote TPU; the
    persistent cache (keyed by HLO hash, so always safe across code edits)
    makes every repeat run — tests, benchmarks, the driver's bench.py —
    near-instant. Verified working through the axon remote backend.
    """
    if _os.environ.get("PCTPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/jax_comp"),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass


_enable_compile_cache()

from pointcloud_tpu import cfg  # noqa: F401, E402


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
