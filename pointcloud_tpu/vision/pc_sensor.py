"""Point-cloud sensor (reference: pointcloud_vision/pc_sensor.py:10-43).

Fuses the backend's multi-camera 2.5D observation into a preprocessed cloud:
FilterBBox to the scene bbox, then FPS/RS downsample to the scene's point
budget. The whole chain runs as ONE jitted XLA program per (bbox, K, sampler)
configuration — this is the per-env-step hot path (SURVEY.md §3.2).
"""

from __future__ import annotations

import functools

import numpy as np

from pointcloud_tpu.envs.sensors import Sensor


@functools.lru_cache(maxsize=16)
def _jitted_preprocess(bbox_key, K: int, sampler: str | None, n_features: int):
    import jax

    from pointcloud_tpu.transforms import (
        Compose,
        FilterBBox,
        SampleFurthestPoints,
        SampleRandomPoints,
    )

    stages = [FilterBBox([list(r) for r in bbox_key])]
    if sampler == "FPS":
        stages.append(SampleFurthestPoints(K))
    elif sampler == "RS":
        stages.append(SampleRandomPoints(K))
    # sampler None: filter only, no downsampling (reference pc_sensor.py:23)
    chain = Compose(stages)

    @jax.jit
    def run(pc, key):
        out, mask = chain(pc, key=key)
        return out, mask

    return run


class PointCloudSensor(Sensor):
    """2.5D observation -> preprocessed point cloud dict compatible with the
    PointCloudDataset save format: 'points' + features ('rgb',
    'segmentation') + 'boundingbox' (reference pc_sensor.py:10-43).

    The original state stays in the observation so GT encoders keep working
    (reference pc_sensor.py:41-43).
    """

    requires_vision = True

    def __init__(self, env, require_segmentation: bool = False):
        super().__init__(env)
        self.features = ["rgb"] + (["segmentation"] if require_segmentation else [])
        self.bbox = np.asarray(env.bbox, dtype=np.float32)
        self.sampler = env.sampler
        self.sample_points = env.sample_points
        self._rng = np.random.default_rng(0)

    @property
    def env_kwargs(self):
        return {
            "camera_depths": True,
            "camera_segmentations": "instance"
            if "segmentation" in self.features
            else None,
        }

    def observe(self, state):
        import jax
        import jax.numpy as jnp

        points, feats = self.env.backend.capture_pointcloud(
            features=tuple(self.features)
        )
        dims = {f: feats[f].shape[-1] for f in self.features}
        pc = np.concatenate([points] + [feats[f] for f in self.features], axis=1)

        bbox_key = tuple(tuple(float(v) for v in row) for row in self.bbox)
        run = _jitted_preprocess(
            bbox_key, self.sample_points, self.sampler, pc.shape[-1] - 3
        )
        key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31)))
        out, _ = run(jnp.asarray(pc, dtype=jnp.float32), key)
        out = np.asarray(out)

        result = dict(state)
        result["points"] = out[:, :3]
        off = 3
        for f in self.features:
            result[f] = out[:, off : off + dims[f]]
            off += dims[f]
        result["boundingbox"] = self.bbox
        return result
