"""Gym env registration (reference: robosuite_envs/__init__.py:6-28 +
pointcloud_vision/__init__.py:7-151).

4 ground-truth envs (Passthrough pair) + 12 vision envs pairing
PointCloudSensor with concrete encoders. Idempotent.
"""

from __future__ import annotations

_registered = False


def register_all():
    global _registered
    if _registered:
        return
    from gymnasium.envs.registration import register, registry

    from pointcloud_tpu.envs.envs import (
        RoboPegInHole,
        RoboPickAndPlace,
        RoboPush,
        RoboReach,
    )

    def reg(id, entry_point, **kwargs):
        if id in registry:
            return
        register(id=id, entry_point=entry_point, max_episode_steps=50, **kwargs)

    # ground-truth envs (robosuite_envs/__init__.py:6-28)
    reg("RoboReach-v0", RoboReach)
    reg("RoboPush-v0", RoboPush)
    reg("RoboPickAndPlace-v0", RoboPickAndPlace)
    reg("RoboPegInHole-v0", RoboPegInHole)

    # vision envs (pointcloud_vision/__init__.py:7-151); encoder classes are
    # imported lazily so env construction, not registration, requires
    # trained checkpoints.
    from pointcloud_tpu.vision.pc_encoder import (
        GlobalAEEncoder,
        GlobalSegmenterEncoder,
        MultiSegmenterEncoder,
        StatePredictor,
    )
    from pointcloud_tpu.vision.pc_sensor import PointCloudSensor

    vision = {
        "VisionReach-v0": (RoboReach, GlobalAEEncoder, {}),
        "VisionReachMultiSeg-v0": (
            RoboReach,
            MultiSegmenterEncoder,
            {"simulate_goal": True},
        ),
        "VisionPush-v0": (RoboPush, MultiSegmenterEncoder, {}),
        "VisionPushSeg-v0": (RoboPush, GlobalSegmenterEncoder, {}),
        "VisionPushMultiSeg-v0": (RoboPush, MultiSegmenterEncoder, {}),
        "VisionPushGT-v0": (RoboPush, StatePredictor, {}),
        "VisionPickAndPlace-v0": (RoboPickAndPlace, StatePredictor, {}),
        "VisionPickAndPlaceSeg-v0": (
            RoboPickAndPlace,
            GlobalSegmenterEncoder,
            {"simulate_goal": False},
        ),
        "VisionPickAndPlaceMultiSeg-v0": (RoboPickAndPlace, MultiSegmenterEncoder, {}),
        "VisionPickAndPlaceGT-v0": (RoboPickAndPlace, StatePredictor, {}),
        "VisionPegInHole-v0": (RoboPegInHole, StatePredictor, {}),
        "VisionPegInHoleMultiSeg-v0": (RoboPegInHole, MultiSegmenterEncoder, {}),
    }
    for env_id, (task, encoder, extra) in vision.items():
        reg(
            env_id,
            task,
            kwargs={"sensor": PointCloudSensor, "encoder": encoder, **extra},
        )

    _registered = True
