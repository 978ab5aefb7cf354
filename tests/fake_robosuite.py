"""A minimal fake of the robosuite 1.4 API surface RobosuiteBackend touches.

Purpose: contract-test the robosuite execution path (env construction,
controller config resolution, camera kwargs, CameraMover poses, observation
keys/shapes/orientations, depth capture -> multiview unprojection) on
machines without robosuite/MuJoCo. Shapes and conventions recorded from
robosuite 1.4:

  * obs[f"{cam}_image"]          (H, W, 3) uint8, BOTTOM-UP row order
  * obs[f"{cam}_depth"]          (H, W, 1) float32 normalized, bottom-up
  * obs[f"{cam}_segmentation_instance"] (H, W, 1) int32, bottom-up
  * get_real_depth_map(sim, d)   normalized -> metric depth
  * get_camera_transform_matrix  (4, 4) world -> pixel
  * env.action_spec              (low, high) float arrays
  * suite.make only renders cameras passed via camera_names/... kwargs

Install with `install(monkeypatch)`; every fake records its inputs on the
module-level `calls` dict so tests can assert the contract.
"""

from __future__ import annotations

import sys
import types

import numpy as np

from pointcloud_tpu.envs.camera import camera_matrix, extrinsics, make_intrinsics

calls: dict = {}

# normalized-depth encoding used by the fake (robosuite uses the MuJoCo
# near/far mapping; any invertible map works for the contract)
_FAR = 10.0
_PLANE_DEPTH = 2.0  # every pixel sits 2 m in front of the camera


class FakeJointData:
    def __init__(self):
        self.qpos = {"cube_joint0": np.zeros(7, dtype=np.float64)}

    def get_joint_qpos(self, joint):
        return self.qpos[joint]

    def set_joint_qpos(self, joint, val):
        self.qpos[joint] = np.asarray(val, dtype=np.float64)


class FakeSim:
    def __init__(self):
        self.data = FakeJointData()
        self._state = 0
        self.forward_calls = 0

    def get_state(self):
        return ("fake-state", self._state)

    def set_state(self, s):
        self._state = s[1]

    def forward(self):
        self.forward_calls += 1


class FakeEnv:
    def __init__(self, **kwargs):
        calls["make_kwargs"] = dict(kwargs)
        self.sim = FakeSim()
        self.camera_names = list(kwargs.get("camera_names", []))
        self.W = int(kwargs.get("camera_widths", 256))
        self.H = int(kwargs.get("camera_heights", 256))
        self.depth = bool(kwargs.get("camera_depths", False))
        self.seg = kwargs.get("camera_segmentations", None)
        self.horizon = int(kwargs.get("horizon", 500))
        self.timestep = 0
        self.closed = False

    @property
    def action_spec(self):
        return -np.ones(7, dtype=np.float64), np.ones(7, dtype=np.float64)

    def _obs(self):
        obs = {"robot0_eef_pos": np.array([0.1, 0.0, 1.0], dtype=np.float64)}
        for cam in self.camera_names:
            # serve everything bottom-up, as robosuite does; the backend
            # must flip with [::-1]
            img = np.zeros((self.H, self.W, 3), dtype=np.uint8)
            img[:, :, 0] = 200  # constant red-ish
            obs[f"{cam}_image"] = img[::-1]
            if self.depth:
                norm = np.full(
                    (self.H, self.W, 1), _PLANE_DEPTH / _FAR, dtype=np.float32
                )
                obs[f"{cam}_depth"] = norm[::-1]
            if self.seg:
                seg = np.ones((self.H, self.W, 1), dtype=np.int32)
                obs[f"{cam}_segmentation_instance"] = seg[::-1]
        return obs

    def reset(self):
        self.timestep = 0
        return self._obs()

    def step(self, action):
        calls.setdefault("actions", []).append(np.asarray(action))
        self.timestep += 1
        return self._obs(), 0.0, False, {}

    def _get_observations(self, force_update=False):
        calls["last_force_update"] = force_update
        return self._obs()

    def observation_spec(self):
        return self._obs()

    def clear_objects(self, name):
        calls.setdefault("cleared", []).append(name)

    def close(self):
        self.closed = True


class FakeCameraMover:
    def __init__(self, env, camera):
        self.env = env
        self.camera = camera
        calls.setdefault("movers", []).append(camera)

    def set_camera_pose(self, pos, quat):
        calls.setdefault("poses", {})[self.camera] = (
            np.asarray(pos),
            np.asarray(quat),
        )


def _get_camera_transform_matrix(sim, camera_name, camera_height, camera_width):
    pose = calls.get("poses", {}).get(camera_name)
    if pose is None:  # un-moved camera: default pose at origin
        pos, quat = np.zeros(3), np.array([1.0, 0, 0, 0])
    else:
        pos, quat = pose
    K = make_intrinsics(np.deg2rad(45.0), camera_height, camera_width)
    return camera_matrix(K, extrinsics(pos, quat))


def _get_real_depth_map(sim, depth_map):
    return np.asarray(depth_map) * _FAR


def _load_controller_config(default_controller=None):
    calls["controller"] = default_controller
    return {"type": default_controller, "control_delta": True}


def install(monkeypatch):
    """Install the fake module tree into sys.modules (pytest monkeypatch
    handles removal)."""
    calls.clear()
    root = types.ModuleType("robosuite")
    root.make = lambda **kw: FakeEnv(**kw)
    utils = types.ModuleType("robosuite.utils")
    cam_utils = types.ModuleType("robosuite.utils.camera_utils")
    cam_utils.CameraMover = FakeCameraMover
    cam_utils.get_camera_transform_matrix = _get_camera_transform_matrix
    cam_utils.get_real_depth_map = _get_real_depth_map
    controllers = types.ModuleType("robosuite.controllers")
    controllers.load_controller_config = _load_controller_config
    root.utils = utils
    utils.camera_utils = cam_utils
    root.controllers = controllers
    for name, mod in [
        ("robosuite", root),
        ("robosuite.utils", utils),
        ("robosuite.utils.camera_utils", cam_utils),
        ("robosuite.controllers", controllers),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    return root
