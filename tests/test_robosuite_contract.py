"""Contract tests for the robosuite execution path, without robosuite.

These drive RobosuiteBackend against tests/fake_robosuite.py (an API fake
with robosuite 1.4's recorded shapes/conventions) so silent drift in the
kwargs, observation keys, image orientation, or depth plumbing fails here
instead of on a robot machine. Also covers the sb3 TQC zip policy loader
against a hand-constructed sb3-format fixture (reference artifacts:
rl/export_policy.py, readme.md:79-94).
"""

import io
import json
import zipfile

import numpy as np
import pytest

from tests import fake_robosuite


@pytest.fixture
def backend(monkeypatch):
    fake_robosuite.install(monkeypatch)
    from pointcloud_tpu.envs.backends import RobosuiteBackend
    from pointcloud_tpu.envs.scenes import cfg_scene, robo_kwargs

    sc = cfg_scene["Cube"]
    b = RobosuiteBackend(
        robo_kwargs["Cube"]
        | {"camera_depths": True, "camera_segmentations": "instance"},
        cameras=list(sc["cameras"]),
        camera_poses=list(sc["cameras"].values()),
        camera_size=(64, 32),  # W, H — asymmetric to catch axis swaps
    )
    yield b
    b.close()


def test_make_receives_camera_and_controller_kwargs(backend):
    kw = fake_robosuite.calls["make_kwargs"]
    # robosuite only renders cameras named at make() time (ref base_env.py:52-54)
    assert kw["camera_names"] == ["frontview", "agentview", "birdview"]
    assert kw["camera_widths"] == 64 and kw["camera_heights"] == 32
    assert kw["hard_reset"] is False
    assert kw["env_name"] == "Lift" and kw["robots"] == "Panda"
    # 'controller' shorthand resolved through load_controller_config
    assert "controller" not in kw
    assert kw["controller_configs"]["type"] == "OSC_POSITION"
    assert fake_robosuite.calls["controller"] == "OSC_POSITION"


def test_reset_applies_camera_poses_and_observes(backend):
    state = backend.reset()
    # all three scene cameras got movers + the cfg poses
    assert fake_robosuite.calls["movers"] == ["frontview", "agentview", "birdview"]
    poses = fake_robosuite.calls["poses"]
    np.testing.assert_allclose(poses["frontview"][0], [1.5, 0, 1])
    # reset fetches observations with force_update after re-enabling rendering
    assert fake_robosuite.calls["last_force_update"] is True
    assert state["frontview_image"].shape == (32, 64, 3)
    assert state["frontview_depth"].shape == (32, 64, 1)


def test_step_and_snapshot_roundtrip(backend):
    backend.reset()
    t0 = backend.timestep
    backend.step(np.zeros(7))
    assert backend.timestep == t0 + 1
    snap = backend.snapshot()
    backend.restore(snap)
    backend.forward()
    backend.set_object_pos("cube_joint0", [0.2, 0.1, 0.9])
    qpos = backend.env.sim.data.get_joint_qpos("cube_joint0")
    np.testing.assert_allclose(qpos[:3], [0.2, 0.1, 0.9])
    backend.clear_object("cube")
    assert fake_robosuite.calls["cleared"] == ["cube"]


def test_capture_pointcloud_unprojects_the_depth_maps(backend):
    """Fused cloud has one point per pixel per camera; re-projecting each
    camera's slice through its own matrix recovers the served plane depth
    (the fake serves a constant 2 m plane, bottom-up like robosuite)."""
    import jax.numpy as jnp

    from pointcloud_tpu.envs.camera import project

    backend.reset()
    pts, feats = backend.capture_pointcloud(features=("rgb", "segmentation"))
    H, W, C = 32, 64, 3
    n_cam = 3
    assert pts.shape == (n_cam * H * W, 3)
    assert feats["rgb"].shape == (n_cam * H * W, 3)
    assert feats["segmentation"].shape == (n_cam * H * W, 1)
    # rgb was divided by 255 (uint8 -> [0,1]) — constant 200-red fake image
    np.testing.assert_allclose(feats["rgb"][:, 0], 200 / 255.0, atol=1e-6)
    from robosuite.utils.camera_utils import get_camera_transform_matrix

    for i, cam in enumerate(backend.cameras):
        cam_mat = get_camera_transform_matrix(None, cam, H, W)
        chunk = pts[i * H * W : (i + 1) * H * W]
        _, depth = project(jnp.asarray(chunk), jnp.asarray(cam_mat))
        np.testing.assert_allclose(np.asarray(depth), 2.0, atol=1e-3)


def test_robosuite_goal_env_constructs_through_fake(monkeypatch):
    """End-to-end: gym-level env construction routes through the robosuite
    backend when robosuite imports, and the GoalEnv API works on it."""
    fake_robosuite.install(monkeypatch)
    import gymnasium as gym

    env = gym.make("RoboReach-v0").unwrapped
    obs, info = env.reset(seed=0)
    assert set(obs) == {"observation", "achieved_goal", "desired_goal"}
    obs2, reward, term, trunc, info2 = env.step(np.zeros(7, np.float32))
    assert reward in (-1, 0)
    env.close()


########## sb3 TQC zip fixture ##########


def _make_sb3_zip(tmp_path, obs_dim=6, act_dim=4, hidden=(8, 8), seed=0):
    """Hand-construct an sb3-format save: a zip holding policy.pth (torch
    state_dict with sb3_contrib TQC's actor key layout) + metadata files."""
    import torch

    rng = np.random.default_rng(seed)
    sd = {}
    dims = [obs_dim, *hidden]
    for li, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        sd[f"actor.latent_pi.{2 * li}.weight"] = torch.tensor(
            rng.normal(0, 0.3, (b, a)).astype(np.float32)
        )
        sd[f"actor.latent_pi.{2 * li}.bias"] = torch.tensor(
            rng.normal(0, 0.1, b).astype(np.float32)
        )
    sd["actor.mu.weight"] = torch.tensor(
        rng.normal(0, 0.3, (act_dim, dims[-1])).astype(np.float32)
    )
    sd["actor.mu.bias"] = torch.tensor(
        rng.normal(0, 0.1, act_dim).astype(np.float32)
    )
    sd["actor.log_std.weight"] = torch.tensor(
        np.zeros((act_dim, dims[-1]), np.float32)
    )
    # critic tensors present too, as in real saves — the loader must skip them
    sd["critic.qf0.0.weight"] = torch.tensor(np.zeros((8, obs_dim), np.float32))

    buf = io.BytesIO()
    torch.save(sd, buf)
    path = tmp_path / "RoboReach-v0.zip"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("policy.pth", buf.getvalue())
        z.writestr("data", json.dumps({"policy_class": "MultiInputPolicy"}))
        z.writestr("_stable_baselines3_version", "2.1.0")
    return str(path), sd


def test_sb3_zip_policy_loads_and_predicts(tmp_path):
    from pointcloud_tpu.rl.policy import load_policy

    path, sd = _make_sb3_zip(tmp_path)
    pol = load_policy(path)
    obs = {
        "achieved_goal": np.ones(1, np.float32),
        "desired_goal": np.full(2, 0.5, np.float32),
        "observation": np.arange(3, dtype=np.float32) / 3,
    }
    act, state = pol.predict(obs, deterministic=True)
    assert act.shape == (4,)
    assert np.all(np.abs(act) <= 1.0)  # tanh-squashed

    # oracle forward: sorted-key concat (gym.spaces.Dict order) -> MLP -> tanh
    x = np.concatenate([obs[k].reshape(-1) for k in sorted(obs)])
    for li in range(2):
        W = sd[f"actor.latent_pi.{2 * li}.weight"].numpy()
        b = sd[f"actor.latent_pi.{2 * li}.bias"].numpy()
        x = np.maximum(W @ x + b, 0)
    want = np.tanh(sd["actor.mu.weight"].numpy() @ x + sd["actor.mu.bias"].numpy())
    np.testing.assert_allclose(act, want, atol=1e-6)


def test_sb3_zip_rejects_non_sb3_archives(tmp_path):
    from pointcloud_tpu.rl.policy import Sb3TqcPolicy

    path = tmp_path / "not_sb3.zip"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("something_else.txt", "hi")
    with pytest.raises(ValueError, match="policy.pth"):
        Sb3TqcPolicy.load(str(path))
