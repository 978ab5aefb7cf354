"""Full vision stack integration: train tiny models -> sensor -> encoder ->
GoalEnv rollout (BASELINE config 5's robosuite-free equivalent)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute end-to-end runs; excluded by -m "not slow"

import pointcloud_tpu.cfg as cfg
from pointcloud_tpu.envs.synthetic import generate_dataset

N_PTS = 128


@pytest.fixture(scope="module")
def trained_root(tmp_path_factory):
    """Train Autoencoder/MultiSegmenter/StatePredictor (PointNet, 2 epochs)
    on tiny synthetic Cube data; returns (input_root, output_root)."""
    from pointcloud_tpu.envs import scenes
    from pointcloud_tpu.train import train

    base = tmp_path_factory.mktemp("vision_stack")
    input_root, output_root = str(base / "input"), str(base / "output")
    d = base / "input" / "Cube"
    generate_dataset(str(d / "train"), scene="Cube", frames=12, seed=0, sample_points=N_PTS)
    generate_dataset(str(d / "val"), scene="Cube", frames=4, seed=9, sample_points=N_PTS)

    orig_scene = scenes.cfg_scene["Cube"]
    orig_iters = cfg.emd_iterations
    scenes.cfg_scene["Cube"] = dict(orig_scene, sample_points=N_PTS)
    cfg.emd_iterations = 5
    try:
        common = dict(
            scene="Cube", epochs=2, batch_size=4, input_root=input_root,
            output_root=output_root, log_meshes=False,
        )
        train("Autoencoder", "PointNet", loss_override="chamfer", **common)
        train("MultiSegmenter", "PointNet", **common)
        train("StatePredictor", "PointNet", **common)
    finally:
        scenes.cfg_scene["Cube"] = orig_scene
        cfg.emd_iterations = orig_iters
    return input_root, output_root


@pytest.fixture
def small_cube_scene(monkeypatch):
    from pointcloud_tpu.envs import scenes

    monkeypatch.setitem(
        scenes.cfg_scene, "Cube", dict(scenes.cfg_scene["Cube"], sample_points=N_PTS)
    )


def _make_push_env(encoder_cls, output_root, monkeypatch, **kwargs):
    from pointcloud_tpu.envs.envs import RoboPush
    from pointcloud_tpu.vision import pc_encoder
    from pointcloud_tpu.vision.pc_sensor import PointCloudSensor

    monkeypatch.setattr(pc_encoder, "OUTPUT_ROOT", output_root)

    class Enc(encoder_cls):
        backbone = "PointNet"

    return RoboPush(
        sensor=PointCloudSensor, encoder=Enc, require_segmentation=False, **kwargs
    )


def test_pointcloud_sensor_output(trained_root, small_cube_scene, monkeypatch):
    from pointcloud_tpu.vision.pc_encoder import GlobalAEEncoder

    env = _make_push_env(GlobalAEEncoder, trained_root[1], monkeypatch)
    try:
        obs, info = env.reset(seed=0)
        sensed = env.observation
        assert sensed["points"].shape == (N_PTS, 3)
        assert sensed["rgb"].shape == (N_PTS, 3)
        assert sensed["boundingbox"].shape == (3, 2)
        # raw state keys still present for GT encoders (pc_sensor.py:41-43)
        assert "cube_pos" in sensed
        # encoding dim = sum(class_latent_dim) = 13 for Cube
        assert obs["achieved_goal"].shape == (13,)
        obs2, r, te, tr, info2 = env.step(env.action_space.sample())
        assert obs2["achieved_goal"].shape == (13,)
        assert r in (-1, 0)
    finally:
        env.close()


def test_multisegmenter_encoder_env(trained_root, small_cube_scene, monkeypatch):
    from pointcloud_tpu.vision.pc_encoder import MultiSegmenterEncoder

    env = _make_push_env(MultiSegmenterEncoder, trained_root[1], monkeypatch)
    try:
        obs, _ = env.reset(seed=1)
        # obs/goal keys = ['cube_pos'] -> cube class latent (3)
        assert obs["achieved_goal"].shape == (3,)
        assert obs["desired_goal"].shape == (3,)
        env.step(env.action_space.sample())
    finally:
        env.close()


def test_statepredictor_encoder_env(trained_root, small_cube_scene, monkeypatch):
    from pointcloud_tpu.vision.pc_encoder import StatePredictor

    env = _make_push_env(StatePredictor, trained_root[1], monkeypatch)
    try:
        obs, _ = env.reset(seed=2)
        # predictions live in STATE space (cube_pos, 3-d, unnormalized)
        assert obs["achieved_goal"].shape == (3,)
        # passthrough goal: desired goal is the GT cube goal
        np.testing.assert_allclose(
            obs["desired_goal"], env.goal_state["cube_pos"], atol=1e-5
        )
        assert env.visual_goal is False  # passthrough disables visual goals
        # prediction should at least land inside the scene bbox
        bb = np.asarray(env.bbox)
        assert (obs["achieved_goal"] >= bb[:, 0] - 0.5).all()
        assert (obs["achieved_goal"] <= bb[:, 1] + 0.5).all()
    finally:
        env.close()


def test_latent_threshold_roundtrip(trained_root, small_cube_scene, monkeypatch):
    from pointcloud_tpu.vision.pc_encoder import GlobalAEEncoder, load_metadata

    env = _make_push_env(GlobalAEEncoder, trained_root[1], monkeypatch)
    try:
        enc = env.encoder
        assert enc.latent_threshold is None  # not calibrated yet
        thr = np.full(13, 0.05, np.float32)
        enc.save_latent_threshold(thr, all_dists=np.ones((4, 13)))
        assert np.allclose(enc.latent_threshold, thr)
        data = load_metadata(enc.metadata_dir)
        assert np.allclose(data["latent_threshold"], thr)
        # success check now uses the per-dim threshold
        a = np.zeros(13, np.float32)
        assert env.check_success(a, a + 0.04, None)
        assert not env.check_success(a, a + 0.06, None)
    finally:
        env.close()
