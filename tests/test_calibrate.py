"""End-to-end latent-threshold calibration test (BASELINE config-5 glue):
train a tiny AE + a GT Reach policy, calibrate the encoder's threshold on a
vision Reach env, and check the threshold makes latent success achievable."""

import numpy as np
import pytest

import pointcloud_tpu.cfg as cfg
from pointcloud_tpu.envs.synthetic import generate_dataset

N_PTS = 128


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    """Train an Autoencoder on Table data + a HER policy on RoboReach."""
    import gymnasium as gym

    from pointcloud_tpu.envs import scenes
    from pointcloud_tpu.rl.ddpg import her
    from pointcloud_tpu.train import train

    base = tmp_path_factory.mktemp("calib")
    input_root, output_root = str(base / "input"), str(base / "output")
    generate_dataset(
        str(base / "input" / "Table" / "train"), scene="Table", frames=12,
        seed=0, sample_points=N_PTS,
    )
    generate_dataset(
        str(base / "input" / "Table" / "val"), scene="Table", frames=4,
        seed=9, sample_points=N_PTS,
    )

    orig = scenes.cfg_scene["Table"]
    scenes.cfg_scene["Table"] = dict(orig, sample_points=N_PTS)
    try:
        train(
            "Autoencoder", "PointNet", scene="Table", epochs=3, batch_size=4,
            input_root=input_root, output_root=output_root,
            loss_override="chamfer", log_meshes=False,
        )

        def env_fn():
            return gym.make("RoboReach-v0", max_episode_steps=30)

        policy_path = str(base / "reach.pkl")
        her(
            env_fn, hidden=(64, 64), epochs=3, steps_per_epoch=1500,
            start_steps=300, update_after=300, batch_size=128, max_ep_len=30,
            num_test_episodes=5, seed=0, save_path=policy_path,
            log_fn=lambda *a: None,
        )
    finally:
        scenes.cfg_scene["Table"] = orig
    return input_root, output_root, policy_path


def test_calibration_produces_threshold(setup, monkeypatch):
    from pointcloud_tpu.envs import scenes
    from pointcloud_tpu.envs.envs import RoboReach
    from pointcloud_tpu.train.calibrate import latent_distributions
    from pointcloud_tpu.vision import pc_encoder
    from pointcloud_tpu.vision.pc_encoder import GlobalAEEncoder
    from pointcloud_tpu.vision.pc_sensor import PointCloudSensor

    _, output_root, policy_path = setup
    monkeypatch.setattr(pc_encoder, "OUTPUT_ROOT", output_root)
    monkeypatch.setitem(
        scenes.cfg_scene, "Table",
        dict(scenes.cfg_scene["Table"], sample_points=N_PTS),
    )

    class Enc(GlobalAEEncoder):
        backbone = "PointNet"

    import gymnasium

    env = gymnasium.wrappers.TimeLimit(
        RoboReach(sensor=PointCloudSensor, encoder=Enc, simulate_goal=True),
        max_episode_steps=30,
    )
    threshold, before, during = latent_distributions(
        "unused", policy_path, horizon=30, runs=4, env=env, save=True,
    )
    assert threshold is not None
    assert threshold.shape == (3,)  # Table class_latent_dim sums to 3
    assert np.isfinite(threshold).all() and (threshold >= 0).all()
    # threshold persisted to the metadata sidecar and reloadable
    enc2_env = gymnasium.wrappers.TimeLimit(
        RoboReach(sensor=PointCloudSensor, encoder=Enc, simulate_goal=True),
        max_episode_steps=30,
    )
    loaded = enc2_env.unwrapped.encoder.latent_threshold
    np.testing.assert_allclose(loaded, threshold, atol=1e-6)
    enc2_env.close()
