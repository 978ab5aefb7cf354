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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# fast scripted-fake tests of the calibration math (no training involved)
# ---------------------------------------------------------------------------

from gymnasium.spaces import Box


class _FakeEncoder:
    obs_keys = ["o"]
    goal_keys = ["g"]

    def __init__(self):
        self.latent_threshold = np.zeros(2, np.float32)
        self.saved = None

    def get_goal_space(self, backend):
        return Box(-np.inf, np.inf, (2,))

    def save_latent_threshold(self, thr, before, during):
        self.saved = (np.array(thr), before, during)


class _FakePolicy:
    def predict(self, obs, deterministic=True):
        return np.zeros(2, np.float32), None


class _FakeCalibEnv:
    """Scripted env: GT success begins at succ_at[episode] (None = never);
    latent |goal - achieved| is d0 outside success and d_dur during it."""

    def __init__(self, succ_at, d0, d_dur, succ_at_reset=False):
        self.succ_at = list(succ_at)
        self.d0 = np.asarray(d0, np.float32)
        self.d_dur = np.asarray(d_dur, np.float32)
        self.succ_at_reset = succ_at_reset
        self.encoder = _FakeEncoder()
        self.backend = None
        self.proprioception = np.zeros(1, np.float32)
        self.unwrapped = self
        self.ep = -1

    def _latent(self):
        d = self.d_dur if self._success() else self.d0
        self.goal_encoding = d.copy()
        self.achieved = np.zeros_like(d)

    def _success(self):
        if self.succ_at_reset and self.t < 0:
            return True
        ts = self.succ_at[self.ep]
        return ts is not None and self.t >= ts

    def reset(self):
        self.ep += 1
        self.t = -1
        state = {"o": np.zeros(1, np.float32), "g": np.zeros(1, np.float32)}
        self.goal_state = state
        self.raw_state = state
        self.observation = state
        self._latent()
        return {}, {}

    def step(self, action):
        self.t += 1
        self._latent()
        return {}, 0.0, False, False, {}

    def check_success(self, achieved, goal, info=None, force_gt=False):
        return self._success()

    def close(self):
        pass


def _run(env, **kw):
    from pointcloud_tpu.train.calibrate import latent_distributions

    return latent_distributions(
        "unused", _FakePolicy(), env=env, **kw
    )


def test_threshold_strictness_math():
    """threshold = (1-s)*mean(before) + s*mean(during), per dim."""
    d0, d_dur = [0.8, 0.4], [0.2, 0.1]
    for s in (0.0, 0.3, 1.0):
        env = _FakeCalibEnv([3, 5], d0, d_dur)
        thr, before, during = _run(
            env, horizon=10, runs=2, threshold_strictness=s, save=False,
        )
        want = (1 - s) * np.asarray(d0) + s * np.asarray(d_dur)
        np.testing.assert_allclose(thr, want, atol=1e-6)
        assert before.shape == (2, 2) and during.shape == (2, 2)
        np.testing.assert_allclose(before, np.tile(d0, (2, 1)), atol=1e-6)
        np.testing.assert_allclose(during, np.tile(d_dur, (2, 1)), atol=1e-6)


def test_failed_episode_warns_and_is_excluded(capsys):
    env = _FakeCalibEnv([2, None], [0.8, 0.4], [0.2, 0.1])
    thr, before, during = _run(
        env, horizon=8, runs=2, threshold_strictness=0.5, save=False,
    )
    out = capsys.readouterr().out
    assert "WARNING: the policy failed in episode 1" in out
    # the failed episode contributes to neither statistic
    assert before.shape == (1, 2) and during.shape == (1, 2)
    np.testing.assert_allclose(thr, 0.5 * np.array([0.8, 0.4])
                               + 0.5 * np.array([0.2, 0.1]), atol=1e-6)


def test_all_episodes_failed_returns_none(capsys):
    env = _FakeCalibEnv([None, None], [0.8, 0.4], [0.2, 0.1])
    thr, before, during = _run(
        env, horizon=5, runs=2, save=True,
    )
    out = capsys.readouterr().out
    assert thr is None
    assert "No data to calculate threshold" in out
    assert env.encoder.saved is None  # nothing persisted


def test_success_at_reset_warns(capsys):
    env = _FakeCalibEnv([0, 0], [0.8, 0.4], [0.2, 0.1], succ_at_reset=True)
    _run(env, horizon=5, runs=1, save=False)
    assert "success right after reset" in capsys.readouterr().out


def test_threshold_saved_through_encoder():
    env = _FakeCalibEnv([1], [0.6, 0.2], [0.2, 0.2])
    thr, _, _ = _run(env, horizon=5, runs=1, threshold_strictness=0.3,
                     save=True)
    saved_thr, saved_before, saved_during = env.encoder.saved
    np.testing.assert_allclose(saved_thr, thr, atol=1e-6)
    assert saved_before.shape == (1, 2) and saved_during.shape == (1, 2)
