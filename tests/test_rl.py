"""RL layer tests: buffer/HER mechanics, update steps, learning on Reach."""

import gymnasium as gym
import numpy as np
import pytest

import pointcloud_tpu  # noqa: F401
from pointcloud_tpu.rl.buffers import ReplayBuffer, her_sample


def _fill_buffer(buf, episodes=3, ep_len=5, goal_dim=3):
    rng = np.random.default_rng(0)
    for e in range(episodes):
        for t in range(ep_len):
            ag = np.full(goal_dim, e * 10 + t, np.float32)
            buf.store(
                obs=rng.random(4, dtype=np.float32),
                achieved=ag,
                desired=np.full(goal_dim, -1.0, np.float32),
                act=rng.random(2, dtype=np.float32),
                rew=-1.0,
                next_obs=rng.random(4, dtype=np.float32),
                next_achieved=ag + 0.5,
                done=float(t == ep_len - 1),
            )
        buf.end_episode()


def test_replay_buffer_store_sample():
    buf = ReplayBuffer(obs_dim=4, goal_dim=3, act_dim=2, size=100)
    _fill_buffer(buf)
    assert buf.size == 15
    batch = buf.sample(8, np.random.default_rng(1))
    assert batch["obs"].shape == (8, 4)
    assert batch["desired"].shape == (8, 3)


def test_her_future_relabels_within_episode():
    buf = ReplayBuffer(obs_dim=4, goal_dim=3, act_dim=2, size=100)
    _fill_buffer(buf, episodes=3, ep_len=5)

    def reward_fn(achieved, desired):
        return -(np.linalg.norm(achieved - desired, axis=-1) > 0.01).astype(np.float32)

    rng = np.random.default_rng(2)
    batch = her_sample(buf, 64, rng, reward_fn, strategy="future", her_ratio=1.0)
    # relabeled desired goals are achieved goals (x.5 values) from the SAME
    # episode at an index >= the sampled one
    for b in range(64):
        g = batch["desired"][b][0]
        assert g != -1.0  # everything relabeled at ratio 1.0
        base = g - 0.5
        ep = int(base // 10)
        assert 0 <= ep < 3
        assert base % 10 < 5


def test_her_final_strategy():
    buf = ReplayBuffer(obs_dim=4, goal_dim=3, act_dim=2, size=100)
    _fill_buffer(buf, episodes=2, ep_len=4)

    rng = np.random.default_rng(3)
    batch = her_sample(
        buf, 32, rng, lambda a, d: np.zeros(len(a)), strategy="final", her_ratio=1.0
    )
    # final strategy: the relabeled goal is the LAST next_achieved of the episode
    for b in range(32):
        g = batch["desired"][b][0]
        assert g in (3.5, 13.5)


def test_her_rewards_recomputed():
    buf = ReplayBuffer(obs_dim=4, goal_dim=3, act_dim=2, size=100)
    _fill_buffer(buf, episodes=1, ep_len=5)
    rng = np.random.default_rng(4)

    def reward_fn(achieved, desired):
        return np.where(np.abs(achieved - desired).max(-1) < 0.01, 0.0, -1.0)

    batch = her_sample(buf, 16, rng, reward_fn, strategy="final", her_ratio=1.0)
    # transitions whose next_achieved == episode-final achieved get reward 0
    assert (batch["rew"] == 0).any()


def test_tqc_policy_save_load_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from pointcloud_tpu.rl.core import SquashedGaussianActor
    from pointcloud_tpu.rl.tqc import TQC

    actor = SquashedGaussianActor(act_dim=2, act_limit=1.0, hidden=(16, 16))
    params = actor.init(jax.random.PRNGKey(0), jnp.zeros((1, 6)))
    policy = TQC(actor, params, 1.0)
    obs = {
        "observation": np.ones(3, np.float32),
        "desired_goal": np.ones(3, np.float32),
    }
    a1, _ = policy.predict(obs)
    path = str(tmp_path / "policy.pkl")
    policy.save(path)
    from pointcloud_tpu.rl.policy import load_policy

    loaded = load_policy(path)
    a2, _ = loaded.predict(obs)
    np.testing.assert_allclose(a1, a2, atol=1e-6)
    assert (np.abs(a1) <= 1.0).all()


def test_quantile_huber_loss_basic():
    import jax.numpy as jnp

    from pointcloud_tpu.rl.tqc import quantile_huber_loss

    pred = jnp.zeros((2, 2, 5))
    target = jnp.zeros((2, 7))
    assert float(quantile_huber_loss(pred, target)) == 0.0
    target2 = jnp.ones((2, 7))
    assert float(quantile_huber_loss(pred, target2)) > 0


@pytest.mark.slow
def test_ddpg_her_learns_reach():
    """DDPG+HER on the kinematic Reach env must climb to >=60% success."""
    from pointcloud_tpu.rl.ddpg import her

    def env_fn():
        return gym.make("RoboReach-v0", max_episode_steps=30)

    _, history = her(
        env_fn,
        hidden=(64, 64),
        epochs=4,
        steps_per_epoch=1500,
        start_steps=300,
        update_after=300,
        batch_size=128,
        max_ep_len=30,
        num_test_episodes=10,
        seed=0,
        log_fn=lambda *a: None,
    )
    assert max(history) >= 0.6, history


def test_tqc_smoke_updates():
    """TQC runs env steps + jitted updates without blowing up."""
    from pointcloud_tpu.rl.tqc import tqc

    def env_fn():
        return gym.make("RoboReach-v0", max_episode_steps=10)

    policy, history = tqc(
        env_fn,
        hidden=(32, 32),
        critic_hidden=(32, 32),
        epochs=1,
        steps_per_epoch=150,
        start_steps=50,
        update_after=50,
        batch_size=32,
        max_ep_len=10,
        num_test_episodes=2,
        seed=0,
        log_fn=lambda *a: None,
    )
    obs = {
        "observation": np.zeros(3, np.float32),
        "desired_goal": np.zeros(3, np.float32),
    }
    a, _ = policy.predict(obs)
    assert a.shape == (4,)
    assert np.isfinite(a).all()


def test_rollout_bookkeeping():
    from pointcloud_tpu.rl.sb3 import rollout

    env = gym.make("RoboReach-v0", max_episode_steps=10)
    stats = rollout(env, None, episodes=2, horizon=10)
    assert set(stats) >= {
        "mean_reward", "median_reward", "success_rate", "actual_success_rate",
    }
    env.close()


def test_yaml_config_loader():
    from pointcloud_tpu.rl.config import load_yaml_config

    cfg = load_yaml_config("RoboReach-v0")
    assert cfg["use_her"] is True
    assert cfg["hidden"] == (64, 64)
    assert cfg["gamma"] == 0.95
    assert abs(cfg["her_ratio"] - 0.8) < 1e-9
    cfg2 = load_yaml_config("RoboPush-v0")
    assert cfg2["hidden"] == (512, 512, 512)


def _reach_env_fn():
    return gym.make("RoboReach-v0", max_episode_steps=5)


@pytest.mark.parametrize("kind", ["dummy", "subproc"])
def test_vec_goal_env_batches_and_autoresets(kind):
    """Vector GoalEnvs (reference rl_zoo3 subproc vec-env path): batched
    obs dicts, autoreset with final_observation on done."""
    import functools

    from pointcloud_tpu.rl.vec_env import (
        DummyVecGoalEnv, SubprocVecGoalEnv, make_env,
    )

    n = 2
    if kind == "dummy":
        venv = DummyVecGoalEnv([_reach_env_fn] * n)
    else:
        fn = functools.partial(make_env, "RoboReach-v0", max_episode_steps=5)
        venv = SubprocVecGoalEnv([fn] * n)
    try:
        obs, infos = venv.reset(seed=0)
        assert obs["observation"].shape[0] == n
        assert obs["desired_goal"].shape[0] == n
        act_dim = venv.action_space.shape[0]
        saw_final = False
        for _ in range(6):  # max_episode_steps=5 -> guaranteed truncation
            acts = np.stack([venv.action_space.sample() for _ in range(n)])
            obs, rews, terms, truncs, infos = venv.step(acts)
            assert obs["observation"].shape[0] == n
            assert rews.shape == (n,) and terms.shape == (n,)
            for info in infos:
                if "final_observation" in info:
                    saw_final = True
                    assert "observation" in info["final_observation"]
        assert saw_final, "TimeLimit truncation should surface final_observation"
        r = venv.compute_reward(
            np.zeros((2, 3), np.float32), np.zeros((2, 3), np.float32)
        )
        assert np.asarray(r).shape == (2,)
        assert act_dim == 4
    finally:
        venv.close()


def test_tqc_n_envs_smoke():
    """TQC with parallel collection (n_envs=2) trains and stays finite."""
    from pointcloud_tpu.rl.tqc import tqc

    policy, history = tqc(
        _reach_env_fn,
        hidden=(32, 32),
        critic_hidden=(32, 32),
        epochs=1,
        steps_per_epoch=120,
        start_steps=40,
        update_after=40,
        batch_size=32,
        max_ep_len=5,
        num_test_episodes=2,
        seed=0,
        log_fn=lambda *a: None,
        n_envs=2,
        vec_env="dummy",
    )
    obs = {
        "observation": np.zeros(3, np.float32),
        "desired_goal": np.zeros(3, np.float32),
    }
    a, _ = policy.predict(obs)
    assert a.shape == (4,) and np.isfinite(a).all()
    assert len(history) == 1
