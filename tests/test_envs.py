"""GoalEnv-layer tests on the synthetic backend (robosuite-free)."""

import gymnasium as gym
import numpy as np
import pytest

import pointcloud_tpu  # noqa: F401  (registers envs)
from pointcloud_tpu.envs.base_env import RobosuiteGoalEnv
from pointcloud_tpu.envs.encoders import PassthroughEncoder, flatten_observations
from pointcloud_tpu.envs.envs import RoboPush, RoboReach
from pointcloud_tpu.envs.sensors import PassthroughSensor


def test_registration_lists_envs():
    ids = set(gym.registry.keys())
    for env_id in (
        "RoboReach-v0",
        "RoboPush-v0",
        "RoboPickAndPlace-v0",
        "RoboPegInHole-v0",
        "VisionReach-v0",
        "VisionPush-v0",
        "VisionPushGT-v0",
        "VisionPegInHoleMultiSeg-v0",
    ):
        assert env_id in ids, env_id


@pytest.fixture
def reach_env():
    env = gym.make("RoboReach-v0")
    yield env
    env.close()


@pytest.fixture
def push_env():
    env = gym.make("RoboPush-v0")
    yield env
    env.close()


def test_reach_reset_step_api(reach_env):
    obs, info = reach_env.reset(seed=0)
    assert set(obs) == {"observation", "achieved_goal", "desired_goal"}
    assert "is_success" in info
    assert obs["achieved_goal"].shape == (3,)  # eef pos
    assert obs["desired_goal"].shape == (3,)
    action = reach_env.action_space.sample()
    obs2, reward, terminated, truncated, info2 = reach_env.step(action)
    assert reward in (-1, 0)
    assert terminated is False
    assert obs2["observation"] in reach_env.observation_space["observation"]


def test_reach_goal_within_bounds(reach_env):
    obs, _ = reach_env.reset(seed=1)
    g = obs["desired_goal"]
    assert -0.2 <= g[0] <= 0.2 and -0.2 <= g[1] <= 0.2 and 0.85 <= g[2] <= 1.2


def test_reach_reward_is_sparse_success(reach_env):
    env = reach_env.unwrapped
    obs, _ = env.reset(seed=2)
    # force achieved == desired -> reward 0
    r = env.compute_reward(obs["desired_goal"], obs["desired_goal"], {})
    assert r == 0
    r = env.compute_reward(obs["desired_goal"] + 1.0, obs["desired_goal"], {})
    assert r == -1


def test_reach_success_by_driving(reach_env):
    """Kinematic backend: move the eef straight at the goal -> success."""
    env = reach_env.unwrapped
    obs, _ = env.reset(seed=3)
    for _ in range(60):
        delta = obs["desired_goal"] - obs["achieved_goal"]
        a = np.zeros(env.action_space.shape, dtype=np.float32)
        a[:3] = np.clip(delta / 0.05, -1, 1)
        obs, reward, term, trunc, info = env.step(a)
        if info["is_success"]:
            break
    assert info["is_success"]
    assert reward == 0
    assert env.actual_success


def test_push_goal_displaced_enough(push_env):
    env = push_env.unwrapped
    obs, _ = env.reset(seed=4)
    d = np.linalg.norm(obs["desired_goal"][:2] - obs["achieved_goal"][:2])
    assert 0.12 <= d <= 0.31
    # never pre-achieved
    assert not info_success(env)


def info_success(env):
    return env.is_episode_success


def test_push_randomize_moves_cube(push_env):
    env = push_env.unwrapped
    env.reset(seed=5)
    before = env.raw_state["cube_pos"].copy()
    env.randomize()
    after = env.backend.observe()["cube_pos"]
    assert not np.allclose(before, after)


def test_desired_goal_state_does_not_mutate_input(push_env):
    env = push_env.unwrapped
    env.reset(seed=6)
    state = env.backend.observe()
    snapshot = {k: np.array(v, copy=True) for k, v in state.items()}
    env.desired_goal_state(state)  # @assert_correctness wraps this
    for k in snapshot:
        np.testing.assert_array_equal(state[k], snapshot[k])


def test_passthrough_pair_spaces(push_env):
    env = push_env.unwrapped
    obs, _ = env.reset(seed=7)
    # observation = proprio (4) ++ encoding (3)
    assert obs["observation"].shape == (7,)
    proprio = flatten_observations(env.raw_state, env.proprio_keys)
    np.testing.assert_array_equal(obs["observation"][: len(proprio)], proprio)


def test_render_state_restores(push_env):
    env = push_env.unwrapped
    env.reset(seed=8)
    before = env.backend.observe()["cube_pos"].copy()
    imaginary = env.render_state(
        lambda b: b.set_object_pos("cube_joint0", np.array([0.3, 0.3, 0.82]))
    )
    np.testing.assert_allclose(imaginary["cube_pos"], [0.3, 0.3, 0.82], atol=1e-6)
    np.testing.assert_array_equal(env.backend.observe()["cube_pos"], before)


def test_episode_success_sticky(reach_env):
    """info['is_success'] stays True for the rest of the episode
    (reference base_env.py:272-277)."""
    env = reach_env.unwrapped
    obs, _ = env.reset(seed=9)
    # drive to success
    for _ in range(60):
        delta = obs["desired_goal"] - obs["achieved_goal"]
        a = np.zeros(env.action_space.shape, dtype=np.float32)
        a[:3] = np.clip(delta / 0.05, -1, 1)
        obs, r, te, tr, info = env.step(a)
        if info["is_success"]:
            break
    assert info["is_success"]
    # now move away; sticky flag must persist
    a = np.zeros(env.action_space.shape, dtype=np.float32)
    a[0] = 1.0
    for _ in range(5):
        obs, r, te, tr, info = env.step(a)
    assert info["is_success"]
    assert r == -1  # but the reward reflects the current state


def test_time_limit_truncates():
    env = gym.make("RoboReach-v0")  # max_episode_steps=50
    env.reset(seed=10)
    a = np.zeros(env.action_space.shape, dtype=np.float32)
    truncated = False
    for _ in range(50):
        _, _, term, truncated, _ = env.step(a)
        assert not term
    assert truncated
    env.close()


@pytest.fixture
def peg_env():
    env = gym.make("RoboPegInHole-v0")
    yield env
    env.close()


def test_peginhole_reset_step_api(peg_env):
    obs, info = peg_env.reset(seed=0)
    assert set(obs) == {"observation", "achieved_goal", "desired_goal"}
    # obs: peg_to_hole(3) + peg_quat(4) + hole_pos(3) + hole_quat(4)
    assert obs["observation"].shape == (14,)
    # goal: (t, d, angle)
    assert obs["achieved_goal"].shape == (3,)
    assert peg_env.action_space.shape == (12,)  # two-arm OSC_POSE, no grippers
    obs2, reward, terminated, truncated, info2 = peg_env.step(
        peg_env.action_space.sample()
    )
    assert reward in (-1, 0)
    assert terminated is False


def test_peginhole_goal_is_expert_insertion(peg_env):
    """The goal producer is the expert kinematic solve: t = d = angle = 0."""
    obs, _ = peg_env.reset(seed=1)
    np.testing.assert_allclose(obs["desired_goal"], 0.0, atol=1e-5)
    # and a random reset is not pre-achieved
    assert not peg_env.unwrapped.is_episode_success


def test_peginhole_perdim_success_thresholds(peg_env):
    env = peg_env.unwrapped
    env.reset(seed=2)
    desired = np.zeros(3, np.float32)
    ok = np.array([0.13, 0.05, 0.04], np.float32)  # all within [0.14,0.06,0.05]
    bad = np.array([0.13, 0.07, 0.04], np.float32)  # d exceeds its threshold
    assert env.check_success(ok, desired, {}, force_gt=True)
    assert not env.check_success(bad, desired, {}, force_gt=True)
    # batched variant
    got = env.check_success(np.stack([ok, bad]), np.stack([desired] * 2), {},
                            force_gt=True)
    assert list(got) == [True, False]


def test_peginhole_success_by_driving(peg_env):
    """Drive arm 0 at the hole (position via peg_to_hole, orientation via the
    axis-cross controller) until the per-dim thresholds are met."""
    from pointcloud_tpu.envs.synthetic import _quat_rotate

    env = peg_env.unwrapped
    obs, _ = env.reset(seed=3)
    info = {"is_success": False}
    reward = -1
    for _ in range(150):
        st = env.backend.observe()
        pa = _quat_rotate(st["peg_quat"], [0.0, 0.0, 1.0])
        ha = _quat_rotate(st["hole_quat"], [0.0, 0.0, 1.0])
        if pa @ ha < 0:
            ha = -ha  # the nearer of the two aligned directions
        a = np.zeros(12, dtype=np.float32)
        a[0:3] = np.clip(st["peg_to_hole"] / 0.05, -1, 1)
        a[3:6] = np.clip(np.cross(pa, ha) / 0.2 * 2.0, -1, 1)
        obs, reward, term, trunc, info = env.step(a)
        if info["is_success"]:
            break
    assert info["is_success"]
    assert reward == 0


def test_peginhole_randomize_and_restore(peg_env):
    """snapshot/restore roundtrip + desired_goal_state leaves the live
    backend state untouched (the expert solve runs on a snapshot)."""
    env = peg_env.unwrapped
    env.reset(seed=4)
    before = env.backend.observe()
    _ = env.desired_goal_state(before)
    after = env.backend.observe()
    for k in before:
        np.testing.assert_array_equal(before[k], after[k])


def test_peginhole_synthetic_dataset_generation(tmp_path):
    """generate_dataset supports the PegInHole scene: npz contract + all 7
    ground-truth states present."""
    from pointcloud_tpu.envs.synthetic import generate_dataset

    out = generate_dataset(str(tmp_path / "peg"), scene="PegInHole", frames=2,
                           sample_points=256)
    import glob

    files = sorted(glob.glob(out + "/*.npz"))
    assert len(files) == 2
    data = np.load(files[0], allow_pickle=True)
    assert data["points"].shape == (256, 3)
    gt = dict((k, v) for k, v in data["ground_truth"])
    assert set(gt) == {"peg_to_hole", "peg_quat", "hole_pos", "hole_quat",
                       "t", "d", "angle"}


def test_goal_randomization_seeded():
    """reset(seed=) controls the goal sequence (goals draw from the per-env
    gymnasium np_random, improving on the reference's global-RNG goals)."""
    e1 = gym.make("RoboReach-v0", max_episode_steps=10)
    e2 = gym.make("RoboReach-v0", max_episode_steps=10)
    try:
        o1, _ = e1.reset(seed=123)
        o2, _ = e2.reset(seed=123)
        np.testing.assert_allclose(o1["desired_goal"], o2["desired_goal"])
        o3, _ = e1.reset(seed=7)
        assert not np.allclose(o1["desired_goal"], o3["desired_goal"])
        # and the global numpy RNG no longer influences goals
        o4, _ = e2.reset(seed=7)
        np.random.seed(0)
        o5, _ = e1.reset(seed=7)
        np.testing.assert_allclose(o4["desired_goal"], o5["desired_goal"])
    finally:
        e1.close()
        e2.close()
