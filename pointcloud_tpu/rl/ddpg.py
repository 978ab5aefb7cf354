"""DDPG and DDPG+HER trainers (reference: rl/agent.py:45-474).

Spinning-up-style single-env trainers, re-built on JAX: the actor/critic
updates and target polyak averaging run as one jitted step; the env loop and
replay buffer stay on host. `her()` is `ddpg()` with goal relabeling
(future-k by default; the reference's in-repo variant used final-state).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointcloud_tpu.rl.buffers import ReplayBuffer, her_sample
from pointcloud_tpu.rl.core import Actor, QCritic


def _flat(obs_dict):
    return np.concatenate(
        [obs_dict["observation"], obs_dict["desired_goal"]], dtype=np.float32
    )


def make_update_step(actor, critic, gamma, polyak, pi_lr, q_lr):
    pi_tx = optax.adam(pi_lr)
    q_tx = optax.adam(q_lr)

    @jax.jit
    def update(state, batch):
        pi_p, q_p, pi_t, q_t, pi_opt, q_opt = state
        o = jnp.concatenate([batch["obs"], batch["desired"]], axis=-1)
        o2 = jnp.concatenate([batch["next_obs"], batch["desired"]], axis=-1)

        # critic update (Bellman backup with target nets)
        a2 = actor.apply(pi_t, o2)
        q_targ = critic.apply(q_t, o2, a2)
        backup = batch["rew"] + gamma * (1 - batch["done"]) * q_targ

        def q_loss_fn(qp):
            q = critic.apply(qp, o, batch["act"])
            return jnp.mean((q - backup) ** 2)

        q_loss, q_grads = jax.value_and_grad(q_loss_fn)(q_p)
        q_up, q_opt = q_tx.update(q_grads, q_opt, q_p)
        q_p = optax.apply_updates(q_p, q_up)

        # actor update (maximize Q)
        def pi_loss_fn(pp):
            return -jnp.mean(critic.apply(q_p, o, actor.apply(pp, o)))

        pi_loss, pi_grads = jax.value_and_grad(pi_loss_fn)(pi_p)
        pi_up, pi_opt = pi_tx.update(pi_grads, pi_opt, pi_p)
        pi_p = optax.apply_updates(pi_p, pi_up)

        # polyak averaging of targets (rl/agent.py polyak=0.995)
        pi_t = jax.tree_util.tree_map(
            lambda t, s: polyak * t + (1 - polyak) * s, pi_t, pi_p
        )
        q_t = jax.tree_util.tree_map(
            lambda t, s: polyak * t + (1 - polyak) * s, q_t, q_p
        )
        return (pi_p, q_p, pi_t, q_t, pi_opt, q_opt), q_loss, pi_loss

    return update


def ddpg(
    env_fn: Callable,
    hidden=(256, 256),
    seed: int = 0,
    steps_per_epoch: int = 4000,
    epochs: int = 10,
    replay_size: int = 1_000_000,
    gamma: float = 0.99,
    polyak: float = 0.995,
    pi_lr: float = 1e-3,
    q_lr: float = 1e-3,
    batch_size: int = 100,
    start_steps: int = 1000,
    update_after: int = 1000,
    update_every: int = 50,
    act_noise: float = 0.1,
    max_ep_len: int = 50,
    use_her: bool = False,
    her_strategy: str = "future",
    her_ratio: float = 0.8,
    num_test_episodes: int = 10,
    save_path: str | None = None,
    log_fn=print,
):
    """Train DDPG(+HER) on a GoalEnv (reference rl/agent.py:45-291, 296-474).

    Returns (params dict, eval success rate history).
    """
    env, test_env = env_fn(), env_fn()
    env.action_space.seed(seed)  # deterministic exploration
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    obs_dim = env.observation_space["observation"].shape[0]
    goal_dim = env.observation_space["desired_goal"].shape[0]
    act_dim = env.action_space.shape[0]
    act_limit = float(env.action_space.high[0])

    actor = Actor(act_dim, act_limit, hidden)
    critic = QCritic(hidden)
    dummy_o = jnp.zeros((1, obs_dim + goal_dim))
    dummy_a = jnp.zeros((1, act_dim))
    pi_p = actor.init(key, dummy_o)
    q_p = critic.init(key, dummy_o, dummy_a)
    pi_t, q_t = pi_p, q_p
    pi_opt = optax.adam(pi_lr).init(pi_p)
    q_opt = optax.adam(q_lr).init(q_p)
    state = (pi_p, q_p, pi_t, q_t, pi_opt, q_opt)

    update = make_update_step(actor, critic, gamma, polyak, pi_lr, q_lr)
    act_jit = jax.jit(lambda p, o: actor.apply(p, o))

    buffer = ReplayBuffer(obs_dim, goal_dim, act_dim, replay_size)

    def reward_fn(achieved, desired):
        env_u = env.unwrapped
        return env_u.compute_reward(achieved, desired, None).astype(np.float32)

    def get_action(o_flat, noise):
        a = np.array(act_jit(state[0], o_flat[None])[0])
        a += noise * rng.standard_normal(act_dim)
        return np.clip(a, -act_limit, act_limit)

    def test_agent():
        successes = []
        for _ in range(num_test_episodes):
            o, info = test_env.reset(seed=int(rng.integers(1 << 30)))
            for _ in range(max_ep_len):
                a = np.asarray(act_jit(state[0], _flat(o)[None]))[0]
                o, r, te, tr, info = test_env.step(np.clip(a, -act_limit, act_limit))
                if te or tr:
                    break
            successes.append(float(info.get("is_success", False)))
        return float(np.mean(successes))

    total_steps = steps_per_epoch * epochs
    o, info = env.reset(seed=seed)
    ep_len = 0
    history = []
    t0 = time.time()

    for t in range(total_steps):
        if t < start_steps:
            a = env.action_space.sample()
        else:
            a = get_action(_flat(o), act_noise)

        o2, r, terminated, truncated, info = env.step(a)
        d = float(terminated)
        buffer.store(
            o["observation"], o["achieved_goal"], o["desired_goal"], a, r,
            o2["observation"], o2["achieved_goal"], d,
        )
        o = o2
        ep_len += 1

        if terminated or truncated or ep_len >= max_ep_len:
            buffer.end_episode()
            o, info = env.reset()
            ep_len = 0

        if t >= update_after and t % update_every == 0:
            for _ in range(update_every):
                if use_her:
                    batch = her_sample(
                        buffer, batch_size, rng, reward_fn,
                        strategy=her_strategy, her_ratio=her_ratio,
                    )
                else:
                    batch = buffer.sample(batch_size, rng)
                    batch.pop("idx", None)
                jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
                state, q_loss, pi_loss = update(state, jbatch)

        if (t + 1) % steps_per_epoch == 0:
            epoch = (t + 1) // steps_per_epoch
            succ = test_agent()
            history.append(succ)
            log_fn(
                f"epoch {epoch}/{epochs}: test success={succ:.2f} "
                f"q_loss={float(q_loss):.4f} ({time.time() - t0:.0f}s)"
            )
            if save_path:
                _save(save_path, state[0], actor)

    env.close()
    test_env.close()
    return {"pi": state[0], "actor": actor}, history


def her(env_fn, **kwargs):
    """DDPG with hindsight experience replay (reference rl/agent.py:296-474)."""
    kwargs.setdefault("use_her", True)
    return ddpg(env_fn, **kwargs)


def _save(path, pi_params, actor):
    import pickle

    with open(path, "wb") as f:
        pickle.dump(
            {"pi": jax.device_get(pi_params), "config": {
                "act_dim": actor.act_dim, "act_limit": actor.act_limit,
                "hidden": tuple(actor.hidden),
                "actor_type": "deterministic"}},
            f,
        )
