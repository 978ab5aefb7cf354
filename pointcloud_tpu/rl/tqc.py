"""TQC: Truncated Quantile Critics (the algorithm the reference trains with
via rl_zoo3/sb3_contrib — readme.md:79-94, rl/tqc.yml:207-277).

JAX implementation: squashed-Gaussian actor, an ensemble of quantile critics,
quantile-Huber regression against a target distribution with the top
`top_quantiles_to_drop` atoms removed (overestimation control), SAC-style
auto-tuned entropy temperature, polyak target averaging. HER relabeling via
rl.buffers.her_sample (future-4, matching tqc.yml).

The `TQC` class is the deployable policy object: `predict(obs_dict,
deterministic=True) -> (action, state)` — the MultiInputPolicy protocol
sim.py / calibrate_latent.py consume.
"""

from __future__ import annotations

import pickle
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointcloud_tpu.rl.buffers import ReplayBuffer, her_sample
from pointcloud_tpu.rl.core import QuantileEnsemble, SquashedGaussianActor


def quantile_huber_loss(pred, target, kappa: float = 1.0):
    """pred (B, n_c, n_q), target (B, n_t) -> scalar quantile-Huber loss."""
    B, n_c, n_q = pred.shape
    tau = (jnp.arange(n_q, dtype=jnp.float32) + 0.5) / n_q  # (n_q,)
    # pairwise TD errors: (B, n_c, n_q, n_t)
    td = target[:, None, None, :] - pred[..., None]
    abs_td = jnp.abs(td)
    huber = jnp.where(abs_td <= kappa, 0.5 * td**2, kappa * (abs_td - 0.5 * kappa))
    weight = jnp.abs(tau[None, None, :, None] - (td < 0).astype(jnp.float32))
    return jnp.mean(weight * huber)


class TQC:
    """Trained TQC policy bundle with sb3-style predict()."""

    def __init__(self, actor, actor_params, act_limit):
        self.actor = actor
        self.actor_params = actor_params
        self.act_limit = act_limit
        self._predict = jax.jit(
            lambda p, o: actor.apply(p, o, deterministic=True)[0]
        )

    def predict(self, obs_dict, deterministic: bool = True, state=None, **kw):
        o = np.concatenate(
            [np.asarray(obs_dict["observation"]).reshape(-1),
             np.asarray(obs_dict["desired_goal"]).reshape(-1)],
            dtype=np.float32,
        )
        a = np.asarray(self._predict(self.actor_params, o[None]))[0]
        return np.clip(a, -self.act_limit, self.act_limit), state

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "pi": jax.device_get(self.actor_params),
                    "config": {
                        "act_dim": self.actor.act_dim,
                        "act_limit": self.actor.act_limit,
                        "hidden": tuple(self.actor.hidden),
                        "actor_type": "squashed_gaussian",
                    },
                },
                f,
            )

    @classmethod
    def load(cls, path: str):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        cfg = payload["config"]
        actor = SquashedGaussianActor(
            act_dim=cfg["act_dim"], act_limit=cfg["act_limit"], hidden=cfg["hidden"]
        )
        return cls(actor, payload["pi"], cfg["act_limit"])


def tqc(
    env_fn: Callable,
    hidden=(256, 256),
    critic_hidden=(512, 512, 512),
    n_critics: int = 2,
    n_quantiles: int = 25,
    top_quantiles_to_drop: int = 2,
    seed: int = 0,
    steps_per_epoch: int = 4000,
    epochs: int = 10,
    replay_size: int = 1_000_000,
    gamma: float = 0.95,
    polyak: float = 0.995,
    lr: float = 1e-3,
    batch_size: int = 256,
    start_steps: int = 1000,
    update_after: int = 1000,
    update_every: int = 1,
    gradient_steps: int = 1,
    max_ep_len: int = 50,
    use_her: bool = True,
    her_strategy: str = "future",
    her_ratio: float = 0.8,
    num_test_episodes: int = 10,
    save_path: str | None = None,
    log_fn=print,
    n_envs: int = 1,
    vec_env: str = "subproc",
):
    """Train TQC(+HER) on a GoalEnv; hyperparameter defaults follow
    rl/tqc.yml:207-277 (gamma .95, net widths per task there). Returns
    (TQC policy, eval success history).

    n_envs > 1 collects experience from N parallel envs (reference:
    rl_zoo3 `--vec-env subproc -params n_envs:4`, readme.md:86-89) via
    rl.vec_env — per step, ONE batched jitted action call serves all envs.
    vec_env: 'subproc' (worker processes; env_fn must be picklable) or
    'dummy' (sequential in-process)."""
    env, test_env = env_fn(), env_fn()
    env.action_space.seed(seed)  # deterministic exploration
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    obs_dim = env.observation_space["observation"].shape[0]
    goal_dim = env.observation_space["desired_goal"].shape[0]
    act_dim = env.action_space.shape[0]
    act_limit = float(env.action_space.high[0])
    in_dim = obs_dim + goal_dim

    actor = SquashedGaussianActor(act_dim, act_limit, hidden)
    critic = QuantileEnsemble(n_critics, n_quantiles, critic_hidden)
    k_init, k_run = jax.random.split(key)
    dummy_o = jnp.zeros((1, in_dim))
    dummy_a = jnp.zeros((1, act_dim))
    pi_p = actor.init(k_init, dummy_o)
    q_p = critic.init(k_init, dummy_o, dummy_a)
    q_t = q_p
    log_alpha = jnp.zeros(())
    target_entropy = -float(act_dim)

    pi_tx, q_tx, a_tx = optax.adam(lr), optax.adam(lr), optax.adam(lr)
    pi_opt, q_opt, a_opt = pi_tx.init(pi_p), q_tx.init(q_p), a_tx.init(log_alpha)

    total_kept = n_critics * n_quantiles - top_quantiles_to_drop * n_critics

    @jax.jit
    def update(state, batch, key):
        pi_p, q_p, q_t, log_alpha, pi_opt, q_opt, a_opt = state
        o = jnp.concatenate([batch["obs"], batch["desired"]], axis=-1)
        o2 = jnp.concatenate([batch["next_obs"], batch["desired"]], axis=-1)
        k1, k2 = jax.random.split(key)

        # target distribution: truncated sorted quantiles of the target nets
        a2, logp2 = actor.apply(pi_p, o2, key=k1)
        zt = critic.apply(q_t, o2, a2).reshape(o.shape[0], -1)  # (B, n_c*n_q)
        zt = jnp.sort(zt, axis=-1)[:, :total_kept]
        alpha = jnp.exp(log_alpha)
        target = batch["rew"][:, None] + gamma * (1 - batch["done"][:, None]) * (
            zt - alpha * logp2[:, None]
        )
        target = jax.lax.stop_gradient(target)

        def q_loss_fn(qp):
            z = critic.apply(qp, o, batch["act"])  # (B, n_c, n_q)
            return quantile_huber_loss(z, target)

        q_loss, q_grads = jax.value_and_grad(q_loss_fn)(q_p)
        q_up, q_opt = q_tx.update(q_grads, q_opt, q_p)
        q_p = optax.apply_updates(q_p, q_up)

        def pi_loss_fn(pp):
            a, logp = actor.apply(pp, o, key=k2)
            z = critic.apply(q_p, o, a).reshape(o.shape[0], -1)
            return jnp.mean(alpha * logp - jnp.mean(z, axis=-1)), logp

        (pi_loss, logp), pi_grads = jax.value_and_grad(pi_loss_fn, has_aux=True)(pi_p)
        pi_up, pi_opt = pi_tx.update(pi_grads, pi_opt, pi_p)
        pi_p = optax.apply_updates(pi_p, pi_up)

        def alpha_loss_fn(la):
            return -jnp.mean(jnp.exp(la) * jax.lax.stop_gradient(logp + target_entropy))

        a_loss, a_grads = jax.value_and_grad(alpha_loss_fn)(log_alpha)
        a_up, a_opt = a_tx.update(a_grads, a_opt, log_alpha)
        log_alpha = optax.apply_updates(log_alpha, a_up)

        q_t = jax.tree_util.tree_map(
            lambda t, s: polyak * t + (1 - polyak) * s, q_t, q_p
        )
        return (pi_p, q_p, q_t, log_alpha, pi_opt, q_opt, a_opt), q_loss, pi_loss

    sample_act = jax.jit(lambda p, o, k: actor.apply(p, o, key=k)[0])
    det_act = jax.jit(lambda p, o: actor.apply(p, o, deterministic=True)[0])

    state = (pi_p, q_p, q_t, log_alpha, pi_opt, q_opt, a_opt)
    buffer = ReplayBuffer(obs_dim, goal_dim, act_dim, replay_size)

    def reward_fn(achieved, desired):
        return env.unwrapped.compute_reward(achieved, desired, None).astype(np.float32)

    def flat(o):
        return np.concatenate(
            [o["observation"], o["desired_goal"]], dtype=np.float32
        )

    def test_agent():
        succ = []
        for _ in range(num_test_episodes):
            o, info = test_env.reset(seed=int(rng.integers(1 << 30)))
            for _ in range(max_ep_len):
                a = np.asarray(det_act(state[0], flat(o)[None]))[0]
                o, r, te, tr, info = test_env.step(np.clip(a, -act_limit, act_limit))
                if te or tr:
                    break
            succ.append(float(info.get("is_success", False)))
        return float(np.mean(succ))

    def do_updates():
        nonlocal state, k_run
        q_loss = pi_loss = jnp.zeros(())
        for _ in range(gradient_steps):
            if use_her:
                batch = her_sample(
                    buffer, batch_size, rng, reward_fn,
                    strategy=her_strategy, her_ratio=her_ratio,
                )
            else:
                batch = buffer.sample(batch_size, rng)
                batch.pop("idx", None)
            k_run, k_u = jax.random.split(k_run)
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, q_loss, pi_loss = update(state, jbatch, k_u)
        return q_loss

    def log_epoch(t, q_loss, history, t0):
        epoch = (t + 1) // steps_per_epoch
        succ = test_agent()
        history.append(succ)
        log_fn(
            f"epoch {epoch}/{epochs}: test success={succ:.2f} "
            f"alpha={float(jnp.exp(state[3])):.3f} "
            f"q_loss={float(q_loss):.4f} ({time.time() - t0:.0f}s)"
        )
        if save_path:
            TQC(actor, state[0], act_limit).save(save_path)

    total_steps = steps_per_epoch * epochs

    if n_envs > 1:
        # parallel experience collection (reference rl_zoo3 subproc vec-env)
        from pointcloud_tpu.rl.vec_env import DummyVecGoalEnv, SubprocVecGoalEnv

        venv = (
            SubprocVecGoalEnv([env_fn] * n_envs)
            if vec_env == "subproc"
            else DummyVecGoalEnv([env_fn] * n_envs)
        )
        obs_b, _ = venv.reset(seed=seed)
        # warmup sampling reproducibility: the space pickled back from
        # worker 0 is unseeded (the single-env path seeds env.action_space)
        venv.action_space.seed(seed)
        pend = [[] for _ in range(n_envs)]  # per-env episodes for HER contiguity
        history, t0 = [], time.time()
        q_loss = jnp.zeros(())
        t = 0
        next_epoch = steps_per_epoch
        while t < total_steps:
            if t < start_steps:
                acts = np.stack(
                    [venv.action_space.sample() for _ in range(n_envs)]
                ).astype(np.float32)
            else:
                k_run, k_a = jax.random.split(k_run)
                ob = np.concatenate(
                    [obs_b["observation"], obs_b["desired_goal"]], axis=-1
                ).astype(np.float32)
                acts = np.clip(
                    np.asarray(sample_act(state[0], ob, k_a)),
                    -act_limit, act_limit,
                )
            obs2_b, rews, terms, truncs, infos = venv.step(acts)
            for i in range(n_envs):
                cur = {k: v[i] for k, v in obs_b.items()}
                final = infos[i].get("final_observation")
                nxt = final if final is not None else {
                    k: v[i] for k, v in obs2_b.items()
                }
                pend[i].append(
                    (cur["observation"], cur["achieved_goal"],
                     cur["desired_goal"], acts[i], rews[i],
                     nxt["observation"], nxt["achieved_goal"],
                     float(terms[i]))
                )
                if terms[i] or truncs[i] or len(pend[i]) >= max_ep_len:
                    for tr in pend[i]:
                        buffer.store(*tr)
                    buffer.end_episode()
                    pend[i] = []
            obs_b = obs2_b
            t_prev, t = t, t + n_envs
            # same update pacing as the single-env path: run updates when t
            # crosses an update_every boundary (not on every venv.step)
            if (
                t >= update_after
                and buffer.size > batch_size
                and t // update_every > t_prev // update_every
            ):
                q_loss = do_updates()
            if t >= next_epoch:
                log_epoch(next_epoch - 1, q_loss, history, t0)
                next_epoch += steps_per_epoch
        venv.close()
        env.close()
        test_env.close()
        return TQC(actor, state[0], act_limit), history

    o, info = env.reset(seed=seed)
    ep_len, history, t0 = 0, [], time.time()
    q_loss = jnp.zeros(())

    for t in range(total_steps):
        if t < start_steps:
            a = env.action_space.sample()
        else:
            k_run, k_a = jax.random.split(k_run)
            a = np.asarray(sample_act(state[0], flat(o)[None], k_a))[0]
            a = np.clip(a, -act_limit, act_limit)

        o2, r, terminated, truncated, info = env.step(a)
        buffer.store(
            o["observation"], o["achieved_goal"], o["desired_goal"], a, r,
            o2["observation"], o2["achieved_goal"], float(terminated),
        )
        o = o2
        ep_len += 1
        if terminated or truncated or ep_len >= max_ep_len:
            buffer.end_episode()
            o, info = env.reset()
            ep_len = 0

        if t >= update_after and t % update_every == 0:
            q_loss = do_updates()

        if (t + 1) % steps_per_epoch == 0:
            log_epoch(t, q_loss, history, t0)

    env.close()
    test_env.close()
    return TQC(actor, state[0], act_limit), history
