"""RL network cores (reference: rl/core.py:23-65).

MLPActorCritic: deterministic tanh actor + Q critic (DDPG). TQC networks
(squashed-Gaussian actor, quantile critics) live here too so trainers share
one module vocabulary.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int
    out_activation: str | None = None

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        x = nn.Dense(self.out)(x)
        if self.out_activation == "tanh":
            x = nn.tanh(x)
        return x


class Actor(nn.Module):
    """Deterministic tanh actor scaled to the action limit (rl/core.py:23-33)."""

    act_dim: int
    act_limit: float
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        return self.act_limit * MLP(self.hidden, self.act_dim, "tanh")(obs)


class QCritic(nn.Module):
    """Q(s, a) scalar critic (rl/core.py:36-43)."""

    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        return MLP(self.hidden, 1)(x)[..., 0]


class MLPActorCritic(nn.Module):
    """Actor + critic bundle (reference MLPActorCritic, rl/core.py:45-65)."""

    act_dim: int
    act_limit: float
    hidden: Sequence[int] = (256, 256)

    def setup(self):
        self.pi = Actor(self.act_dim, self.act_limit, self.hidden)
        self.q = QCritic(self.hidden)

    def __call__(self, obs, act):
        return self.pi(obs), self.q(obs, act)

    def act(self, obs):
        return self.pi(obs)

    def q_value(self, obs, act):
        return self.q(obs, act)


class SquashedGaussianActor(nn.Module):
    """Tanh-squashed Gaussian policy (TQC/SAC-style)."""

    act_dim: int
    act_limit: float
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs, key=None, deterministic: bool = False):
        h = obs
        for w in self.hidden:
            h = nn.relu(nn.Dense(w)(h))
        mu = nn.Dense(self.act_dim)(h)
        log_std = jnp.clip(nn.Dense(self.act_dim)(h), LOG_STD_MIN, LOG_STD_MAX)
        std = jnp.exp(log_std)
        if deterministic or key is None:
            pre = mu
        else:
            pre = mu + std * jax.random.normal(key, mu.shape)
        act = jnp.tanh(pre)
        # log prob with tanh correction
        logp = (
            -0.5 * (((pre - mu) / std) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi))
        ).sum(-1)
        logp -= (2 * (jnp.log(2.0) - pre - jax.nn.softplus(-2 * pre))).sum(-1)
        return self.act_limit * act, logp


class QuantileCritic(nn.Module):
    """One quantile network emitting n_quantiles values (TQC)."""

    n_quantiles: int = 25
    hidden: Sequence[int] = (512, 512, 512)

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        return MLP(self.hidden, self.n_quantiles)(x)


class QuantileEnsemble(nn.Module):
    """n_critics quantile networks, outputs stacked (B, n_critics, n_q)."""

    n_critics: int = 2
    n_quantiles: int = 25
    hidden: Sequence[int] = (512, 512, 512)

    @nn.compact
    def __call__(self, obs, act):
        outs = [
            QuantileCritic(self.n_quantiles, self.hidden)(obs, act)
            for _ in range(self.n_critics)
        ]
        return jnp.stack(outs, axis=-2)
