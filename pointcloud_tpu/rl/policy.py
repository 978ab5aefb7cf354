"""Policy loading across formats.

`load_policy(path)` dispatches:
  *.pkl  — our JAX TQC/DDPG policies (rl/tqc.py save format)
  *.zip  — sb3_contrib TQC MultiInputPolicy (if sb3_contrib is installed;
           the reference's rl_zoo3 artifacts, readme.md:79-94)
  *.pth  — a torch policy extracted by export_policy (reference
           rl/export_policy.py:11-26)

All return objects with `predict(obs_dict, deterministic=True) ->
(action, state)`.
"""

from __future__ import annotations

import numpy as np


class TorchPolicyWrapper:
    """Wraps an exported torch policy module into the predict protocol."""

    def __init__(self, policy):
        self.policy = policy

    def predict(self, obs_dict, deterministic: bool = True, state=None, **kw):
        import torch

        with torch.no_grad():
            obs = {
                k: torch.as_tensor(np.asarray(v)[None], dtype=torch.float32)
                for k, v in obs_dict.items()
            }
            act = self.policy(obs, deterministic=deterministic)
            if isinstance(act, tuple):
                act = act[0]
        return np.asarray(act)[0], state


class JaxPolicy:
    """predict()-protocol wrapper over any jitted actor apply fn."""

    def __init__(self, apply_fn, params, act_limit):
        import jax

        self._fn = jax.jit(apply_fn)
        self.params = params
        self.act_limit = act_limit

    def predict(self, obs_dict, deterministic: bool = True, state=None, **kw):
        o = np.concatenate(
            [np.asarray(obs_dict["observation"]).reshape(-1),
             np.asarray(obs_dict["desired_goal"]).reshape(-1)],
            dtype=np.float32,
        )
        a = np.asarray(self._fn(self.params, o[None]))[0]
        return np.clip(a, -self.act_limit, self.act_limit), state


def _load_pkl(path: str):
    import pickle

    with open(path, "rb") as f:
        payload = pickle.load(f)
    cfg = payload["config"]
    actor_type = cfg.get("actor_type", "squashed_gaussian")
    if actor_type == "deterministic":
        from pointcloud_tpu.rl.core import Actor

        actor = Actor(cfg["act_dim"], cfg["act_limit"], cfg["hidden"])
        fn = lambda p, o: actor.apply(p, o)
        return JaxPolicy(fn, payload["pi"], cfg["act_limit"])
    from pointcloud_tpu.rl.tqc import TQC

    return TQC.load(path)


class Sb3TqcPolicy:
    """Deterministic actor of an sb3_contrib/rl_zoo3 TQC zip, loaded
    WITHOUT stable-baselines3 installed.

    sb3 saves a zip containing `policy.pth` (a torch state_dict). The TQC
    MultiInputPolicy actor is: CombinedExtractor (flatten + concat of the
    dict observation in sorted-key order, the gym.spaces.Dict convention) ->
    `actor.latent_pi` (Linear/ReLU stack) -> `actor.mu` -> tanh squash.
    Deterministic predict() is exactly that forward pass, reproduced in
    numpy from the state_dict tensors (reference artifacts:
    /root/reference/rl/export_policy.py:11-26, readme.md:79-94).
    """

    def __init__(self, hidden, mu, act_limit: float = 1.0):
        self.hidden = hidden  # [(W, b), ...] of actor.latent_pi
        self.mu = mu  # (W, b) of actor.mu
        self.act_limit = act_limit

    @classmethod
    def load(cls, path: str, act_limit: float = 1.0):
        import io
        import zipfile

        import torch

        with zipfile.ZipFile(path) as z:
            names = z.namelist()
            if "policy.pth" not in names:
                raise ValueError(
                    f"{path} is not an sb3 save (no policy.pth; has {names})"
                )
            sd = torch.load(
                io.BytesIO(z.read("policy.pth")), map_location="cpu"
            )
        if hasattr(sd, "state_dict"):  # a full module was saved
            sd = sd.state_dict()
        hidden = []
        i = 0
        while f"actor.latent_pi.{i}.weight" in sd:
            hidden.append(
                (
                    sd[f"actor.latent_pi.{i}.weight"].numpy(),
                    sd[f"actor.latent_pi.{i}.bias"].numpy(),
                )
            )
            i += 2  # Linear layers interleaved with activations
        if not hidden or "actor.mu.weight" not in sd:
            raise ValueError(
                f"{path}: no TQC actor tensors found (keys: {sorted(sd)[:8]}...)"
            )
        mu = (sd["actor.mu.weight"].numpy(), sd["actor.mu.bias"].numpy())
        return cls(hidden, mu, act_limit)

    def predict(self, obs_dict, deterministic: bool = True, state=None, **kw):
        x = np.concatenate(
            [np.asarray(obs_dict[k], dtype=np.float32).reshape(-1)
             for k in sorted(obs_dict)]
        )
        for W, b in self.hidden:
            x = np.maximum(W @ x + b, 0.0)
        a = np.tanh(self.mu[0] @ x + self.mu[1])
        return (a * self.act_limit).astype(np.float32), state


def load_policy(path: str):
    if path.endswith(".pkl"):
        return _load_pkl(path)
    if path.endswith(".zip"):
        try:
            from sb3_contrib.tqc.policies import MultiInputPolicy

            return MultiInputPolicy.load(path)
        except ImportError:
            return Sb3TqcPolicy.load(path)
    if path.endswith(".pth"):
        import torch

        return TorchPolicyWrapper(torch.load(path, map_location="cpu"))
    raise ValueError(f"unknown policy format: {path}")
