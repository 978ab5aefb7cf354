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


def load_policy(path: str):
    if path.endswith(".pkl"):
        return _load_pkl(path)
    if path.endswith(".zip"):
        from sb3_contrib.tqc.policies import MultiInputPolicy

        return MultiInputPolicy.load(path)
    if path.endswith(".pth"):
        import torch

        return TorchPolicyWrapper(torch.load(path, map_location="cpu"))
    raise ValueError(f"unknown policy format: {path}")
