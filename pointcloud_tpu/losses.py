"""Point-cloud losses (reference: pointcloud_vision/utils.py:203-321).

Same public loss-object surface as the reference (`ChamferDistance`,
`FilteringChamferDistance`, `SegmentingChamferDistance`,
`EarthMoverDistance`, `StatePredictionLoss`), including the injected
`loss.log` hook through which sub-losses reach the training logger
(reference train.py:161: `model.loss_fn.log = model.log`).

All losses are pure jittable functions of (pred, target); ragged
per-class filtering uses masks (the reference pads ragged filtered clouds
and passes y_lengths, utils.py:222-228 — masks are the fixed-shape
equivalent and produce identical values, see tests/test_chamfer.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Sequence

import jax
import jax.numpy as jnp

from pointcloud_tpu import cfg
from pointcloud_tpu.ops.chamfer import chamfer_distance
from pointcloud_tpu.ops.emd import emd_match

Array = jax.Array


def _noop_log(name, value):
    return None


class LossBase:
    """Common bits: a `log` attribute the trainer may override to capture
    sub-losses (reference utils.py:297-307 / train.py:161)."""

    def __init__(self):
        self.log = _noop_log


class ChamferDistance(LossBase):
    """Bidirectional chamfer (reference utils.py:205-207)."""

    def __call__(self, pred, target, pred_mask=None, target_mask=None):
        return chamfer_distance(pred, target, x_mask=pred_mask, y_mask=target_mask)


class FilteringChamferDistance(LossBase):
    """Chamfer against a per-sample filtered target (utils.py:209-224).

    `filter_fn` is a transform `(pc, mask, key) -> (pc, mask)` applied to
    each target cloud; instead of dropping points and padding (the reference
    path), the resulting mask feeds masked chamfer directly.
    """

    def __init__(self, filter_fn):
        super().__init__()
        self.filter_fn = filter_fn

    def __call__(self, pred, target, pred_mask=None, target_mask=None):
        _, fmask = jax.vmap(lambda p: self.filter_fn(p, None, None))(target)
        if target_mask is not None:
            fmask = fmask & target_mask
        return chamfer_distance(
            pred, target[..., :3], x_mask=pred_mask, y_mask=fmask
        )


class SegmentingChamferDistance(LossBase):
    """Per-class filtering chamfer, summed (utils.py:226-239).

    pred: dict {class_name: (B, N_c, 3)} from MultiSegAE's per-class
    decoders; target: one labeled cloud (B, N, 4+) with integer class label
    at column 3.
    """

    def __init__(self, class_labels: Mapping[str, int]):
        super().__init__()
        from pointcloud_tpu.transforms import FilterClasses

        self.class_losses = {
            c: FilteringChamferDistance(FilterClasses([l], seg_dim=3))
            for c, l in class_labels.items()
        }

    def __call__(self, pred: Mapping[str, Array], target, target_mask=None):
        per_class = [
            loss(pred[c], target, target_mask=target_mask)
            for c, loss in self.class_losses.items()
        ]
        return jnp.sum(jnp.stack(per_class))


class EarthMoverDistance(LossBase):
    """EMD point loss + matched feature loss (utils.py:241-309).

    Matching runs on xyz only; the target is then permuted by the assignment
    so matched points align index-wise. Feature loss is MSE on the remaining
    dims, or — with `num_classes` — inverse-batch-frequency weighted:
      point_l  = sum(sqrt(d) * w) / sum(w),  w = class_weights[target_class]
      feature_l = feature_weight * weighted cross-entropy(pred logits, target class)
    (KL divergence between predicted/target class distributions is computed
    and logged but not added to the loss, exactly as the reference.)
    """

    def __init__(
        self,
        eps: float = cfg.emd_eval_eps,
        its: int = cfg.emd_eval_iterations,
        num_classes: int | None = None,
        feature_weight: float = 0.1,
        method: str | None = None,
        anneal_from: float | None = cfg.emd_anneal_from,
    ):
        """Defaults are the annealed-Sinkhorn EVAL operating point
        (eps 0.002, 60 iterations annealed from 0.1): >=90% assignment
        agreement with the reference's constant-eps 10,000-iteration test
        point (cfg.emd_test_*) at ~1/1000 the cost. Training passes explicit
        (cfg.emd_eps, cfg.emd_iterations, anneal_from=None) — see
        train/harness.py."""
        super().__init__()
        self.eps = eps
        self.iterations = its
        self.C = num_classes
        self.feature_weight = feature_weight
        self.method = method or cfg.emd_method
        self.anneal_from = anneal_from

    def __call__(self, pred, target):
        if cfg.debug:
            # EMD precondition: coords normalized to the unit cube
            # (reference emd_module.py:38-41 asserts; we warn)
            for name, pc in (("pred", pred), ("target", target)):
                bad = jnp.logical_or(
                    jnp.min(pc[:, :, :3]) < -1e-3, jnp.max(pc[:, :, :3]) > 1 + 1e-3
                )
                jax.debug.print(
                    "DEBUG: EMD {n} coords outside [0,1]: {b}", n=name, b=bad
                )
        dists, assignment = emd_match(
            pred[:, :, :3], target[:, :, :3], self.eps, self.iterations,
            self.method, self.anneal_from,
        )
        # permute target so matched points share an index (utils.py:254-256)
        target = jnp.take_along_axis(target, assignment[..., None], axis=1)

        if cfg.debug:
            num_points = pred.shape[1]
            # fraction of targets never assigned (utils.py:259-265)
            hit = jnp.zeros((pred.shape[0], num_points), bool).at[
                jnp.arange(pred.shape[0])[:, None], assignment
            ].set(True)
            missing = num_points - jnp.sum(hit, axis=1).astype(jnp.float32)
            jax.debug.print(
                "DEBUG: EMD unassigned ratio per batch = {r}", r=missing / num_points
            )

        weights = jnp.ones_like(dists)  # (B, N)
        if self.C is not None:
            target_classes = target[:, :, 3].astype(jnp.int32)  # (B, N)
            distribution = jnp.bincount(
                target_classes.reshape(-1), length=self.C
            ).astype(jnp.float32)
            distribution = distribution / jnp.sum(distribution)

            pred_logits = pred[:, :, 3:]  # (B, N, C)
            pred_classes = jnp.argmax(pred_logits, axis=2)
            pred_distribution = jnp.bincount(
                pred_classes.reshape(-1), length=self.C
            ).astype(jnp.float32)
            pred_distribution = pred_distribution / jnp.sum(pred_distribution)

            # logged-only KL (utils.py:276-279 semantics: batchmean kl_div of
            # log_softmax(pred_dist) against softmax(target_dist))
            sd = jax.nn.softmax(distribution)
            lp = jax.nn.log_softmax(pred_distribution)
            kl_div = jnp.sum(sd * (jnp.log(sd) - lp)) / self.C

            class_weights = 1.0 / (distribution + 1e-4)
            class_weights = class_weights / jnp.sum(class_weights)
            weights = class_weights[target_classes]

            # torch-style weighted cross entropy: sum(w_y * nll) / sum(w_y)
            logp = jax.nn.log_softmax(pred_logits, axis=-1)
            nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
            w = class_weights[target_classes]
            ce_l = jnp.sum(w * nll) / jnp.sum(w)
            feature_l = self.feature_weight * ce_l
            self.log("train_loss/cross_entropy", ce_l)
            self.log("train_loss/kl_divergence", kl_div)
        else:
            feature_l = jnp.mean((pred[:, :, 3:] - target[:, :, 3:]) ** 2)

        point_l = jnp.sum(jnp.sqrt(dists + 1e-12) * weights) / jnp.sum(weights)
        self.log("train_loss/EMD", point_l)
        self.log("train_loss/feature", feature_l)
        return point_l + feature_l


class StatePredictionLoss(LossBase):
    """Per-state MSE after normalizing targets (utils.py:311-321).

    pred/target: dicts {state_name: array}; `transforms` maps state names to
    normalizers applied to the target before comparison.
    """

    def __init__(self, states: Sequence[str], transforms: Dict[str, Callable]):
        super().__init__()
        self.states = list(states)
        self.t = dict(transforms)
        for s in self.states:
            if s not in self.t:
                self.t[s] = lambda x: x

    def __call__(self, pred: Mapping[str, Array], target: Mapping[str, Array]):
        losses = [
            jnp.mean((pred[s] - self.t[s](target[s])) ** 2) for s in self.states
        ]
        return jnp.mean(jnp.stack(losses))
