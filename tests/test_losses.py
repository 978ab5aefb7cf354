"""Loss-layer tests against torch oracles + reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from pointcloud_tpu.losses import (
    ChamferDistance,
    EarthMoverDistance,
    FilteringChamferDistance,
    SegmentingChamferDistance,
    StatePredictionLoss,
)
from pointcloud_tpu.transforms import FilterClasses


def make_labeled_cloud(rng, B, N, C):
    xyz = rng.random((B, N, 3), dtype=np.float32)
    labels = rng.integers(0, C, size=(B, N, 1)).astype(np.float32)
    return np.concatenate([xyz, labels], axis=2)


def test_chamfer_loss_scalar(rng):
    x = jnp.asarray(rng.random((2, 64, 3), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 64, 3), dtype=np.float32))
    loss = ChamferDistance()(x, y)
    assert loss.shape == ()
    assert float(loss) > 0


def test_filtering_chamfer_matches_manual(rng):
    """Filter target to class 1 -> chamfer(pred, class-1 points only)."""
    target = make_labeled_cloud(rng, 2, 128, 3)
    # ensure each batch has class-1 points
    target[:, :10, 3] = 1.0
    pred = jnp.asarray(rng.random((2, 32, 3), dtype=np.float32))
    loss = FilteringChamferDistance(FilterClasses([1], seg_dim=3))
    got = float(loss(pred, jnp.asarray(target)))

    # manual torch oracle with ragged filtering
    p = torch.from_numpy(np.asarray(pred))
    per_batch = []
    for b in range(2):
        sel = target[b][target[b, :, 3] == 1.0][:, :3]
        t = torch.from_numpy(sel)[None]
        d = torch.cdist(p[b : b + 1], t) ** 2
        per_batch.append(d.min(2).values.mean() + d.min(1).values.mean())
    want = float(torch.stack(per_batch).mean())
    assert abs(got - want) <= 1e-5


def test_segmenting_chamfer_sums_classes(rng):
    target = make_labeled_cloud(rng, 2, 96, 2)
    target[:, :20, 3] = 0.0
    target[:, 20:40, 3] = 1.0
    pred = {
        "a": jnp.asarray(rng.random((2, 16, 3), dtype=np.float32)),
        "b": jnp.asarray(rng.random((2, 16, 3), dtype=np.float32)),
    }
    loss = SegmentingChamferDistance({"a": 0, "b": 1})
    got = float(loss(pred, jnp.asarray(target)))
    f0 = FilteringChamferDistance(FilterClasses([0], seg_dim=3))
    f1 = FilteringChamferDistance(FilterClasses([1], seg_dim=3))
    want = float(f0(pred["a"], jnp.asarray(target))) + float(
        f1(pred["b"], jnp.asarray(target))
    )
    assert abs(got - want) <= 1e-6


def test_emd_rgb_feature_loss(rng):
    """Unsegmented EMD: sqrt-dist mean + MSE on rgb of matched points."""
    pred = jnp.asarray(rng.random((2, 32, 6), dtype=np.float32))
    target = jnp.asarray(rng.random((2, 32, 6), dtype=np.float32))
    loss_obj = EarthMoverDistance(eps=0.01, its=100, method="sinkhorn")
    logged = {}
    loss_obj.log = lambda k, v: logged.__setitem__(k, float(v))
    total = float(loss_obj(pred, target))
    assert np.isfinite(total) and total > 0
    assert "train_loss/EMD" in logged and "train_loss/feature" in logged
    np.testing.assert_allclose(
        total, logged["train_loss/EMD"] + logged["train_loss/feature"], rtol=1e-5
    )


def test_emd_segmented_weighted_loss(rng):
    """Segmented EMD: inverse-frequency weights + weighted CE, logs KL."""
    C = 3
    xyz = rng.random((2, 32, 3), dtype=np.float32)
    labels = rng.integers(0, C, size=(2, 32, 1)).astype(np.float32)
    target = jnp.asarray(np.concatenate([xyz, labels], axis=2))
    pred = jnp.asarray(
        np.concatenate(
            [
                rng.random((2, 32, 3), dtype=np.float32),
                rng.standard_normal((2, 32, C), dtype=np.float32),
            ],
            axis=2,
        )
    )
    loss_obj = EarthMoverDistance(eps=0.01, its=100, num_classes=C, method="sinkhorn")
    logged = {}
    loss_obj.log = lambda k, v: logged.__setitem__(k, float(v))
    total = float(loss_obj(pred, target))
    assert np.isfinite(total)
    for k in (
        "train_loss/EMD",
        "train_loss/feature",
        "train_loss/cross_entropy",
        "train_loss/kl_divergence",
    ):
        assert k in logged, k
    # feature_l = 0.1 * ce
    np.testing.assert_allclose(
        logged["train_loss/feature"], 0.1 * logged["train_loss/cross_entropy"], rtol=1e-5
    )


def test_emd_weighted_ce_matches_torch(rng):
    """The weighted CE inside the seg branch matches torch's convention."""
    C = 4
    logits = rng.standard_normal((2, 16, C)).astype(np.float32)
    classes = rng.integers(0, C, size=(2, 16))
    w = rng.random(C).astype(np.float32)
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 2, 1),
        torch.from_numpy(classes),
        weight=torch.from_numpy(w),
    ).item()
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.asarray(classes)[..., None], axis=-1)[..., 0]
    ww = jnp.asarray(w)[jnp.asarray(classes)]
    got = float(jnp.sum(ww * nll) / jnp.sum(ww))
    assert abs(got - want) <= 1e-5


def test_emd_loss_differentiable(rng):
    pred = jnp.asarray(rng.random((1, 16, 6), dtype=np.float32))
    target = jnp.asarray(rng.random((1, 16, 6), dtype=np.float32))
    loss_obj = EarthMoverDistance(eps=0.01, its=50, method="sinkhorn")
    g = jax.grad(lambda p: loss_obj(p, target))(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_state_prediction_loss(rng):
    pred = {"cube_pos": jnp.asarray(rng.random((4, 3), dtype=np.float32))}
    targ = {"cube_pos": jnp.asarray(rng.random((4, 3), dtype=np.float32) * 2)}
    norm = {"cube_pos": lambda x: x / 2.0}
    loss = StatePredictionLoss(["cube_pos"], norm)
    got = float(loss(pred, targ))
    want = float(jnp.mean((pred["cube_pos"] - targ["cube_pos"] / 2.0) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_losses_jittable(rng):
    pred = jnp.asarray(rng.random((2, 32, 6), dtype=np.float32))
    target = jnp.asarray(rng.random((2, 32, 6), dtype=np.float32))
    emd = EarthMoverDistance(eps=0.01, its=20, method="sinkhorn")
    f = jax.jit(lambda p, t: emd(p, t))
    assert np.isfinite(float(f(pred, target)))
    cham = ChamferDistance()
    g = jax.jit(lambda p, t: cham(p[..., :3], t[..., :3]))
    assert np.isfinite(float(g(pred, target)))
